"""Extraction throughput measurement used by bench.py and the scaling runs."""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from caraspark.extract import extract

BENCH_CORPUS = os.environ.get(
    "CARASPARK_BENCH_CORPUS", "/tmp/caraspark_bench/corpus"
)


def corpus_path(n_docs: int) -> str:
    """Size-namespaced corpus dir: two benchmarks asking for different
    sizes must never clobber each other's bytes (a concurrent bench.py run
    once overwrote the scaling protocol's 200k corpus mid-measurement)."""
    return f"{BENCH_CORPUS}_{n_docs}"


def _recipe_set_tag() -> str:
    """Cheap fingerprint of the recipe SET (names only — a recipe body
    change must be accompanied by a manifest re-pin anyway, which the
    content fingerprint in bench.py catches): a stale on-disk corpus
    from an older recipe mix must not be silently re-served."""
    import hashlib

    from caraspark.synth import HTML_RECIPES, PDF_RECIPES

    names = ",".join(sorted(PDF_RECIPES) + sorted(HTML_RECIPES))
    return hashlib.md5(names.encode()).hexdigest()[:12]


def ensure_corpus(spark: SparkSession, n_docs: int, path: str | None = None) -> int:
    """Materialize the deterministic corpus once (fixed bytes on disk for
    every run — the scaling protocol requires byte-identical input); the
    success marker is keyed on the recipe set so adding/removing a
    recipe regenerates instead of serving the previous mix.

    Writer-order layout (docs in synth order — uniform recipe mix and
    scattered giants per split), which keeps the narrow-mode headline
    round-over-round comparable. The skew experiments use
    ``ensure_sized_corpus`` instead."""
    from caraspark.corpus import synth_df

    if path is None:
        path = corpus_path(n_docs)
    marker = os.path.join(
        path, f"_SUCCESS_N_{n_docs}_{_recipe_set_tag()}"
    )
    if not os.path.exists(marker):
        synth_df(spark, n_docs, include_giant=True).write.mode(
            "overwrite"
        ).parquet(path)
        open(marker, "w").close()
    return int(spark.read.parquet(path).count())


def ensure_sized_corpus(
    spark: SparkSession, n_docs: int, path: str | None = None
) -> int:
    """SAME content as ``ensure_corpus`` (identical synth recipes, layout-
    invariant fingerprint) but written through the ingest size layout
    (``corpus.write_size_layout``): an ``nbytes`` column, range-clustered.

    This is the SKEW-CLUSTERED corpus: all giant docs land in the tail
    file, so a byte-budgeted narrow scan inherits one straggler task that
    parses every giant serially — the real-crawl layout pathology
    (segments sorted by host/size) that ``extract(salt="giants",
    nbytes_col="nbytes")`` exists to fix with footer-pruned routing."""
    from caraspark.corpus import synth_df, write_size_layout

    if path is None:
        path = corpus_path(n_docs) + "_sized"
    marker = os.path.join(
        # v2: hash-tiebroken range keys + 4x file count (row balance)
        path, f"_SUCCESS_N_{n_docs}_{_recipe_set_tag()}_sized_v2"
    )
    if not os.path.exists(marker):
        write_size_layout(synth_df(spark, n_docs, include_giant=True), path)
        open(marker, "w").close()
    return int(spark.read.parquet(path).count())


def run_extract_once(spark: SparkSession, corpus_path: str, *, repeats: int = 1
                     ) -> tuple[int, float]:
    """(docs, best wall seconds) for a full extraction pass (noop sink:
    full distributed compute, no collect).  One untimed pass first spins up
    the Python UDF workers — their fork/import cost is a per-executor
    constant that a long-running cluster amortizes to zero, so including it
    would measure the sandbox, not the pipeline.  Best-of-``repeats``
    because the shared VM shows CPU steal from co-tenants."""
    df = spark.read.parquet(corpus_path)
    n = df.count()
    extract(df).write.format("noop").mode("overwrite").save()  # warm workers
    best = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.time()
        extract(df).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return n, best


def extraction_docs_per_sec(spark: SparkSession, n_docs: int = 4096):
    n = ensure_corpus(spark, n_docs)
    docs, wall = run_extract_once(spark, corpus_path(n_docs), repeats=3)
    return docs / wall, docs, wall
