"""documents_raw as a Spark DataFrame, generated ON THE EXECUTORS.

``synth_df(spark, n)`` maps the synth recipes over ``spark.range`` with
mapInArrow — the corpus is born distributed (no driver-side materialization,
no collect), which is what lets the bench generate multi-GB inputs and the
scaling runs stay driver-light.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from caraspark.schemas import DOCUMENTS_RAW

_ARROW = pa.schema(
    [
        pa.field("url", pa.string(), False),
        pa.field("warc_ts", pa.timestamp("us"), True),
        pa.field("html", pa.large_binary(), True),
        pa.field("text", pa.string(), True),
        pa.field("lang", pa.string(), True),
    ]
)


def _gen(include_giant: bool):
    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from caraspark.synth import HTML_RECIPES, PDF_RECIPES, LANGS, pdf_giant
        import random
        from datetime import datetime, timedelta

        recipes = list(PDF_RECIPES.items()) + [
            (k, None) for k in sorted(HTML_RECIPES)
        ]
        base_ts = datetime(2026, 1, 1)
        for batch in it:
            rows = []
            for idx in batch.column("id").to_pylist():
                rng = random.Random(f"42:{idx}")
                name, fn_ = recipes[idx % len(recipes)]
                blob = (
                    HTML_RECIPES[name](rng) if fn_ is None else fn_()
                )
                if include_giant and idx > 0 and idx % 4999 == 0:
                    name, blob = "pdf_giant", pdf_giant(50_000)
                rows.append(
                    {
                        "url": f"https://synth.example/{name}/{idx}",
                        "warc_ts": base_ts + timedelta(seconds=idx * 37 % 2_592_000),
                        "html": blob,
                        "text": None,
                        "lang": LANGS[idx % len(LANGS)],
                    }
                )
                if len(rows) >= 64:
                    yield pa.RecordBatch.from_pylist(rows, schema=_ARROW)
                    rows = []
            if rows:
                yield pa.RecordBatch.from_pylist(rows, schema=_ARROW)

    return fn


def synth_df(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    include_giant: bool = False,
) -> DataFrame:
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    rng = spark.range(0, n, 1, partitions)
    return rng.mapInArrow(_gen(include_giant), DOCUMENTS_RAW)


def write_size_layout(
    df: DataFrame, path: str, partitions: int | None = None
) -> None:
    """Ingest-side size-aware layout job: append ``nbytes = length(html)``
    and write the corpus range-clustered by it, so every downstream
    byte-length predicate prunes at the parquet FOOTER instead of decoding
    blob pages.

    Why this exists (SURVEY.md §4.3 skew discipline): ``extract``'s
    giants mode routes documents by size into a narrow branch and a
    salted branch — two filters over the same table. Without a stored
    size column those filters must materialize ``length(html)``, i.e.
    each branch decodes the FULL blob column and discards the other's
    rows: at 100 TB that is a second 100 TB scan. With ``nbytes``
    range-clustered, row-group min/max stats answer both filters — the
    giants branch reads only the giant tail's row groups (sub-percent of
    bytes) and the narrow branch skips exactly those. The cluster job is
    one range exchange at ingest, paid once, amortized over every
    extraction / re-crawl pass that follows.

    Two row-balance details that matter for downstream task balance when
    PER-DOC cost dominates (parse-heavy workloads — byte-budgeted input
    splits balance bytes, not docs, and size clustering makes bytes a bad
    proxy for work):

    * the range key carries a hash TIEBREAK — crawl size distributions
      have heavy ties (boilerplate templates yield thousands of docs at
      the exact same byte length), and without the tiebreak the range
      partitioner packs whole tie-runs into single files (measured 3×
      doc-count skew across files on the 200k bench corpus);
    * default file count is 4 per shuffle slot, so a scan gets several
      row-count-bounded files per core instead of a few byte-balanced
      monsters (parquet cannot subdivide a row group, so the FILE is the
      effective parallelism unit for these small clustered files).
    """
    from pyspark.sql import functions as F

    if partitions is None:
        partitions = 4 * int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    sized = df.withColumn(
        "nbytes", F.coalesce(F.length("html"), F.lit(0)).cast("long")
    )
    # the tiebreak must be row-distinct WITHIN a tie-run — hashing the
    # range key itself would be constant across the run and break nothing
    tiebreak = (
        F.xxhash64("url")
        if "url" in df.columns
        else F.monotonically_increasing_id()
    )
    (
        sized.withColumn("_tb", tiebreak)
        .repartitionByRange(partitions, "nbytes", "_tb")
        .sortWithinPartitions("nbytes", "_tb")
        .drop("_tb")
        .write.mode("overwrite")
        .parquet(path)
    )


def sf_of(sf_dir: str) -> float:
    """Parse the scale factor from a testdata dir name; default 0.01."""
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


def corpus_rows_for_sf(sf_dir: str) -> int:
    return {0.001: 128, 0.01: 384, 0.1: 1536}.get(sf_of(sf_dir), 256)


def from_binary_files(spark: SparkSession, path: str) -> DataFrame:
    """documents_raw from LOOSE files via the binaryFile source (SURVEY.md
    S3): url = file path, warc_ts = filesystem mtime, blob = content.
    Feeds the same extract pipeline as parquet corpora — the on-ramp for a
    directory of crawled PDFs/HTML before they're compacted into a table.
    Column pruning applies: binaryFile supports pathGlobFilter and
    recursiveFileLookup, and Spark prunes `content` when only metadata
    columns are selected."""
    from pyspark.sql import functions as F

    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
