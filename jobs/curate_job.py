"""The curation batch job: extracted snapshot → training-ready curated
table, as a resumable lake job (the curation pack's delivery form — the
step between extract_job's output and a tokenizer pipeline's input).

    spark-submit --master local[32] --py-files caraspark.zip \
        jobs/curate_job.py --input <extract_job table> \
        --output <curated table dir> [--unit-chunk 16] [--min-quality 2]

Per document: quality gate (the shared integer ``quality_features`` score;
rows with no extracted text fail by construction) → corpus-wide EXACT
dedup (a digest→keeper table built once from the input snapshot; only the
keeper survives) → token count. Work proceeds over the INPUT table's own
bucket units in chunks, committing each chunk to a SnapshotManifest with
the same crash/resume/idempotence contract as extract_job — killing the
job loses at most one chunk; rerunning resumes and reproduces
byte-identical output. Each commit records per-chunk lineage metrics
(rows_in / dropped_quality / dropped_dup / rows_out).

Scale notes: the digest table is the ONLY corpus-global artifact — one
(16-byte digest, keeper url) row per distinct text, built in one pass and
broadcast into every chunk (bucket-join it instead once it outgrows the
executors; the chunk side never re-shuffles either way). Chunk reads are
path-pruned to the chunk's bucket directories via the input manifest —
the full corpus is scanned exactly once per pipeline stage, not once per
chunk. Per-chunk metric counts are parquet-footer/scan-local jobs over
one chunk; a 100 TB run folds them into write-side accumulators instead.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from caraspark.manifest import SnapshotManifest  # noqa: E402
from caraspark.session import get_spark  # noqa: E402
from jobs.extract_job import _read_pinned, read_extracted  # noqa: E402

def _digest():
    # built lazily: a module-level Column would need a live SparkContext
    # at import time
    return F.md5(
        F.encode(F.coalesce(F.col("text").cast("string"), F.lit("")), "utf-8")
    )


def build_digest_table(spark, input_dir: str, work_dir: str) -> str:
    """One corpus pass → the (digest, keeper) table exact dedup joins
    against. keeper = min(url) per digest: deterministic, so a resumed
    job rebuilds the identical table if the marker is missing (the input
    snapshot is immutable — the same prerequisite byte-identical resume
    already relies on)."""
    dup_dir = os.path.join(work_dir, "_digests")
    marker = os.path.join(dup_dir, "_BUILT")
    if os.path.exists(marker):
        return dup_dir
    snap = read_extracted(spark, input_dir).filter(
        F.length(F.col("text").cast("string")) > 0
    )
    (
        snap.select("url", _digest().alias("digest"))
        .groupBy("digest")
        .agg(F.min("url").alias("keeper"))
        .write.mode("overwrite")
        .parquet(dup_dir)
    )
    with open(marker, "w") as f:
        f.write("1")
    return dup_dir


def _unit_dirs(man: SnapshotManifest, units: list[int]) -> list[str]:
    by_unit = {
        int(u): os.path.join(
            man.table_dir,
            "data",
            f"gen={int((meta or {}).get('gen', 0))}",
            f"bucket={int(u)}",
        )
        for u, meta in man.units_map().items()
    }
    return [p for u in units if os.path.isdir(p := by_unit[int(u)])]


def run_job(
    spark,
    input_dir: str,
    output_dir: str,
    unit_chunk: int = 16,
    min_quality: int = 1,
    fail_after_chunks: int | None = None,
    codec: str = "zstd",
) -> dict:
    """Returns run stats; ``fail_after_chunks`` is the crash-injection
    hook the resume test uses, exactly as in extract_job."""
    from caraspark.curation import quality_features

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.sql.parquet.compression.codec", codec)

    man_in = SnapshotManifest(input_dir)
    units = sorted(man_in.committed_units())
    man = SnapshotManifest(output_dir)
    todo = man.plan_units(units)
    gen_dir = os.path.join(output_dir, "data", "gen=0")
    t0 = time.time()
    n_chunks = docs_out = 0
    if todo:
        dup_dir = build_digest_table(spark, input_dir, output_dir)
        dups = spark.read.parquet(dup_dir)

    for i in range(0, len(todo), unit_chunk):
        chunk = todo[i : i + unit_chunk]
        paths = _unit_dirs(man_in, chunk)
        part = (
            _read_pinned(spark, input_dir, paths)
            if paths
            else read_extracted(spark, input_dir).limit(0)
        )
        rows_in = int(part.count())
        textful = part.filter(F.length(F.col("text").cast("string")) > 0)
        scored = quality_features(
            textful.select(
                F.col("url").alias("doc_id"), F.col("text").cast("string")
            )
        ).filter(F.col("score") >= int(min_quality)).select(
            F.col("doc_id").alias("url")
        )
        kept = textful.join(scored, "url", "left_semi")
        n_quality = int(kept.count())
        curated = (
            kept.withColumn("digest", _digest())
            .join(F.broadcast(dups), "digest")
            .filter(F.col("url") == F.col("keeper"))
            .drop("keeper")
            .withColumn(
                "n_tokens",
                F.size(F.split(F.trim(F.col("text").cast("string")), r"\s+")),
            )
        )
        curated.write.mode("overwrite").partitionBy("bucket").parquet(gen_dir)
        out_paths = [
            p
            for u in chunk
            if os.path.isdir(p := os.path.join(gen_dir, f"bucket={u}"))
        ]
        n_out = int(spark.read.parquet(*out_paths).count()) if out_paths else 0
        man.commit(
            {
                u: {
                    "rows": None,
                    "chunk": n_chunks,
                    "rows_in": rows_in,
                    "dropped_quality": rows_in - n_quality,
                    "dropped_dup": n_quality - n_out,
                    "rows_out": n_out,
                }
                for u in chunk
            }
        )
        docs_out += n_out
        n_chunks += 1
        if fail_after_chunks is not None and n_chunks >= fail_after_chunks:
            return {"crashed": True, "chunks": n_chunks, "docs": docs_out}
    return {
        "crashed": False,
        "chunks": n_chunks,
        "docs": docs_out,
        "wall_s": round(time.time() - t0, 3),
        "units_done": len(man.committed_units()),
    }


def read_curated(spark, output_dir: str, snapshot_id: int | None = None):
    """Snapshot-consistent read of the curated table (committed units
    only, gen-aware paths) — same contract as read_extracted."""
    man = SnapshotManifest(output_dir)
    paths = [p for p in man.unit_paths(snapshot_id) if os.path.isdir(p)]
    if not paths:
        raise ValueError(f"no committed curated units in {output_dir}")
    return spark.read.option(
        "basePath", os.path.join(output_dir, "data")
    ).parquet(*paths)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--unit-chunk", type=int, default=16)
    ap.add_argument("--min-quality", type=int, default=1)
    ap.add_argument("--codec", default="zstd")
    ap.add_argument(
        "--datacard",
        action="store_true",
        help="print the per-language data card of the curated output",
    )
    args = ap.parse_args()
    spark = get_spark("curate_job")
    stats = run_job(
        spark,
        args.input,
        args.output,
        unit_chunk=args.unit_chunk,
        min_quality=args.min_quality,
        codec=args.codec,
    )
    print(stats)
    if args.datacard:
        import json

        for r in sorted(
            datacard(read_curated(spark, args.output)).collect(),
            key=lambda r: r.kind,
        ):
            print(json.dumps(r.asDict()))


if __name__ == "__main__":
    main()


def export_packed(
    curated, out_dir: str, seq_target: int = 256, shards: int = 8
) -> None:
    """Training-sequence delivery off-ramp: the curated table greedily
    packed into ~seq_target-token sequences and written as gzip'd JSONL,
    one record per sequence — the shape a tokenizer/dataloader consumes
    directly (each record: shard, seq_id, urls[], texts[], n_tokens).

    Packing is the ``pack_sequences`` discipline: a doc's sequence id is
    floor(preceding-token-cumsum / target) within its (shard) stream,
    order pinned by url — deterministic, so a re-export reproduces
    byte-identical shards. The shard key bounds every window sort run
    (the hot-stream skew story), the pack groupBy rides the same
    (shard) exchange, and the writer is JVM-side to_json + gzip text —
    no Python, no collect; sequences sort within shard files."""
    from pyspark.sql import Window as W

    txt = F.col("text").cast("string")
    sized = curated.select(
        "url",
        F.pmod(F.xxhash64("url"), F.lit(shards)).cast("int").alias("shard"),
        txt.alias("text"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("url")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    seq = sized.withColumn(
        "seq_id",
        F.floor((cum - F.col("n_tokens")) / seq_target).cast("long"),
    )
    packed = seq.groupBy("shard", "seq_id").agg(
        F.sort_array(
            F.collect_list(F.struct("url", "text", "n_tokens"))
        ).alias("docs")
    )
    (
        packed.select(
            "shard",
            F.to_json(
                F.struct(
                    "shard",
                    "seq_id",
                    F.transform("docs", lambda d: d["url"]).alias("urls"),
                    F.transform("docs", lambda d: d["text"]).alias("texts"),
                    F.aggregate(
                        F.transform("docs", lambda d: d["n_tokens"]),
                        F.lit(0).cast("long"),
                        lambda a, x: a + x,
                    ).alias("n_tokens"),
                )
            ).alias("value"),
            "seq_id",
        )
        .repartition(shards, "shard")
        .sortWithinPartitions("shard", "seq_id")
        .select("value")
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(out_dir)
    )


def datacard(curated):
    """Per-kind data card of a CURATED snapshot — the release table
    (docs, chars, tokens, distinct digests) a dataset publishes next to
    the data.  Same integer-census discipline as the corpus_datacard
    qkey, but computed over the job's actual output so the card and the
    shipped parquet can never drift apart.  One map-side-combined
    aggregate; token counts reuse the n_tokens column the job already
    materialized."""
    t = F.length(F.col("text").cast("string"))
    return curated.groupBy("kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(t).cast("bigint").alias("n_chars"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct("digest").cast("bigint").alias("n_digests"),
    )
