"""Table maintenance: small-file compaction over the snapshot manifest.

At 10^12 documents the extract job's incremental chunk commits leave each
bucket directory with one file per task per chunk; scan efficiency decays
with file count (footer reads, scheduler overhead, tiny row groups).
``compact_table`` rewrites over-fragmented buckets to one file each and
publishes the result as a new snapshot commit, reusing the job's
idempotent dynamic-partition-overwrite path.

Consistency note (documented limitation of the directory-keyed layout,
same as the extract job itself): readers key on bucket IDs from the
manifest, not file names, so a reader racing the rewrite of one bucket
can observe that bucket mid-swap. Iceberg closes this gap with file-level
manifests; this layer keeps unit-level granularity and points swap-in at
the same call sites (SURVEY.md S4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from caraspark.manifest import SnapshotManifest


def bucket_file_counts(table_dir: str) -> dict[int, int]:
    """Parquet part files per committed bucket directory."""
    man = SnapshotManifest(table_dir)
    data = os.path.join(table_dir, "data")
    out: dict[int, int] = {}
    for u in sorted(man.committed_units()):
        d = os.path.join(data, f"bucket={u}")
        out[u] = (
            sum(
                1
                for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith(".")
            )
            if os.path.isdir(d)
            else 0
        )
    return out


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_files_per_bucket: int = 1,
    max_tasks: int = 64,
) -> dict:
    """Rewrite every committed bucket holding more than
    ``target_files_per_bucket`` parquet files down to one file, then
    commit a snapshot marking them compacted.

    Plan shape: one scan of just the fragmented buckets → one exchange
    keyed on bucket (each bucket lands wholly in one task, so
    ``partitionBy`` emits exactly one file per bucket directory) → dynamic
    partition overwrite. Untouched buckets are never read or rewritten.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    man = SnapshotManifest(table_dir)
    snap = man.current_snapshot()
    if snap is None:
        return {"compacted_buckets": [], "snapshot_id": None}
    counts = bucket_file_counts(table_dir)
    frag = sorted(u for u, n in counts.items() if n > target_files_per_bucket)
    if not frag:
        return {
            "compacted_buckets": [],
            "snapshot_id": snap["snapshot_id"],
        }

    data = os.path.join(table_dir, "data")
    df = spark.read.parquet(data).filter(F.col("bucket").isin(frag))
    (
        df.repartition(min(len(frag), max_tasks), "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(data)
    )
    units = {
        u: {**(snap["units"].get(str(u)) or {}), "compacted": True}
        for u in frag
    }
    new_snap = man.commit(units)
    return {
        "compacted_buckets": frag,
        "files_before": sum(counts[u] for u in frag),
        "snapshot_id": new_snap["snapshot_id"],
    }
