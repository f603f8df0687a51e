"""Table maintenance: small-file compaction over the snapshot manifest.

At 10^12 documents the extract job's incremental chunk commits leave each
bucket directory with one file per task per chunk; scan efficiency decays
with file count (footer reads, scheduler overhead, tiny row groups).
``compact_table`` rewrites over-fragmented buckets to one file each and
publishes the result as a new snapshot commit.

Crash-durability and reader isolation (Iceberg's rewrite-then-expire
story): the rewrite lands in a FRESH generation directory
``data/gen=<new snapshot id>/bucket=<k>`` — never in place — and becomes
visible only when the manifest commit swings CURRENT. A crash mid-rewrite
leaves an orphan generation that no snapshot references (age-guarded GC in
``SnapshotManifest.expire_snapshots`` removes it later); the old
generation's files remain the durable copy for every retained snapshot
until expire deletes them. Readers resolve concrete per-unit paths from
their snapshot (``unit_paths``), so a reader racing the compaction never
observes a half-rewritten bucket.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from caraspark.manifest import SnapshotManifest


def bucket_file_counts(table_dir: str) -> dict[int, int]:
    """Parquet part files per committed unit, at its current generation."""
    man = SnapshotManifest(table_dir)
    out: dict[int, int] = {}
    snap = man.current_snapshot()
    if not snap:
        return out
    for path in man.unit_paths():
        u = int(os.path.basename(path).split("=", 1)[1])
        out[u] = (
            sum(
                1
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith(".")
            )
            if os.path.isdir(path)
            else 0
        )
    return out


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_files_per_bucket: int = 1,
    max_tasks: int = 64,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite every committed bucket holding more than
    ``target_files_per_bucket`` parquet files down to one file in a new
    generation, then commit a snapshot pointing those units at it.

    Plan shape: one path-pruned scan of just the fragmented buckets → one
    exchange keyed on bucket (each bucket lands wholly in one task, so
    ``partitionBy`` emits exactly one file per bucket directory) → write to
    the fresh generation dir. Untouched buckets are never read or
    rewritten; old files are deleted only by ``expire_snapshots`` after the
    commit is durable.

    ``sort_by`` is the Iceberg sort-order analog: the rewrite CLUSTERS
    each bucket's file on the given columns (``sortWithinPartitions`` —
    the bucket already lands wholly in one task, so this is a total sort
    per output file, no extra exchange). Parquet then records tight
    per-row-group min/max statistics for those columns, and any engine's
    range or point predicate on them skips non-matching row groups at
    scan time — the read-side payoff compaction can buy for free. The
    committed units record the clustering so readers and later
    compactions can see (and preserve) it."""
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
    new_gen = snap["snapshot_id"] + 1  # == the committing snapshot's id
    gen_dir = os.path.join(data, f"gen={new_gen}")
    frag_set = set(frag)
    src_paths = [
        p
        for p in man.unit_paths()
        if int(os.path.basename(p).split("=", 1)[1]) in frag_set
        and os.path.isdir(p)
    ]
    from caraspark.schemas import extracted_read_schema

    # pinned read schema: compacting a mix of old- and new-era buckets
    # must not inherit the first file's (possibly pre-surface) schema —
    # old rows upgrade to the current schema with NULL surface columns
    df = (
        spark.read.option("basePath", data)
        .schema(extracted_read_schema())
        .parquet(*src_paths)
        .drop("gen")
    )
    part = df.repartition(min(len(frag), max_tasks), "bucket")
    if sort_by:
        part = part.sortWithinPartitions("bucket", *sort_by)
    (
        part.write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(gen_dir)
    )
    cur_units = man.units_map()
    units = {
        u: {
            **(cur_units.get(str(u)) or {}),
            "gen": new_gen,
            "compacted": True,
            **({"sort_by": list(sort_by)} if sort_by else {}),
        }
        for u in frag
    }
    new_snap = man.commit(units)
    assert new_snap["snapshot_id"] == new_gen
    return {
        "compacted_buckets": frag,
        "files_before": sum(counts[u] for u in frag),
        "snapshot_id": new_snap["snapshot_id"],
    }
