"""SparkSession factory.

One place for every session knob so tests, bench, and the spark-submit job
agree.  Defaults target the sandbox (local[N], single JVM) but every setting
is the one we'd ship to a 1000-executor cluster too:

* UTC session timezone       — oracle (DuckDB) comparisons are TZ-naive.
* AQE on                     — runtime partition coalescing + skew-join split.
* shuffle.partitions ~ cores — 200 is wrong in both directions locally;
                               on a real cluster AQE coalesces from a high
                               initial value, so we set initialPartitionNum.
* Arrow on, batch-capped     — the extract stage streams BINARY blobs through
                               Python workers; a small maxRecordsPerBatch plus
                               the byte-budget logic in extract.py bounds the
                               per-batch footprint (SURVEY.md §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow rows per batch for Python-UDF exchange. Extraction re-batches by a
# BYTE budget inside the UDF; this only caps the row count per IPC message.
ARROW_BATCH_ROWS = 1024


def get_spark(
    app_name: str = "caraspark",
    master: str | None = None,
    cores: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the canonical session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]``.  ``cores`` is
    used to size shuffle partitions (2x cores: enough tasks to keep every
    core busy through stragglers without tiny-task overhead).
    """
    if master is None:
        n = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{n}]"
    if cores is None:
        try:
            cores = int(master.split("[", 1)[1].rstrip("]"))
        except (IndexError, ValueError):
            cores = os.cpu_count() or 8
    shuffle = max(2 * cores, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        .config("spark.sql.execution.arrow.useLargeVarTypes", "true")
        .config("spark.driver.memory", os.environ.get("CARASPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
