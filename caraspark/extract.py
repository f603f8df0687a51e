"""The flagship extraction pipeline (SURVEY.md §3.2 EP1′, §4.3).

``extract(df)``: documents_raw → extracted, as ONE narrow mapInArrow stage —
the whole C2–C27 chain is per-document pure compute, so there is no shuffle
between parse stages; the only exchange is the explicit skew-defeating
repartition in front.

Scale design (the north_rule's "partitioning / shuffle / skew handled
explicitly"):

* **column pruning** — only (url, warc_ts, html) reach the UDF; `text`/`lang`
  never leave the parquet footer (check .explain: ReadSchema is 3 columns);
* **size-class salting** — partition key is (size_class, salt) where
  size_class = ceil(log2(bytes)) and salt spreads each class over the
  cluster: a 1 GiB document never rides in a partition with 10k small ones,
  and AQE skew-split backs this up at runtime;
* **byte-budgeted output batches** — the UDF re-chunks its output so one
  Arrow IPC message never exceeds ~64 MiB even when inputs are huge;
* **per-doc resource budgets** — parse depth/object caps inside the engine
  turn adversarial inputs into taxonomy rows, never hung executors.
"""

from __future__ import annotations

import os
from typing import Iterator

import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F

from caraspark.schemas import EXTRACTED

OUTPUT_BATCH_BYTES = 64 * 1024 * 1024

_ARROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), False),
        pa.field("warc_ts", pa.timestamp("us"), True),
        pa.field("text", pa.large_binary(), True),
        pa.field(
            "verdict",
            pa.struct([("valid", pa.bool_()), ("strict", pa.bool_())]),
        ),
        pa.field("kind", pa.string()),
        pa.field(
            "errors",
            pa.list_(
                pa.struct(
                    [
                        ("code", pa.string()),
                        ("pos", pa.int64()),
                        ("obj_num", pa.int32()),
                        ("obj_gen", pa.int32()),
                        ("path", pa.string()),
                        ("msg", pa.string()),
                    ]
                )
            ),
        ),
        pa.field(
            "metrics",
            pa.struct(
                [
                    ("n_objects", pa.int32()),
                    ("n_updates", pa.int32()),
                    ("n_streams", pa.int32()),
                    ("n_holes", pa.int32()),
                    ("bytes_in", pa.int64()),
                    ("bytes_decoded", pa.int64()),
                    ("parse_ms", pa.float64()),
                ]
            ),
        ),
        pa.field(
            "flags",
            pa.struct(
                [
                    ("encrypted", pa.bool_()),
                    ("hybrid", pa.bool_()),
                    ("linearized", pa.bool_()),
                ]
            ),
        ),
        pa.field("version", pa.string(), True),
        pa.field(
            "lineage",
            pa.struct(
                [
                    ("partition_id", pa.int32()),
                    ("salt", pa.int32()),
                    ("attempt", pa.int32()),
                    ("snapshot", pa.string()),
                ]
            ),
        ),
    ]
)


def _extract_batches(
    it: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """The Arrow batch UDF: C2–C27 per blob, byte-budgeted output."""
    # import inside the worker so the closure pickles only the module name
    from caraspark.pdfengine import process_document

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    attempt = ctx.attemptNumber() if ctx is not None else 0
    snapshot = os.environ.get("CARASPARK_SNAPSHOT")

    rows: list[dict] = []
    pending = 0

    def flush():
        nonlocal rows, pending
        if rows:
            yield pa.RecordBatch.from_pylist(rows, schema=_ARROW_SCHEMA)
            rows = []
            pending = 0

    for batch in it:
        urls = batch.column("url")
        tss = batch.column("warc_ts")
        blobs = batch.column("html")
        salts = (
            batch.column("salt") if "salt" in batch.schema.names else None
        )
        for i in range(batch.num_rows):
            blob = blobs[i].as_py()
            r = process_document(blob if blob is not None else b"")
            rows.append(
                {
                    "url": urls[i].as_py(),
                    "warc_ts": tss[i].as_py(),
                    "text": r.text,
                    "verdict": {"valid": r.valid, "strict": r.strict},
                    "kind": r.kind,
                    "errors": r.errors_as_rows(),
                    "metrics": {
                        "n_objects": r.n_objects,
                        "n_updates": r.n_updates,
                        "n_streams": r.n_streams,
                        "n_holes": r.n_holes,
                        "bytes_in": r.bytes_in,
                        "bytes_decoded": r.bytes_decoded,
                        "parse_ms": r.parse_ms,
                    },
                    "flags": {
                        "encrypted": r.encrypted,
                        "hybrid": r.hybrid,
                        "linearized": r.linearized,
                    },
                    "version": r.version,
                    "lineage": {
                        "partition_id": pid,
                        "salt": salts[i].as_py() if salts is not None else -1,
                        "attempt": attempt,
                        "snapshot": snapshot,
                    },
                }
            )
            pending += len(r.text) + r.bytes_in // 4
            if pending >= OUTPUT_BATCH_BYTES:
                yield from flush()
    yield from flush()


def extract(
    df: DataFrame,
    num_partitions: int | None = None,
    n_salts: int = 64,
) -> DataFrame:
    """documents_raw → extracted (EXTRACTED schema).

    The input shuffle keys on (size_class, salt): documents of similar size
    co-locate, each size class spreads over ``n_salts`` buckets, so giant
    documents distribute instead of serializing one task (SURVEY.md §4.3).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "64")
        )
    pruned = df.select("url", "warc_ts", "html")
    keyed = pruned.withColumns(
        {
            "size_class": F.ceil(F.log2(F.length("html") + F.lit(2))).cast("int"),
            "salt": F.pmod(F.xxhash64("url"), F.lit(n_salts)).cast("int"),
        }
    )
    salted = keyed.repartition(num_partitions, "size_class", "salt")
    return salted.mapInArrow(_extract_batches, EXTRACTED)
