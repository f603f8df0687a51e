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

import functools
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
            "spans",
            pa.list_(
                pa.struct(
                    [
                        ("start", pa.int64()),
                        ("end", pa.int64()),
                        ("label", pa.string()),
                    ]
                )
            ),
            True,
        ),
        pa.field("outlinks", pa.list_(pa.string()), True),
        pa.field("title", pa.string(), True),
        pa.field("canonical", pa.string(), True),
        pa.field("description", pa.string(), True),
        pa.field(
            "headings",
            pa.list_(
                pa.struct([("block", pa.int32()), ("level", pa.int32())])
            ),
            True,
        ),
        pa.field("og_title", pa.string(), True),
        pa.field("og_description", pa.string(), True),
        pa.field("og_image", pa.string(), True),
        pa.field("anchors", pa.list_(pa.string()), True),
        pa.field(
            "tables",
            pa.list_(
                pa.struct(
                    [
                        ("table", pa.int32()),
                        ("row", pa.int32()),
                        ("col", pa.int32()),
                        ("header", pa.bool_()),
                        ("cell", pa.string()),
                    ]
                )
            ),
            True,
        ),
        pa.field(
            "lists",
            pa.list_(
                pa.struct(
                    [
                        ("list", pa.int32()),
                        ("item", pa.int32()),
                        ("depth", pa.int32()),
                        ("ordered", pa.bool_()),
                        ("item_text", pa.string()),
                    ]
                )
            ),
            True,
        ),
        pa.field(
            "images",
            pa.list_(
                pa.struct([("src", pa.string()), ("alt", pa.string())])
            ),
            True,
        ),
        pa.field("jsonld", pa.list_(pa.string()), True),
        pa.field("robots_meta", pa.string(), True),
        pa.field("refresh_meta", pa.string(), True),
        pa.field("base_href", pa.string(), True),
        pa.field("next_href", pa.string(), True),
        pa.field("prev_href", pa.string(), True),
        pa.field(
            "forms",
            pa.list_(
                pa.struct([("method", pa.string()), ("action", pa.string())])
            ),
            True,
        ),
        pa.field(
            "alternates",
            pa.list_(
                pa.struct(
                    [
                        ("hreflang", pa.string()),
                        ("type", pa.string()),
                        ("href", pa.string()),
                    ]
                )
            ),
            True,
        ),
        pa.field(
            "microdata",
            pa.list_(
                pa.struct(
                    [
                        ("item", pa.int32()),
                        ("itemtype", pa.string()),
                        ("prop", pa.string()),
                        ("value", pa.string()),
                    ]
                )
            ),
            True,
        ),
        pa.field(
            "rdfa",
            pa.list_(
                pa.struct(
                    [
                        ("item", pa.int32()),
                        ("vocab", pa.string()),
                        ("typeof", pa.string()),
                        ("prop", pa.string()),
                        ("value", pa.string()),
                    ]
                )
            ),
            True,
        ),
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
    want: frozenset = None,
) -> Iterator[pa.RecordBatch]:
    """The Arrow batch UDF: C2–C27 per blob, byte-budgeted output.

    Hot-loop discipline: columns in (one C-level ``to_pylist`` per column),
    columns out (one ``pa.array`` per field) — never per-row Arrow scalars
    or row dicts; with ~0.4 ms of real work per document, per-row
    conversion overhead would otherwise dominate the profile.
    """
    # import inside the worker so the closure pickles only the module name
    from caraspark.pdfengine import process_document as _pd

    def process_document(blob):
        return _pd(blob, want=want)

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    attempt = ctx.attemptNumber() if ctx is not None else 0
    snapshot = os.environ.get("CARASPARK_SNAPSHOT")

    cols: dict[str, list] = {f.name: [] for f in _ARROW_SCHEMA}
    pending = 0

    def flush():
        nonlocal pending
        if cols["url"]:
            arrays = [
                pa.array(cols[f.name], type=f.type) for f in _ARROW_SCHEMA
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=_ARROW_SCHEMA)
            for v in cols.values():
                v.clear()
            pending = 0

    for batch in it:
        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        blobs = batch.column("html").to_pylist()
        salts = (
            batch.column("salt").to_pylist()
            if "salt" in batch.schema.names
            else None
        )
        for i in range(batch.num_rows):
            blob = blobs[i]
            r = process_document(blob if blob is not None else b"")
            cols["url"].append(urls[i])
            cols["warc_ts"].append(tss[i])
            cols["text"].append(r.text)
            cols["spans"].append(r.spans_as_rows())
            cols["outlinks"].append(r.outlinks)
            cols["title"].append(r.title)
            cols["canonical"].append(r.canonical)
            cols["description"].append(r.description)
            cols["headings"].append(r.headings_as_rows())
            cols["og_title"].append(r.og_title)
            cols["og_description"].append(r.og_description)
            cols["og_image"].append(r.og_image)
            cols["anchors"].append(r.anchors)
            cols["tables"].append(r.tables_as_rows())
            cols["lists"].append(r.lists_as_rows())
            cols["images"].append(r.images_as_rows())
            cols["jsonld"].append(r.jsonld)
            cols["robots_meta"].append(r.robots_meta)
            cols["refresh_meta"].append(r.refresh_meta)
            cols["base_href"].append(r.base_href)
            cols["next_href"].append(r.next_href)
            cols["prev_href"].append(r.prev_href)
            cols["forms"].append(r.forms_as_rows())
            cols["alternates"].append(r.alternates_as_rows())
            cols["microdata"].append(r.microdata_as_rows())
            cols["rdfa"].append(r.rdfa_as_rows())
            cols["verdict"].append({"valid": r.valid, "strict": r.strict})
            cols["kind"].append(r.kind)
            cols["errors"].append(r.errors_as_rows())
            cols["metrics"].append(
                {
                    "n_objects": r.n_objects,
                    "n_updates": r.n_updates,
                    "n_streams": r.n_streams,
                    "n_holes": r.n_holes,
                    "bytes_in": r.bytes_in,
                    "bytes_decoded": r.bytes_decoded,
                    "parse_ms": r.parse_ms,
                }
            )
            cols["flags"].append(
                {
                    "encrypted": r.encrypted,
                    "hybrid": r.hybrid,
                    "linearized": r.linearized,
                }
            )
            cols["version"].append(r.version)
            cols["lineage"].append(
                {
                    "partition_id": pid,
                    "salt": salts[i] if salts is not None else -1,
                    "attempt": attempt,
                    "snapshot": snapshot,
                }
            )
            pending += len(r.text or b"") + r.bytes_in // 4
            if pending >= OUTPUT_BATCH_BYTES:
                yield from flush()
    yield from flush()


def extract(
    df: DataFrame,
    num_partitions: int | None = None,
    n_salts: int = 64,
    salt: bool | str = False,
    giant_threshold: int = 4 << 20,
    want_text: bool = True,
    want=None,
    nbytes_col: str | None = None,
    giant_fanout: int = 4,
) -> DataFrame:
    """documents_raw → extracted (EXTRACTED schema).

    ``want`` pushes the OUTPUT projection into the UDF: pass an iterable of
    surface names (``caraspark.pdfengine.api.SURFACES``, plus the
    "headmeta" alias) and only those surfaces are assembled per document —
    the rest are NULL columns that never cross the Arrow boundary as data.
    ``want=None`` keeps the legacy boolean: ``want_text=True`` computes all
    ten surfaces, ``False`` the stats-only mode. Spark prunes INPUT
    columns at the scan for free; this is the matching engine-side prune
    for the computed surfaces, which Catalyst cannot see inside the UDF —
    a metadata-only consumer at 100 TB should not pay for text assembly,
    span materialization, or the outline walk on every document.

    Default is the NARROW plan: scan partitions feed mapInArrow directly —
    zero shuffle, scaling limited only by input splits (parquet scans split
    at spark.sql.files.maxPartitionBytes, so parallelism is already there).

    ``salt=True`` inserts the explicit skew-defeating exchange: partition
    key (size_class = ceil(log2 bytes), salt = hash(url) % n_salts), so
    documents of similar size co-locate and giants spread over the cluster
    instead of clustering in one task (SURVEY.md §4.3). Use it when the
    input's physical layout clusters big documents (e.g. a crawl segment
    sorted by host) — measured cost in BENCH/BASELINE.md: the blob shuffle
    taxes synthetic throughput ~35% because synthetic docs parse ~100x
    cheaper per byte than real PDFs; at production parse densities the
    exchange amortizes to noise.

    ``salt="giants"`` is the scale-preferred middle ground: only documents
    ≥ ``giant_threshold`` bytes take an exchange — round-robin over
    ``num_partitions × giant_fanout`` slices (with few individually
    expensive rows the most-loaded task IS the wall; see the branch
    comment below for the exact balance guarantee) — everything else
    stays on the narrow zero-shuffle path, and the two branches union.
    At crawl-realistic skew (giants are a sub-percent tail of rows) this
    shuffles a sub-percent of bytes instead of all of them, while still
    guaranteeing no task inherits a cluster of giants from the input
    layout. Cost model vs full salting at 100 TB: the blob column is
    scanned once per branch (each branch's filter discards the other's
    rows post-scan — `length(html)` cannot prune at the footer), so
    selective salting trades one extra columnar scan for removing a
    100 TB shuffle (write + fetch + read); shuffle bytes drop to the
    giant tail only, and the small-doc branch keeps input locality.

    ``nbytes_col`` removes even that extra scan when the input table
    carries a stored byte-length column (our ingest layout job,
    ``corpus.write_size_layout``, writes one range-clustered by it): both
    branch filters become plain column predicates that push to the
    parquet scan, so row-group min/max stats route the bytes — the
    giants branch reads ONLY the giant row groups and the narrow branch
    skips exactly those. Routing uses the STORED column on both sides,
    so even a stale nbytes value can only mis-route a document between
    branches (a per-doc perf wobble), never drop or duplicate it.
    """
    from caraspark.pdfengine.api import normalize_want

    udf = functools.partial(
        _extract_batches, want=normalize_want(want, want_text)
    )
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "64")
        )
    cols = ["url", "warc_ts", "html"]
    if not salt:
        # routing column not needed on the narrow path — never select it
        return df.select(*cols).mapInArrow(udf, EXTRACTED)
    if nbytes_col is not None and nbytes_col not in cols:
        cols.append(nbytes_col)
    pruned = df.select(*cols)
    keyed = pruned.withColumns(
        {
            "size_class": F.ceil(F.log2(F.length("html") + F.lit(2))).cast("int"),
            "salt": F.pmod(F.xxhash64("url"), F.lit(n_salts)).cast("int"),
        }
    )
    if salt == "giants":
        # routing predicates: the stored metadata column when the table has
        # one — kept as PLAIN column comparisons (a coalesce() wrapper
        # defeats parquet pushdown) so row-group stats prune at the footer;
        # NULL nbytes rows route to the giants branch via OR-IsNull (also
        # pushable), so the two filters partition the table exactly.
        # Without a stored column: computed length (decodes the blob column
        # in both branches — the documented extra-scan cost).
        if nbytes_col is not None:
            nb = F.col(nbytes_col)
            is_small = nb < giant_threshold
            is_giant = (nb >= giant_threshold) | nb.isNull()
        else:
            nbytes = F.coalesce(F.length("html"), F.lit(0))
            is_small = nbytes < giant_threshold
            is_giant = nbytes >= giant_threshold
        extra = [c for c in cols[3:]]
        small = (
            pruned.filter(is_small)
            .drop(*extra)
            .mapInArrow(udf, EXTRACTED)
        )
        # Round-robin over num_partitions × giant_fanout slices, NOT a hash
        # on (size_class, salt): giants are few and individually expensive,
        # so the tail is set by the most-loaded TASK, and hashing G giants
        # into P partitions leaves birthday-collision bins of 3–4 giants
        # (measured: the r4 giants-mode straggler). Balance guarantee,
        # precisely: RoundRobinPartitioning deals each INPUT partition's
        # rows to consecutive slices from a per-partition pseudo-random
        # start — exactly even within an input partition, random-offset
        # across partitions. The clustered-tail pathology this mode exists
        # for (all giants in one file → one input partition) therefore gets
        # a ±1 deal-out; in the scattered regime (~1 giant per input
        # partition) balance degrades to uniform-random — no worse than the
        # hash key — and the fanout× extra bins still cut the expected max
        # load. The explicit count keeps AQE from coalescing the small
        # shuffle back into few partitions (coalescing only applies to
        # non-user-specified counts), and mostly-empty extra tasks cost
        # microseconds of scheduler time. Costs: sortBeforeRepartition
        # (default true, required for retry-determinism — do NOT disable it
        # on this branch or stage retries can drop/duplicate rows) locally
        # sorts the giant rows incl. blobs before dealing — bounded by the
        # giant tail's size, not the corpus. salt/size_class still ride as
        # provenance columns for the UDF's per-doc metrics.
        giants = (
            keyed.filter(is_giant)
            .drop(*extra)  # routing column must not ride the shuffle
            .repartition(num_partitions * giant_fanout)
            .mapInArrow(udf, EXTRACTED)
        )
        return small.unionByName(giants)
    salted = keyed.drop(*(c for c in cols[3:])).repartition(
        num_partitions, "size_class", "salt"
    )
    return salted.mapInArrow(udf, EXTRACTED)
