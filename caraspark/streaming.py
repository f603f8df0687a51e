"""Structured Streaming pack (SURVEY.md B8 — caradoc has no streaming; this
is the north_rule's incremental-processing posture).

Everything here is testable offline: a parquet file-source stream replayed
from the driver ``events`` table, driven to completion synchronously with
``processAllAvailable`` against a memory sink, and compared against the
equivalent batch query (streaming/batch equivalence is the correctness
anchor — see tests/test_streaming.py).

Operators covered: file micro-batch source (T1), tumbling/sliding window
aggregation (T2), session windows (T3), watermark + late-data drop (T4),
streaming dedup (T5), arbitrary stateful processing via
applyInPandasWithState (T6), foreachBatch idempotent sink (T7).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)

DOCUMENTS_DDL = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def replay_events_stream(
    spark: SparkSession, sf_dir: str, max_files: int = 1
) -> DataFrame:
    """T1: the events table as a file-source micro-batch stream.

    The streaming file source requires a DIRECTORY; the testdata table is a
    single parquet file → stage a symlink into a temp dir once."""
    src = os.path.realpath(f"{sf_dir}/events.parquet")
    stage = os.path.join(
        "/tmp/caraspark_stream_src", src.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(stage)
        # watermarks require TIMESTAMP (not NTZ); session TZ is UTC so the
        # wall clock is preserved
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def replay_documents_stream(
    spark: SparkSession, sf_dir: str, max_files: int = 1
) -> DataFrame:
    """The documents table as a file-source micro-batch stream — the
    bounded stand-in for continuous crawl ingest (same symlink staging as
    ``replay_events_stream``)."""
    src = os.path.realpath(f"{sf_dir}/documents.parquet")
    stage = os.path.join(
        "/tmp/caraspark_stream_src", src.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return (
        spark.readStream.schema(DOCUMENTS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(stage)
    )


def replay_embeddings_stream(
    spark: SparkSession, sf_dir: str, max_files: int = 1
) -> DataFrame:
    """The embeddings id column as a file-source micro-batch stream — the
    bounded stand-in for continuous media ingest (same symlink staging as
    ``replay_events_stream``); consumers re-derive payloads per batch via
    the deterministic codec."""
    src = os.path.realpath(f"{sf_dir}/embeddings.parquet")
    stage = os.path.join(
        "/tmp/caraspark_stream_src", src.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "embeddings.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return (
        spark.readStream.schema(
            "vec_id bigint, embedding array<float>, label int"
        )
        .option("maxFilesPerTrigger", max_files)
        .parquet(stage)
    )


def replay_events_stream_flushed(
    spark: SparkSession, sf_dir: str, flush_minutes: int = 360
) -> DataFrame:
    """T1 variant for OUTER stream-stream joins: the events file plus two
    far-future sentinel micro-batches that drive the watermark past all
    real data.

    Append-mode outer joins only emit null-extended rows once the global
    watermark proves no future match is possible, and the watermark
    computed at the END of batch k takes effect in batch k+1 — so a
    single-batch replay would never emit them. Staging order (by mtime,
    one file per trigger):

      batch 1: the real events file          (watermark → max_ts − delay)
      batch 2: sentinel @ max_ts+flush       (watermark → far future)
      batch 3: sentinel @ max_ts+flush+1min  (data batch under the
               far-future watermark → ALL remaining outer rows emit here,
               and ``processAllAvailable`` provably waits for it, unlike
               the best-effort no-data cleanup batch)

    Sentinel rows carry negative event_ids so queries can filter them out
    of results. Deterministic: sentinel timestamps derive from the real
    file's max ts (parquet footer stats), content is fixed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.realpath(f"{sf_dir}/events.parquet")
    stage = os.path.join(
        "/tmp/caraspark_stream_flush",
        f"{src.strip('/').replace('/', '_')}_f{flush_minutes}",
    )
    done = os.path.join(stage, "_STAGED")
    if not os.path.exists(done):
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "0_events.parquet")
        if not os.path.lexists(link):
            os.symlink(src, link)
        tbl = pq.read_table(src, columns=["ts"])
        max_ts = pa.compute.max(tbl["ts"]).as_py()
        schema = pq.read_schema(src).remove_metadata()
        from datetime import timedelta

        for i, (minute, ids) in enumerate(
            [(flush_minutes, (-1, -2)), (flush_minutes + 1, (-3, -4))]
        ):
            t = max_ts + timedelta(minutes=minute)
            sent = pa.table(
                {
                    "event_id": pa.array(list(ids), pa.int64()),
                    "ts": pa.array([t, t], schema.field("ts").type),
                    "user_id": pa.array([-1, -1], pa.int64()),
                    "event_type": pa.array(["click", "view"]),
                    "value": pa.array([0.0, 0.0], pa.float64()),
                    "props": pa.array(["{}", "{}"]),
                },
                schema=schema,
            )
            pq.write_table(sent, os.path.join(stage, f"{i + 1}_flush.parquet"))
        # FileStreamSource (latestFirst=false) picks oldest-mtime first:
        # pin the intended batch order explicitly.
        base = os.path.getmtime(link)
        for i, name in enumerate(["1_flush.parquet", "2_flush.parquet"]):
            p = os.path.join(stage, name)
            os.utime(p, (base + 10 * (i + 1), base + 10 * (i + 1)))
        with open(done, "w") as fh:
            fh.write("ok")
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def run_to_memory(stream_df: DataFrame, mode: str = "append") -> DataFrame:
    """Drive a bounded stream to completion; return the sink as a DataFrame.

    For windowed aggregations use mode="complete": on a bounded replay the
    watermark never advances past the final window, so append mode would
    withhold it; complete mode emits the whole result table each trigger
    and the memory sink keeps the last snapshot."""
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return stream_df.sparkSession.table(name)


def tumbling_counts(events: DataFrame, minutes: int = 10) -> DataFrame:
    """T2: tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_v"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            "event_type",
            "n",
            "sum_v",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """T2: sliding window (10 min window, 5 min slide) per user bucket."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("w_start"), "n")
    )


def session_counts(events: DataFrame, gap: str = "15 minutes") -> DataFrame:
    """T3: session windows per user (gap-based)."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("s_start"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """T5: streaming dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", "30 minutes").dropDuplicates(
        ["event_id"]
    )


def clickview_join(
    clicks: DataFrame, views: DataFrame, lookback_min: int = 240
) -> DataFrame:
    """Stream-stream INNER join with a time-range condition: each click
    pairs with the same user's views in the preceding ``lookback_min``
    minutes. Both sides carry watermarks, so Spark bounds the join state
    to watermark + range — the canonical micro-batch join whose state
    never grows with stream length. On a bounded replay the inner join
    emits every match regardless of watermark progress (only state
    CLEANUP depends on it), so the result is batch-equivalent."""
    a = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    b = (
        views.filter(F.col("event_type") == "view")
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
    )
    return a.join(
        b,
        (F.col("user_id") == F.col("v_user"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {lookback_min} MINUTES")
        )
        & (F.col("view_ts") <= F.col("click_ts")),
        "inner",
    ).select("click_id", "view_id")


def clickview_join_outer(
    clicks: DataFrame, views: DataFrame, lookback_min: int = 240
) -> DataFrame:
    """Stream-stream LEFT OUTER join with a time-range condition: every
    click emits — paired with each same-user view in the preceding
    ``lookback_min`` minutes, or null-extended if none exists. Unlike the
    inner form, the null-extended rows are only released when the global
    watermark passes the click's match window (view_ts ≤ click_ts), so
    the source must keep advancing the watermark past the data — use
    ``replay_events_stream_flushed`` for bounded replays. State stays
    bounded to watermark + range exactly as in the inner join."""
    a = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    b = (
        views.filter(F.col("event_type") == "view")
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
    )
    return a.join(
        b,
        (F.col("user_id") == F.col("v_user"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {lookback_min} MINUTES")
        )
        & (F.col("view_ts") <= F.col("click_ts")),
        "leftOuter",
    ).select("click_id", "view_id")


_STATE_SCHEMA = "n bigint, total double"
_OUT_SCHEMA = "user_id bigint, n bigint, total double"


def _running_totals(key, pdf_iter, state: GroupState):
    import pandas as pd

    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "total": [round(total, 4)]}
    )


_HH_K = 8  # Space-Saving counter budget (the BOUNDED state)
_HH_STATE = "keys array<bigint>, counts array<bigint>, errs array<bigint>"
_HH_OUT = "user_id bigint, est bigint, err bigint"


def _space_saving(key, pdf_iter, state: GroupState):
    """Metwally et al. '05 Space-Saving: k counters, monitored key
    increments in place, unmonitored key EVICTS the minimum counter and
    inherits its count as overestimation error. Ties break on smallest
    key so the summary is deterministic for a deterministic replay."""
    import pandas as pd

    if state.exists:
        keys, counts, errs = state.get
        tbl = {k: [c, e] for k, c, e in zip(keys, counts, errs)}
    else:
        tbl = {}
    for pdf in pdf_iter:
        for uid in pdf["user_id"]:
            uid = int(uid)
            if uid in tbl:
                tbl[uid][0] += 1
            elif len(tbl) < _HH_K:
                tbl[uid] = [1, 0]
            else:
                mk = min(tbl, key=lambda x: (tbl[x][0], x))
                mc = tbl[mk][0]
                del tbl[mk]
                tbl[uid] = [mc + 1, mc]
    ks = sorted(tbl)
    state.update(
        (ks, [tbl[k][0] for k in ks], [tbl[k][1] for k in ks])
    )
    yield pd.DataFrame(
        {
            "user_id": ks,
            "est": [tbl[k][0] for k in ks],
            "err": [tbl[k][1] for k in ks],
        }
    )


def space_saving_hitters(events: DataFrame) -> DataFrame:
    """Streaming approximate heavy hitters with BOUNDED state — unlike
    the complete-mode censuses (state = one row per distinct key,
    unbounded on open domains), Space-Saving keeps exactly k counters
    whatever the key cardinality, the property that matters when the
    key is url/host/token at crawl scale. The constant grouping key
    makes this task's summary the per-partition sketch; a production
    topology runs one group per shuffle partition and MERGES the k-row
    summaries (Space-Saving summaries merge associatively) — the same
    partial/final shape as any distributive agg, with k-row exchanges."""
    return (
        events.select(F.lit(1).alias("g"), "user_id")
        .groupBy("g")
        .applyInPandasWithState(
            _space_saving,
            outputStructType=_HH_OUT,
            stateStructType=_HH_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """T6: arbitrary stateful op — per-user running (count, sum) via
    applyInPandasWithState (GroupState, no timeout)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def foreach_batch_to_parquet(
    events: DataFrame, out_dir: str
) -> None:
    """T7: exactly-once-style sink — foreachBatch writing idempotently by
    epoch (rewriting an epoch's directory replaces it, so task retries and
    epoch replays can't double-write)."""

    def write_epoch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )

    q = (
        events.writeStream.outputMode("append")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def stream_ingest_lake(
    pages: DataFrame, table_dir: str, units: int = 8
) -> None:
    """Continuous crawl ingest: every micro-batch of raw pages MERGES
    into the snapshot lake via ``upsert_recrawl`` — re-fetched urls
    replace their rows, new urls append, only receiving buckets are
    rewritten, and each epoch commits one snapshot (so the lake stays
    time-travelable mid-stream and `snapshot_diff` doubles as the CDC
    feed between epochs).

    Delivery: the checkpoint makes each source file process exactly
    once across query restarts; an epoch REPLAY after a crash re-merges
    the same batch, which is content-stable (identical rows replace
    themselves) — the snapshot chain records the replay rather than
    corrupting data, the same at-least-once-but-idempotent posture as
    ``foreach_batch_to_parquet``."""
    from jobs.extract_job import upsert_recrawl

    def merge_epoch(df: DataFrame, epoch_id: int) -> None:
        upsert_recrawl(df.sparkSession, table_dir, df, units=units)

    q = (
        pages.writeStream.outputMode("append")
        .foreachBatch(merge_epoch)
        .option("checkpointLocation", os.path.join(table_dir, "_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def replay_corpus_stream(
    spark: SparkSession, sf_dir: str, max_files: int = 2
) -> DataFrame:
    """The synthetic RAW corpus (PDF + HTML blobs) as a file-source
    micro-batch stream — the bounded stand-in for continuous WARC
    ingest feeding the PDF side tables.  The corpus is deterministic
    per sf, so it is staged to parquet once per size and replayed from
    there; partitions become micro-batches."""
    from caraspark.corpus import corpus_rows_for_sf, synth_df
    from caraspark.schemas import DOCUMENTS_RAW

    n = corpus_rows_for_sf(sf_dir)
    stage = f"/tmp/caraspark_stream_src/corpus_{n}"
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        synth_df(spark, n, partitions=8).write.mode("overwrite").parquet(stage)
    return (
        spark.readStream.schema(DOCUMENTS_RAW)
        .option("maxFilesPerTrigger", max_files)
        .parquet(stage)
    )


def wave_stage_dir(src: str, n_crawls: int) -> str:
    """Stage dir for ``replay_crawl_waves_stream``, keyed by content identity
    (path, size, mtime_ns): regenerated testdata at the same path must never
    be served stale derived digests.  ``st_mtime_ns`` (not whole seconds) so
    a same-size rewrite within one second still gets a fresh key.  Exposed so
    tests inspect the directory the stream actually reads."""
    st = os.stat(src)
    return os.path.join(
        "/tmp/caraspark_stream_waves",
        f"{src.strip('/').replace('/', '_')}_c{n_crawls}"
        f"_{st.st_size}_{st.st_mtime_ns}",
    )


def replay_crawl_waves_stream(
    spark: SparkSession, sf_dir: str, n_crawls: int = 4
) -> DataFrame:
    """Re-crawl waves as micro-batches: crawl k's fetch records for every
    url arrive as batch k (one staged file per trigger, mtime-ordered —
    same pinning discipline as ``replay_events_stream_flushed``), so any
    per-url state genuinely CARRIES ACROSS batches instead of being
    exercised within one.

    Each staged row is (url, crawl, digest, payload) with the digest
    formula shared with the batch planner `warc_revisit_plan`
    (md5(text ∥ crawl div (1 + doc_id % 3)) — change periods 1..3), so
    the streaming decisions are oracle-predictable. Staging hashes the
    corpus once per sf_dir on the driver and caches to /tmp — the test
    harness's stand-in for a crawler's fetch feed; payload bytes never
    enter the stream, only 16-byte digests and lengths."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.realpath(f"{sf_dir}/documents.parquet")
    # content-identity stage key (the sibling replay_* stagers symlink the
    # LIVE file, but this one materializes derived content, so it needs one)
    stage = wave_stage_dir(src, n_crawls)
    done = os.path.join(stage, "_STAGED")
    if not os.path.exists(done):
        os.makedirs(stage, exist_ok=True)
        tbl = pq.read_table(src, columns=["doc_id", "text"])
        ids = tbl["doc_id"].to_pylist()
        texts = tbl["text"].to_pylist()
        rows = [
            (i, t) for i, t in zip(ids, texts) if t is not None and len(t) > 0
        ]
        for crawl in range(n_crawls):
            urls, digs, pays = [], [], []
            for doc_id, text in rows:
                version = crawl // (1 + doc_id % 3)
                urls.append(f"https://synth.example/doc/{doc_id}")
                digs.append(
                    hashlib.md5(
                        (text + str(version)).encode("utf-8")
                    ).hexdigest()
                )
                pays.append(len(text))
            wave = pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "crawl": pa.array([crawl] * len(urls), pa.int32()),
                    "digest": pa.array(digs, pa.string()),
                    "payload": pa.array(pays, pa.int64()),
                }
            )
            p = os.path.join(stage, f"wave-{crawl}.parquet")
            pq.write_table(wave, p)
            os.utime(p, (1_000_000 + crawl * 10,) * 2)
        with open(done, "w") as fh:
            fh.write("ok")
    return (
        spark.readStream.schema(
            "url string, crawl int, digest string, payload bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )


_REVISIT_STATE = "digest string"
_REVISIT_OUT = "url string, crawl int, rec string, payload bigint"


def _revisit_decider(key, pdf_iter, state: GroupState):
    import pandas as pd

    last = state.get[0] if state.exists else None
    frames = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("crawl")
        recs = []
        for dig in pdf["digest"]:
            recs.append("revisit" if dig == last else "response")
            last = dig
        frames.append(
            pd.DataFrame(
                {
                    "url": pdf["url"],
                    "crawl": pdf["crawl"],
                    "rec": recs,
                    "payload": pdf["payload"],
                }
            )
        )
    state.update((last,))
    yield from frames


def stateful_revisit_planner(waves: DataFrame) -> DataFrame:
    """Per-url revisit decisions with the LAST DIGEST as group state:
    each micro-batch (one crawl wave) compares arriving digests against
    the state from prior batches — the streaming form of
    `warc_revisit_plan`'s lag window, with identical decisions."""
    return waves.groupBy("url").applyInPandasWithState(
        _revisit_decider,
        outputStructType=_REVISIT_OUT,
        stateStructType=_REVISIT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
