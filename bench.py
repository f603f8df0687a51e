"""Benchmark harness — prints ONE JSON line the driver records as BENCH_r{N}.json.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. Each query is executed with a `noop` write so the
full plan runs distributed without collecting results to the driver.

Also reports extraction throughput (docs/s) once caraspark.extract lands, and
the 8-vs-32-core scaling efficiency lives in tools/bench_scaling.py →
BENCH/BASELINE.md (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "agg_q1",
    "join_sortmerge",
    "join_broadcast",
    "join_asof",
    "win_topk",
    "win_running",
    "agg_collect",
    "agg_rollup",
    "fn_dot",
    "agg_udaf",
    "filter_pred",
    "fn_json",
]


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as ent
    from caraspark.session import get_spark

    spark = get_spark("caraspark-bench")
    qs = ent.queries()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # warm the JVM + parquet footers once so per-query numbers are compute
    for name in ("scan_parquet",):
        if name in qs:
            run_noop(qs[name](spark, sf_dir))

    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        run_noop(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # LLM-pipeline ops, timed but NOT in the headline total — keeps
    # `value` comparable round-over-round while showing these costs
    extra_pack: dict[str, float] = {}
    for name in (
        "dedup_minhash",
        "dedup_simhash",
        "ann_ivf",
        "ann_lsh",
        "doc_chunks",
        "pack_sequences",
        "warc_roundtrip",
    ):
        if name not in qs:
            continue
        t0 = time.time()
        run_noop(qs[name](spark, sf_dir))
        extra_pack[name] = round(time.time() - t0, 3)

    # extraction throughput (flagship), if the extract pack is present
    try:
        from caraspark.bench_extract import extraction_docs_per_sec

        docs_s, n_docs, secs = extraction_docs_per_sec(spark)
        extra = {"extract_docs_per_sec": round(docs_s, 1), "extract_docs": n_docs,
                 "extract_sec": round(secs, 3)}
        timings["doc_extract"] = round(secs, 3)
    except ImportError:
        pass

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_pack_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_extra": extra_pack,
        "sf": sf_dir,
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
