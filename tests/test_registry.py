"""Guards on the driver registry window (__spark_entry__).

The driver verifies exactly the FIRST 50 registry entries per round, so the
window must be pinned explicitly and must never silently drift: every key the
round intends to prove green has to occupy one of those 50 slots.
"""

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as ent  # noqa: E402


def test_front_is_exactly_the_driver_window():
    merged = list(ent._merged())
    assert len(ent._FRONT) == 50
    assert len(set(ent._FRONT)) == 50
    assert merged[:50] == ent._FRONT


def test_window_keys_all_have_oracles():
    # A window row without an oracle records a weak rows-only check — never
    # spend one of the 50 slots on that.
    merged = ent._merged()
    missing = [k for k in ent._FRONT if merged[k].sql is None]
    assert missing == []


def test_oracle_free_keys_sort_dead_last():
    # agg_approx (nondeterministic sketch) and partition_metrics (wall-clock
    # timing columns) are permanently oracle-free; each has a hash-verified
    # sibling. They must never occupy a driver window row.
    merged = list(ent._merged())
    free = [k for k, q in ent._merged().items() if q.sql is None]
    assert sorted(free) == ["agg_approx", "partition_metrics"]
    assert all(merged.index(k) >= len(merged) - len(free) for k in free)


def test_window_covers_every_driver_unseen_oracle_key():
    # Any oracle-backed key with no row in a committed CORRECTNESS_r*.json
    # must be in the upcoming window — otherwise it can never turn green.
    seen = set()
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        with open(path, encoding="utf-8") as f:
            seen.update(json.load(f).keys())
    merged = ent._merged()
    unseen = [k for k, q in merged.items() if k not in seen and q.sql is not None]
    stranded = [k for k in unseen if k not in ent._FRONT]
    # New operators added mid-round queue immediately behind the window for
    # the NEXT round; they must be the only stranded ones.
    front_set = set(ent._FRONT)
    order = list(merged)
    for k in stranded:
        assert order.index(k) >= 50, k
        assert k not in front_set


def test_every_query_key_has_callable_and_schema_free_name():
    qs = ent.queries()
    sql = ent.oracle_sql()
    assert set(sql) <= set(qs)
    assert len(qs) == len(ent._merged())


def test_every_qkey_output_schema_is_driver_canonicalizable(spark, sf_smoke):
    """Round-2 lost a driver window row because image_resize emitted an
    array column the driver canonicalizer could not hash (fixed in r3 by
    flattening to scalar rows). This guard makes that failure class
    impossible to reintroduce: every registered qkey's OUTPUT schema must
    be flat — no array/map/struct columns — so the driver's sort-columns-
    by-name + value-hash protocol can always canonicalize it. Complex
    types are fine INSIDE a plan (embeddings, token arrays, header maps);
    they must be flattened/exploded before the qkey returns."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    # Piggybacked registry-wide PLAN pin (same DataFrame construction, so
    # near-zero extra cost): no qkey's physical plan may contain a
    # CartesianProduct (every join must be equi/broadcast/banded — the
    # all-pairs scale-killer is structurally banned, incl. join_cross,
    # whose bounded build side plans as BroadcastNestedLoopJoin) or a
    # BatchEvalPython (row-at-a-time Python UDF — the hot-path slow lane;
    # Arrow-vectorized MapInArrow/FlatMapGroupsInPandas nodes are the
    # sanctioned Python boundary). One documented exception: udtf_objects
    # exists to cover the Python UDTF API itself (SURVEY §2 U6), and
    # Python UDTFs evaluate via BatchEvalPython by definition.
    PLAN_ALLOW = {"udtf_objects": {"BatchEvalPython"}}

    offenders = {}
    plan_offenders = {}
    for k, fn in ent.queries().items():
        df = fn(spark, sf_smoke)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders[k] = complex_cols
        plan = df._jdf.queryExecution().executedPlan().toString()
        marks = {
            m
            for m in ("CartesianProduct", "BatchEvalPython")
            if m in plan
        } - PLAN_ALLOW.get(k, set())
        if marks:
            plan_offenders[k] = sorted(marks)
    # one combined assert so a schema offender can't mask plan offenders
    assert (offenders, plan_offenders) == ({}, {})
