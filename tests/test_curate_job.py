"""End-to-end curation job tests: extract_job output → curate_job →
quality-gated, exactly-deduped, token-counted curated table with the same
crash/resume/idempotence contract and per-chunk lineage metrics."""

from __future__ import annotations

import hashlib

import pytest

from jobs.curate_job import read_curated, run_job as curate
from jobs.extract_job import run_job as extract

N_DOCS = 96
UNITS = 8


@pytest.fixture(scope="module")
def extracted(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lake") / "extracted")
    stats = extract(spark, None, d, units=UNITS, unit_chunk=4,
                    synth_docs=N_DOCS)
    assert not stats["crashed"]
    return d


def _fingerprint(df):
    return sorted(
        (r["url"], hashlib.md5((r["text"] or "").encode()).hexdigest(),
         r["n_tokens"])
        for r in df.select("url", df["text"].cast("string").alias("text"),
                           "n_tokens").collect()
    )


def test_curate_end_to_end_invariants(spark, tmp_path, extracted):
    out = str(tmp_path / "curated")
    stats = curate(spark, extracted, out, unit_chunk=2, min_quality=1)
    assert not stats["crashed"] and stats["units_done"] == UNITS
    cur = read_curated(spark, out)
    rows = cur.select(
        "url", cur["text"].cast("string").alias("text"), "n_tokens", "digest"
    ).collect()
    assert rows
    # exact dedup: every digest appears once, and matches the text bytes
    digests = [r["digest"] for r in rows]
    assert len(digests) == len(set(digests))
    for r in rows[:30]:
        assert r["digest"] == hashlib.md5(r["text"].encode()).hexdigest()
        assert r["n_tokens"] == len(r["text"].split())
        assert r["text"]  # no empty-text rows survive the gate

    # lineage metrics: conservation per unit
    from caraspark.manifest import SnapshotManifest

    units = SnapshotManifest(out).units_map()
    assert len(units) == UNITS
    for meta in units.values():
        assert meta["rows_in"] >= meta["rows_out"] >= 0
        assert (
            meta["dropped_quality"] + meta["dropped_dup"]
            == meta["rows_in"] - meta["rows_out"]
        )


def test_curate_resume_after_kill_is_byte_identical(
    spark, tmp_path, extracted
):
    full = str(tmp_path / "full")
    crash = str(tmp_path / "crash")
    curate(spark, extracted, full, unit_chunk=2, min_quality=1)
    ref = _fingerprint(read_curated(spark, full))

    s1 = curate(spark, extracted, crash, unit_chunk=2, min_quality=1,
                fail_after_chunks=2)
    assert s1["crashed"]
    assert 0 < read_curated(spark, crash).count() < len(ref) + 1

    s2 = curate(spark, extracted, crash, unit_chunk=2, min_quality=1)
    assert not s2["crashed"]
    assert _fingerprint(read_curated(spark, crash)) == ref


def test_curate_rerun_is_noop(spark, tmp_path, extracted):
    out = str(tmp_path / "t")
    curate(spark, extracted, out, unit_chunk=8, min_quality=1)
    stats = curate(spark, extracted, out, unit_chunk=8, min_quality=1)
    assert stats["chunks"] == 0


def test_export_packed_roundtrip(spark, tmp_path, extracted):
    """Every curated doc lands in exactly one sequence, sequence token
    sums respect the greedy-cumsum rule, and re-export is byte-identical."""
    import glob
    import gzip
    import json

    from jobs.curate_job import export_packed

    cur_dir = str(tmp_path / "curated")
    curate(spark, extracted, cur_dir, unit_chunk=8, min_quality=1)
    cur = read_curated(spark, cur_dir)
    out1 = str(tmp_path / "packed1")
    export_packed(cur, out1, seq_target=256)

    def read_all(d):
        recs = []
        for p in sorted(glob.glob(f"{d}/part-*.txt.gz")):
            with gzip.open(p, "rt") as f:
                recs.extend(json.loads(ln) for ln in f)
        return recs

    recs = read_all(out1)
    assert recs
    packed_urls = [u for r in recs for u in r["urls"]]
    want_urls = [r.url for r in cur.select("url").collect()]
    assert sorted(packed_urls) == sorted(want_urls)  # exactly-once
    for r in recs:
        assert r["n_tokens"] > 0
        assert len(r["urls"]) == len(r["texts"])
        # greedy rule: every doc but the last starts before the target
        # boundary, so a sequence only exceeds target via its final doc
        assert r["n_tokens"] <= 256 or len(r["urls"]) >= 1

    out2 = str(tmp_path / "packed2")
    export_packed(cur, out2, seq_target=256)
    payload = lambda d: [  # noqa: E731
        (json.dumps(r, sort_keys=True)) for r in read_all(d)
    ]
    assert sorted(payload(out1)) == sorted(payload(out2))


def test_datacard_reconciles_with_curated_table(spark, tmp_path, extracted):
    from jobs.curate_job import datacard, read_curated, run_job

    out = str(tmp_path / "curated_card")
    stats = run_job(spark, extracted, out, unit_chunk=64)
    assert not stats["crashed"]
    cur = read_curated(spark, out)
    card = {r.kind: r for r in datacard(cur).collect()}
    rows = cur.selectExpr(
        "kind", "CAST(text AS STRING) AS text", "n_tokens", "digest"
    ).collect()
    from collections import defaultdict

    exp = defaultdict(lambda: [0, 0, 0, set()])
    for r in rows:
        e = exp[r.kind]
        e[0] += 1
        e[1] += len(r.text)
        e[2] += r.n_tokens
        e[3].add(r.digest)
    assert set(card) == set(exp)
    for kind, (nd, nc, nt, digs) in exp.items():
        c = card[kind]
        assert (c.n_docs, c.n_chars, c.n_tokens, c.n_digests) == (
            nd, nc, nt, len(digs),
        )
