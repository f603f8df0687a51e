"""Resume-after-kill test (SURVEY.md §5.2-6): crash mid-job, rerun, assert
the final table is byte-identical to an uninterrupted run with no
double-writes."""

from __future__ import annotations

from jobs.extract_job import read_extracted, run_job

N_DOCS = 96
UNITS = 8


def _table_fingerprint(df):
    rows = sorted(
        (r["url"], bytes(r["text"] or b""), r["verdict"]["valid"])
        for r in df.select("url", "text", "verdict").collect()
    )
    return rows


def test_resume_after_kill(spark, tmp_path):
    full_dir = str(tmp_path / "full")
    crash_dir = str(tmp_path / "crash")

    # uninterrupted reference run
    stats = run_job(spark, None, full_dir, units=UNITS, unit_chunk=2,
                    synth_docs=N_DOCS)
    assert not stats["crashed"] and stats["units_done"] == UNITS
    ref = _table_fingerprint(read_extracted(spark, full_dir))
    assert len(ref) == N_DOCS

    # crash after 2 of 4 chunks, then resume
    s1 = run_job(spark, None, crash_dir, units=UNITS, unit_chunk=2,
                 synth_docs=N_DOCS, fail_after_chunks=2)
    assert s1["crashed"]
    partial = read_extracted(spark, crash_dir).count()
    assert 0 < partial < N_DOCS  # snapshot shows only committed units

    s2 = run_job(spark, None, crash_dir, units=UNITS, unit_chunk=2,
                 synth_docs=N_DOCS)
    assert not s2["crashed"]
    got = _table_fingerprint(read_extracted(spark, crash_dir))
    assert got == ref  # byte-identical, no dupes, no holes


def test_rerun_is_noop(spark, tmp_path):
    out = str(tmp_path / "t")
    run_job(spark, None, out, units=4, unit_chunk=4, synth_docs=32)
    stats = run_job(spark, None, out, units=4, unit_chunk=4, synth_docs=32)
    assert stats["chunks"] == 0  # nothing left to plan
    assert read_extracted(spark, out).count() == 32


def test_snapshot_time_travel(spark, tmp_path):
    """Every snapshot in the chain stays readable: an earlier snapshot id
    yields exactly the rows committed at that point (Iceberg-style)."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from extract_job import read_extracted, run_job

    out = str(tmp_path / "tt")
    run_job(spark, None, out, units=8, unit_chunk=4, synth_docs=400)
    from caraspark.manifest import SnapshotManifest

    man = SnapshotManifest(out)
    sids = man.snapshots()
    assert len(sids) >= 2  # 8 units / chunk 4 → ≥2 commits
    n_prev = read_extracted(spark, out, snapshot_id=sids[0]).count()
    n_cur = read_extracted(spark, out).count()
    assert 0 < n_prev < n_cur == 400
    # unit sets are monotone along the chain
    assert man.committed_units(sids[0]) < man.committed_units(sids[-1])
