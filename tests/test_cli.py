"""CLI parity tests — caradoc's command surface via ``python -m caraspark``
(`ref:src/main.ml` dispatch [P]); exit code 0 = valid, 1 = invalid."""

from __future__ import annotations

import json

import pytest

from caraspark.__main__ import main
from caraspark.synth import PDF_RECIPES


@pytest.fixture()
def pdf(tmp_path):
    def write(name: str) -> str:
        p = tmp_path / f"{name}.pdf"
        p.write_bytes(PDF_RECIPES[name]())
        return str(p)

    return write


def test_stats_valid_doc_exits_zero(pdf, capsys):
    assert main(["stats", pdf("pdf_minimal")]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["valid"] and out["strict"] and out["n_objects"] == 4


def test_stats_invalid_doc_exits_one(pdf, capsys):
    assert main(["stats", pdf("pdf_bad_xref_offset")]) == 1
    out = json.loads(capsys.readouterr().out)
    assert not out["valid"] and out["errors_by_code"]


def test_types_lists_assignments(pdf, capsys):
    assert main(["types", pdf("pdf_minimal")]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert "1.0\tcatalog" in lines and "3.0\tpage" in lines


def test_xref_shows_compressed_entries(pdf, capsys):
    assert main(["xref", pdf("pdf_objstm")]) == 0
    out = capsys.readouterr().out
    assert "compressed objstm=" in out and "inuse offset=" in out


def test_trailer_dumps_canonical_json(pdf, capsys):
    assert main(["trailer", pdf("pdf_updated")]) == 0
    out = capsys.readouterr().out
    assert out.count("# trailer") == 2  # incremental update → two trailers
    assert '"Root"' in out


def test_object_and_findref(pdf, capsys):
    f = pdf("pdf_minimal")
    assert main(["object", f, "--num", "1"]) == 0
    assert '"$n":"Catalog"' in capsys.readouterr().out.replace(" ", "")
    assert main(["findref", f, "--num", "3"]) == 0
    assert "2 0" in capsys.readouterr().out  # pages node references the page


def test_extract_writes_text(pdf, tmp_path, capsys):
    out = tmp_path / "t.txt"
    assert main(["extract", pdf("pdf_text_ops"), "--out", str(out)]) == 0
    assert out.read_bytes().startswith(b"First line")


def test_cleanup_fixpoint_through_cli(pdf, tmp_path, capsys):
    clean = tmp_path / "clean.pdf"
    assert main(["cleanup", pdf("pdf_junk_header"), "--out", str(clean)]) == 0
    # the cleaned file parses valid+strict (normal form)
    assert main(["stats", str(clean)]) == 0


def test_spark_submit_pyfiles_delivery(tmp_path):
    """North-rule delivery form end-to-end: build caraspark.zip, launch
    the job via real `spark-submit --py-files` from a cwd where the
    package is NOT importable, and read the committed snapshot back.
    Proves the zip is self-contained (a missing module fails the
    subprocess, not some later import)."""
    import os
    import shutil
    import subprocess
    import sys

    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "caraspark.zip")
    sys.path.insert(0, os.path.join(repo, "tools"))
    from build_pyfiles import build

    assert build(zip_path) > 0
    out_dir = str(tmp_path / "table")
    job = str(tmp_path / "extract_job.py")
    shutil.copy(os.path.join(repo, "jobs", "extract_job.py"), job)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", zip_path,
         job, "--synth-docs", "16", "--units", "4", "--unit-chunk", "4",
         "--output", out_dir],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    from jobs.extract_job import read_extracted

    from caraspark.session import get_spark

    spark = get_spark("pyfiles-check")
    assert read_extracted(spark, out_dir).count() == 16


def test_scavenge_reports_shadow_objects(pdf, capsys):
    assert main(["scavenge", pdf("pdf_updated")]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert sum(1 for ln in out if ln.endswith("shadow")) == 1
    assert sum(1 for ln in out if ln.endswith("xref")) == 4


def test_scavenge_recovers_truncated_file(pdf, capsys):
    assert main(["scavenge", pdf("pdf_truncated")]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all(ln.endswith("shadow") for ln in out)


def test_repair_cli_roundtrip(pdf, tmp_path, capsys):
    out = str(tmp_path / "repaired.pdf")
    assert main(["repair", pdf("pdf_truncated"), "--out", out]) == 0
    capsys.readouterr()
    assert main(["stats", out]) == 0  # repaired file is VALID
