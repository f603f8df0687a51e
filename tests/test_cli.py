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
