"""C24 cleanup: canonical re-serialization must be a FIXPOINT —
serialize→parse→serialize returns identical bytes (SURVEY.md §5.2-3)."""

from __future__ import annotations

import random

import pytest

from caraspark.pdfengine.cleanup import cleanup
from caraspark.pdfengine.document import load_document
from caraspark.synth import PDF_RECIPES

# cleanup is defined over documents the engine accepts (relaxed-valid);
# hard-broken xref fixtures don't have a canonical form
FIXPOINT_RECIPES = [
    "pdf_minimal",
    "pdf_text_ops",
    "pdf_flate",
    "pdf_ahx",
    "pdf_a85",
    "pdf_rle",
    "pdf_chain",
    "pdf_xrefstream",
    "pdf_objstm",
    "pdf_updated",
    "pdf_hybrid",
    "pdf_linearized",
    "pdf_holes",
    "pdf_junk_header",
    "pdf_len_mismatch",
]


@pytest.mark.parametrize("reencode", ["none", "flate"])
@pytest.mark.parametrize("name", FIXPOINT_RECIPES)
def test_cleanup_fixpoint(name, reencode):
    blob = PDF_RECIPES[name]()
    doc1 = load_document(blob)
    c1 = cleanup(doc1, reencode=reencode)
    doc2 = load_document(c1)
    # the canonical form itself parses cleanly...
    fatal = [e for e in doc2.errors if e.code.startswith(("xref.", "obj."))]
    assert not fatal, f"{name}: canonical form has errors {fatal[:3]}"
    c2 = cleanup(doc2, reencode=reencode)
    assert c1 == c2, f"{name}: cleanup is not a fixpoint"


def test_cleanup_flate_mode_compresses_and_preserves_text():
    from caraspark.pdfengine import process_document

    for name in ("pdf_text_ops", "pdf_flate", "pdf_objstm"):
        blob = PDF_RECIPES[name]()
        out = cleanup(load_document(blob), reencode="flate")
        assert b"/Filter /FlateDecode" in out, name
        before = process_document(blob).text
        after = process_document(out).text
        assert before == after, name


def test_cleanup_preserves_text():
    from caraspark.pdfengine import process_document

    for name in ("pdf_minimal", "pdf_text_ops", "pdf_flate", "pdf_objstm"):
        blob = PDF_RECIPES[name]()
        before = process_document(blob).text
        after = process_document(cleanup(load_document(blob))).text
        assert before == after, name


def test_cleanup_deterministic_under_mutation_survivors():
    """Any mutated doc the parser accepts must still reach a fixpoint."""
    rng = random.Random(7)
    base = PDF_RECIPES["pdf_minimal"]()
    for _ in range(25):
        blob = bytearray(base)
        blob[rng.randrange(len(blob))] = rng.randrange(256)
        doc = load_document(bytes(blob))
        c1 = cleanup(doc)
        c2 = cleanup(load_document(c1))
        assert c1 == c2


# --- xref-free repair --------------------------------------------------------


def test_repair_truncated_file_loads_valid():
    from caraspark.pdfengine.api import process_document
    from caraspark.pdfengine.cleanup import repair_document
    from caraspark.pdfengine.document import load_document
    from caraspark.synth import PDF_RECIPES

    blob = PDF_RECIPES["pdf_truncated"]()
    assert not load_document(blob).objects  # the normal path gets nothing
    rep = repair_document(blob)
    doc = load_document(rep)
    assert len(doc.objects) >= 3
    assert process_document(rep).valid


def test_repair_of_healthy_file_is_cleanup():
    from caraspark.pdfengine.cleanup import cleanup, repair_document
    from caraspark.pdfengine.document import load_document
    from caraspark.synth import PDF_RECIPES

    blob = PDF_RECIPES["pdf_minimal"]()
    assert repair_document(blob) == cleanup(load_document(blob))


def test_repair_output_is_a_cleanup_fixpoint():
    from caraspark.pdfengine.cleanup import cleanup, repair_document
    from caraspark.pdfengine.document import load_document
    from caraspark.synth import PDF_RECIPES

    rep = repair_document(PDF_RECIPES["pdf_truncated"]())
    assert cleanup(load_document(rep)) == rep


def test_repair_last_body_per_number_wins():
    """An appended replacement object (incremental-update order) must win
    over the original when the xref is dead."""
    from caraspark.pdfengine.cleanup import repair_document
    from caraspark.pdfengine.document import load_document
    from caraspark.synth import PDF_RECIPES

    dead = PDF_RECIPES["pdf_truncated"]()
    patched = (
        dead
        + b"\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Marker true >>\n"
        b"endobj\n"
    )
    rep = repair_document(patched)
    doc = load_document(rep)
    cats = [
        o for o in doc.objects.values()
        if isinstance(o, dict) and o.get("Marker") is True
    ]
    assert len(cats) == 1


def test_repair_unrepairable_raises():
    import pytest

    from caraspark.pdfengine.cleanup import repair_document

    with pytest.raises(ValueError):
        repair_document(b"%PDF-1.4\njunk with no objects at all")
