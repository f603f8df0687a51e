"""Frozen single-node oracle for the north_rule byte-identity invariant.

An INDEPENDENT implementation of the text-extraction SPEC (see
caraspark/pdfengine/textextract.py and caraspark/htmlengine.py docstrings) —
different algorithm, zero shared code with the engine: PDF objects are found
by scanning the raw bytes for ``N G obj`` frames (no xref resolution at
all; last definition wins, mirroring incremental-update semantics), and the
HTML extractor is a two-pass token-list design rather than the engine's
incremental flusher.

tests/golden/*/text.bin is produced by THIS module and committed; the Spark
pipeline must reproduce it byte-for-byte on every url (north_rule:
"byte-identical extracted text per url"). Do not refactor casually — this
file is the spec's second witness.
"""

from oracle.text_oracle import (  # noqa: F401
    oracle_extract,
    oracle_extract_spans,
)
