"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, compared against DuckDB at sf=0.01 by the driver.

The actual implementations live in the ``caraspark`` package; this module
only assembles the registries.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from caraspark import relational  # noqa: E402

_REGISTRIES = [relational.REGISTRY]

# Optional packs appended as they land (each module exposes REGISTRY).
# A broken module must never silently shrink the registry: import errors
# are printed to stderr so the driver log shows the missing pack.
for _mod in (
    "textops",
    "curation",
    "extract_queries",
    "sidetables",
    "streaming_queries",
    "pdfacts",
    "multimodal",
    "warc",
):
    try:
        _m = __import__(f"caraspark.{_mod}", fromlist=["REGISTRY"])
        _REGISTRIES.append(_m.REGISTRY)
    except Exception as exc:  # noqa: BLE001 — loud, never silent
        print(
            f"__spark_entry__: FAILED to import caraspark.{_mod}: "
            f"{type(exc).__name__}: {exc} — its qkeys are MISSING from the "
            "registry",
            file=sys.stderr,
        )


def _driver_verified_keys() -> set[str]:
    """qkeys that already have a row in any prior round's CORRECTNESS file.

    The driver only runs a prefix of the registry each round, so keys it has
    never seen are moved to the front (see ``_merged``). Reading the committed
    ``CORRECTNESS_r*.json`` files makes the ordering self-adapting per round.
    """
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            with open(path, encoding="utf-8") as f:
                seen.update(json.load(f).keys())
        except (OSError, ValueError):
            continue
    return seen


# Round-3 driver window: the driver verifies exactly the first 50 registry
# entries, so _FRONT pins them explicitly. 40 oracle-backed keys have never
# had a driver row across r01/r02 (the 41st unseen key, partition_metrics,
# is permanently oracle-free and sorts last — see rank()); image_resize was
# red in r02 (array-typed output broke the driver canonicalizer) and was
# flattened to scalar rows, so it must be re-verified; the last 9 are
# retests of keys whose code paths changed this round (warc parser, extract
# want= pushdown, minhash hash flag) plus representative anchors.
# tests/test_registry.py asserts list(_merged())[:50] == _FRONT so the
# window can't drift silently.
_FRONT = [
    # -- 40 never-driver-verified oracle-backed keys (registration order) --
    "join_bucketed", "agg_approx_check", "agg_cube", "agg_salted_distinct",
    "agg_grouped_map", "set_except_all", "set_intersect_all", "join_salted",
    "text_fingerprint", "text_langid", "text_tokens_bpe",
    "dedup_substring", "dedup_substring_spans",
    "text_pii", "text_gopher", "sample_stratified", "ngram_topk",
    "decontaminate", "mix_weights", "text_repetition", "filter_blocklist",
    "graph_pagerank", "text_entropy", "doc_chunks", "pack_sequences",
    "doc_headings", "partition_lineage", "corpus_pipeline", "doc_scan",
    "pdf_edges", "pdf_dangling", "pdf_findref", "pdf_types", "pdf_objects",
    "pdf_objects_variant", "pdf_cleanup", "udtf_objects",
    "pdf_attachments", "pdf_outline", "pdf_formfields",
    # -- the one red r02 row, now flattened to scalar columns --
    "image_resize",
    # -- retests: code paths touched this round + representative anchors --
    "warc_roundtrip",          # warc.py negative-Content-Length fix
    "doc_extract",             # want= projection pushdown lands this round
    "doc_extract_roundtrip",
    # -- late-round-3 operators, never driver-verified --
    "text_readability",
    "embed_quantize",
    "pdf_javascript",
    "text_normalize",
    "doc_alternates_sig",      # SPEC v15 over the full corpus
    "hreflang_census",
]


def _merged():
    out = {}
    for reg in _REGISTRIES:
        for k, q in reg.items():
            if k in out:
                raise KeyError(f"duplicate qkey {k!r}")
            out[k] = q
    # _FRONT pins the driver's 50-row window exactly (in order). Behind it:
    # never-driver-verified keys first (new operators added mid-round queue
    # for the NEXT window), then previously-verified keys. The two
    # permanently-oracle-free keys (agg_approx: nondeterministic sketch;
    # partition_metrics: wall-clock timing columns) sort dead last so they
    # never burn a window row — each has a hash-verified sibling
    # (agg_approx_check, partition_lineage) that IS the correctness
    # evidence. Ties keep registration order, so the result is
    # deterministic.
    seen = _driver_verified_keys()
    front = {k: i for i, k in enumerate(_FRONT)}

    def rank(item):
        k, q = item
        return (front.get(k, len(front)), q.sql is None, k in seen)

    return dict(sorted(out.items(), key=rank))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: extraction-shaped analytics — per-region revenue
    with broadcast dims, aggregation, and a window rank (swapped to the
    documents_raw extraction pipeline once caraspark.extract lands)."""
    sf = "/root/testdata/sf0.001"
    try:
        from caraspark.extract_queries import flagship

        return flagship(spark, sf)
    except ImportError:
        from caraspark.relational import join_broadcast

        return join_broadcast(spark, sf)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: q.fn for k, q in _merged().items()}


def oracle_sql() -> dict[str, str]:
    return {k: q.sql for k, q in _merged().items() if q.sql is not None}
