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


# Round-5 driver window: the driver verifies exactly the first 50 registry
# entries, so _FRONT pins them explicitly. After r01–r04, 204 oracle-backed
# keys have never had a driver row; this window fronts 50 of them, zero
# repeats, ordered by the round-4 verdict's priority list: (a) the six
# operators that were NEW in round 4 and whose only evidence is one local
# gate, (b) the PDF forensics side tables, (c) the events / time-series
# analytics pack, (d) the streaming side-table twins. tests/test_registry.py
# asserts list(_merged())[:50] == _FRONT so the window can't drift silently.
_FRONT = [
    # -- (a) round-4-new operators, gate-only so far --
    "url_surt", "quality_calibration", "warc_revisit_plan",
    "decontaminate_remove", "quality_threshold_sweep", "stream_revisit_plan",
    # -- (b) PDF forensics side tables --
    "pdf_repair", "pdf_scavenge", "pdf_revisions", "pdf_sigs", "pdf_xmp",
    "pdf_fonts", "pdf_pages", "pdf_actions", "pdf_images", "pdf_annots",
    "pdf_content_ops", "pdf_stream_stats",
    # -- (c) events / time-series analytics pack --
    "win_sessionize", "events_funnel", "retention_cohorts",
    "events_transitions", "ts_downsample", "ts_cusum", "events_attribution",
    "ts_gapfill", "events_streaks", "events_gap_hist", "events_iqr_outliers",
    "events_wau", "events_cep", "events_rfm", "events_abtest",
    "win_sliding_median",
    # -- (d) streaming side-table twins (each hash-equal to its batch qkey) --
    "stream_anchor_agg", "stream_tables", "stream_quality", "stream_lists",
    "stream_images", "stream_jsonld", "stream_robots", "stream_alternates",
    "stream_frontier", "stream_refresh", "stream_pagination",
    "stream_sitemap", "stream_feed", "stream_revisit", "stream_validators",
    "stream_microdata",
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
