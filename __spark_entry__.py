"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, compared against DuckDB at sf=0.01 by the driver.

The actual implementations live in the ``caraspark`` package; this module
only assembles the registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caraspark import relational  # noqa: E402

_REGISTRIES = [relational.REGISTRY]

# Optional packs appended as they land (each module exposes REGISTRY).
for _mod in (
    "textops",
    "extract_queries",
    "sidetables",
    "streaming_queries",
    "pdfacts",
    "multimodal",
):
    try:
        _m = __import__(f"caraspark.{_mod}", fromlist=["REGISTRY"])
        _REGISTRIES.append(_m.REGISTRY)
    except ImportError:
        pass


def _merged():
    out = {}
    for reg in _REGISTRIES:
        for k, q in reg.items():
            if k in out:
                raise KeyError(f"duplicate qkey {k!r}")
            out[k] = q
    return out


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
