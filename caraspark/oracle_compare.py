"""Order-insensitive result comparison against a DuckDB oracle.

Mirrors the driver's correctness gate: row count + column-name set + a
value hash computed over rows serialized with columns sorted by name.
Shared by tools/check_oracle.py and the pytest suite.
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime

import duckdb

from caraspark.tables import TABLES


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    return len(rows), hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    sn, sh = table_hash(scols, srows)
    dn, dh = table_hash(dcols, drows)
    if sorted(scols) != sorted(dcols):
        return False, f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}"
    if sn != dn:
        return False, f"row counts differ: spark={sn} duck={dn}"
    if sh != dh:
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        sset = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in srows)
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        dset = sorted("\x1f".join(norm_cell(r[i]) for i in dorder) for r in drows)
        for a, b in zip(sset, dset):
            if a != b:
                return False, f"value mismatch:\n  spark: {a[:300]}\n  duck : {b[:300]}"
        return False, "hash mismatch (no row-level diff found?)"
    return True, f"rows={sn} hash={sh}"
