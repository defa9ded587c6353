"""Oracle-parity harness mirroring the driver's correctness check:

run the Spark query and the DuckDB oracle on the same parquet tables, then
compare row count, sorted column names, and an order-insensitive value
multiset. Used by tests/test_oracle_parity.py before the driver ever sees a
query.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal
from typing import Any

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v: Any) -> Any:
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # floats compared at 12 significant digits: both sides compute
        # identical exact decimals, this only absorbs repr noise
        return f"{v:.12g}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare(spark_df, con: "duckdb.DuckDBPyConnection", sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = [tuple(r) for r in rel.fetchall()]

    result = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
        "count_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "value_match": False,
    }
    if result["count_match"] and result["schema_match"]:
        ns = _normalize_rows(s_cols, s_rows)
        nd = _normalize_rows(d_cols, d_rows)
        result["value_match"] = ns == nd
        if not result["value_match"]:
            diffs = [
                (a, b) for a, b in zip(ns, nd) if a != b
            ][:5]
            result["first_diffs"] = diffs
    return result
