"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values
(order-insensitive: columns sorted by name, rows sorted by all columns).
STRICT mode compares floats exactly — the catalog is engineered for
bit-exact cross-engine equality, so exact comparison locally means the
driver's hash comparison passes too.
"""

from __future__ import annotations

import math
from typing import Optional

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v, float_tol: float):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        if float_tol:
            return round(v, 12)
        return v
    return v


def _sorted_rows(cols, rows, float_tol):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i], float_tol) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(
    spark_df,
    sql: str,
    con: duckdb.DuckDBPyConnection,
    float_tol: float = 0.0,
) -> Optional[str]:
    """Return None on match, else a human-readable diff summary."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = [c.lower() for c in spark_df.columns]
    rel = con.sql(sql)
    d_rows = rel.fetchall()
    d_cols = [c.lower() for c in rel.columns]

    if sorted(s_cols) != sorted(d_cols):
        return f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    a = _sorted_rows(s_cols, s_rows, float_tol)
    b = _sorted_rows(d_cols, d_rows, float_tol)
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return (
                f"first value mismatch at sorted row {i}:\n  spark : {x}\n  duckdb: {y}"
            )
    return None
