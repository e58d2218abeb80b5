"""Local replica of the driver's DuckDB-oracle comparison (SURVEY §5).

For each catalog entry with an oracle: run the Spark query and the DuckDB SQL
on the same parquet tables, then compare row count, column names, and
order-insensitive values.  Floats compare with a tiny relative tolerance
locally (the catalog's numeric-parity conventions aim for exact equality;
the tolerance just keeps local failures readable if one regresses).
"""

from __future__ import annotations

import math
import os

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, con, sql, rel_tol=0.0, abs_tol=0.0):
    """Return (ok, message). Mirrors the driver: count + schema + values."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} duck={len(d_rows)}"

    a = _sorted_rows(s_cols, s_rows)
    b = _sorted_rows(d_cols, d_rows)
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=rel_tol, abs_tol=abs_tol):
                    return False, f"value mismatch row {i}: {ra} vs {rb}"
            elif va != vb:
                return False, f"value mismatch row {i}: {ra} vs {rb}"
    return True, "ok"
