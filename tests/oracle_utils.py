"""Local replica of the driver's DuckDB-oracle compare.

Runs a Spark query and its oracle SQL side-by-side and compares
row count, column names, and order-insensitive values — the same
gate the driver applies at sf0.01 (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import datetime as dt
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


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value normalization: repr of the double
        return repr(round(v, 9))
    if v is None:
        return "<null>"
    return str(v)


def compare(spark_df, oracle_rows, oracle_cols) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    issues = []
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_cols)
    if s_cols != o_cols:
        return [f"columns differ: spark={s_cols} oracle={o_cols}"]
    s_rows = spark_df.collect()
    if len(s_rows) != len(oracle_rows):
        issues.append(f"row count: spark={len(s_rows)} oracle={len(oracle_rows)}")
    def key(row_vals):
        return tuple(_norm(v) for v in row_vals)

    s_set = sorted(key([r[c] for c in s_cols]) for r in s_rows)
    o_idx = {c: i for i, c in enumerate(oracle_cols)}
    o_set = sorted(key([r[o_idx[c]] for c in o_cols]) for r in oracle_rows)
    if s_set != o_set:
        diffs = 0
        for a, b in zip(s_set, o_set):
            if a != b:
                issues.append(f"row diff: spark={a} oracle={b}")
                diffs += 1
                if diffs >= 5:
                    break
        if not issues:
            issues.append("row multiset mismatch (length)")
    return issues


def run_oracle(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cur.fetchall(), cols
