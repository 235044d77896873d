"""Single-node comparator: run the engine's own oracle SQL through
DuckDB (32 threads, same parquet) for every oracled bench query and
print per-query + total seconds — the baseline bench.py is graded
against. Usage: python tools/duckdb_compare.py [sf_dir]."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from tests.oracle_utils import TABLES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = E.oracle_sql()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        sql = oracles.get(name)
        if sql is None:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "duckdb oracle suite wall clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
