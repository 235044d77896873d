"""Retired formulation variants stay oracle-pinned (round-14 merge).

The registry entries retired to reclaim driver-rotation capacity
(multi-device window/grouped/salted, fold brute-force ANN, fold/GEMM
all-pairs near-dup) keep the exact same DuckDB-oracle compare the
driver applies, run here every round instead.  This is the "every
retired oracle kept as a pytest pin" contract from the round-13
verdict.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_utils import compare, duck_con, run_oracle  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

RETIRED = entrymod.retired_queries()
RETIRED_ORACLES = entrymod.retired_oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def test_retired_sets_are_consistent():
    assert set(RETIRED) == set(RETIRED_ORACLES)
    assert not set(RETIRED) & set(entrymod.queries())
    merged = entrymod.all_queries()
    assert set(merged) == set(RETIRED) | set(entrymod.queries())


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_query_matches_oracle(name, spark, con):
    df = RETIRED[name](spark, SF_DIR)
    rows, cols = run_oracle(con, RETIRED_ORACLES[name])
    issues = compare(df, rows, cols)
    assert not issues, f"{name}: " + "; ".join(issues[:6])
