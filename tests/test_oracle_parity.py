"""Every queries() entry hash-matches its DuckDB oracle at sf0.01 —
the local replica of the driver's correctness gate."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_utils import compare, duck_con, run_oracle  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        # rows-only check (approximate/non-SQL operators)
        assert df.count() >= 0
        return
    rows, cols = run_oracle(con, ORACLES[name])
    issues = compare(df, rows, cols)
    assert not issues, f"{name}: " + "; ".join(issues[:6])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns
