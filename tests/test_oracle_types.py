"""Registry-wide oracle ↔ Spark Arrow-type parity (VERDICT r9 item 2).

The driver's value hash is Arrow-typed: a DuckDB oracle emitting
``DECIMAL(38,0)`` (its ``SUM(integer)`` result) against a Spark
``BIGINT`` hash-mismatches even when every value is identical — the
round-9 failure class (6 entries).  The local value compare in
``oracle_utils.compare`` goes through ``str()`` and cannot detect it,
so this test pins the type contract directly: for every oracled
registry entry, the DuckDB Arrow output schema must map 1:1 onto the
Spark DataFrame schema, including integer width (int32 vs int64 —
tolerated by today's driver hash, but one strict-mode change away
from a red row).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_type_parity import column_diffs, sweep  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_decimal_outputs_are_banned_even_when_matched():
    """Round-10 failure class: pricing_rollup had bit-identical values
    AND identical decimal128(28,2) Arrow schemas on both sides, yet the
    driver's hash stayed red — Arrow-type equality is not sufficient
    for DECIMAL.  The sweep must flag any decimal output column even
    when spark and oracle agree exactly."""
    diffs = column_diffs(
        {"k": "string", "v": "decimal(28,2)"},
        {"k": "string", "v": "decimal(28,2)"},
    )
    assert diffs and all("decimal" in d for d in diffs), diffs
    # and one-sided decimal is flagged once, alongside the mismatch
    diffs = column_diffs({"v": "decimal(18,2)"}, {"v": "float64"})
    assert any("banned" in d for d in diffs), diffs
    # clean maps stay clean
    assert column_diffs({"v": "float64"}, {"v": "float64"}) == []


def test_all_oracles_type_match_spark(spark):
    bad = sweep(spark, SF_DIR)
    assert not bad, (
        f"{len(bad)} oracle entries emit Arrow types that differ from "
        "the Spark side (cast the oracle SQL to the Spark type):\n"
        + "\n".join(f"{k}: {v}" for k, v in sorted(bad.items()))
    )
