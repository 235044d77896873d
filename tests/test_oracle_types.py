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

from tools.oracle_type_parity import sweep  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_all_oracles_type_match_spark(spark):
    bad = sweep(spark, SF_DIR)
    assert not bad, (
        f"{len(bad)} oracle entries emit Arrow types that differ from "
        "the Spark side (cast the oracle SQL to the Spark type):\n"
        + "\n".join(f"{k}: {v}" for k, v in sorted(bad.items()))
    )
