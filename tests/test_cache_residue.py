"""StorageLevel-residue sweep (VERDICT r8 item 8 / r9 item 9).

Operators that persist intermediates route them through
``cacheutil.track``; a caller finishes a query and calls
``cacheutil.release_all()``.  This sweep runs EVERY registry entry at
sf0.001 (not a hand-list — round 9 additions like PQ/IVFPQ codebook
frames, SCD2 state, and block-GEMM sides must stay enumerated as the
registry grows), materializes the result, releases, and asserts the
JVM's persistent-RDD set is back to what it was before the query —
i.e. zero accumulated cache residue per query.
"""
from __future__ import annotations

import pytest

import __spark_entry__ as entry
from fxa_activity_metrics_spark import cacheutil
from tests.conftest import SF001

PERSIST_USERS = sorted(entry.queries())


def _persistent_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


@pytest.mark.parametrize("name", PERSIST_USERS)
def test_no_residue_after_release(spark, name):
    qs = entry.queries()
    before = _persistent_ids(spark)
    qs[name](spark, SF001).count()
    released = cacheutil.release_all(blocking=True)
    after = _persistent_ids(spark)
    leftover = after - before
    assert not leftover, (
        f"{name}: {len(leftover)} persisted RDDs survive release_all "
        f"(released {released})"
    )


def test_iterative_rounds_released_inline(spark):
    """PageRank/k-core unpersist superseded rounds inside the loop —
    peak tracked-frame count stays at base frames + final round, not
    O(n_iters)."""
    qs = entry.queries()
    before = _persistent_ids(spark)
    qs["pagerank_neardup"](spark, SF001).count()
    mid = _persistent_ids(spark) - before
    # e, nodes, ed, final pr — and nothing per-round beyond the final
    assert len(mid) <= 6, f"per-round frames leaked: {len(mid)}"
    cacheutil.release_all(blocking=True)
    assert not (_persistent_ids(spark) - before)
