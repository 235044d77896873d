"""Caller-owned lifecycle for persisted intermediates.

Several operators persist an intermediate frame that the RETURNED
DataFrame still reads (exploded gram tables, LM rollups, per-round
graph frames).  Unpersisting before return would force a full
recompute the moment the caller materializes the result, so the ops
cannot release these themselves.  Instead every such persist site
routes through :func:`track`, and the caller (bench loop, pipeline
driver, test) calls :func:`release_all` once the result has been
consumed — bounding cache residue to one query's working set instead
of accumulating across a 100+-query session (VERDICT r8 item 8 /
ADVICE r8 item 1).

Iterative operators (PageRank, k-core) additionally unpersist each
superseded round inline — only base frames and the final round stay
tracked.
"""
from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_TRACKED_CKPT: list[tuple[object, frozenset]] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted frame for deferred release; returns it."""
    _TRACKED.append(df)
    return df


def local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint`` with deterministic release.

    localCheckpoint persists RDD blocks OUTSIDE the CacheManager, so
    ``DataFrame.unpersist`` never sees them and they linger until the
    JVM ContextCleaner notices the RDD is garbage.  This wrapper
    diffs the persistent-RDD registry around the (eager) checkpoint
    and records the new block ids; :func:`release_all` drops them
    explicitly.  After release the checkpointed frame is DEAD — local
    checkpoints sever lineage, so there is nothing to recompute from.
    Eager-only: a lazy checkpoint registers no blocks to diff (those
    stay on the ContextCleaner path).
    """
    if not eager:
        return df.localCheckpoint(eager=False)
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet())
    out = df.localCheckpoint(eager=True)
    new = set(sc._jsc.getPersistentRDDs().keySet()) - before
    if new:
        _TRACKED_CKPT.append((sc, frozenset(new)))
    return out


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any time — frames already unpersisted (or whose
    session is gone) are skipped silently.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass
    while _TRACKED_CKPT:
        sc, ids = _TRACKED_CKPT.pop()
        try:
            jmap = sc._jsc.getPersistentRDDs()
            for i in ids:
                if jmap.containsKey(i):
                    jmap.get(i).unpersist(blocking)
                    n += 1
        except Exception:
            pass
    return n
