"""Interval (range) joins at scale: match point events to the time
interval containing them WITHOUT the cartesian/nested-loop plan a
naive theta join produces.

Spark plans `a JOIN b ON a.key = b.key AND a.ts BETWEEN b.lo AND
b.hi` as an equi-join only when the key carries enough selectivity;
with no equi key (or a hot key) it degenerates to
BroadcastNestedLoopJoin — O(|a|·|b|) per key. The standard scale
fix, implemented here: quantize time into fixed epochs, EXPLODE each
interval to the epochs it covers, and equi-join on (key, epoch) —
the theta predicate then filters within epoch-matched candidate
pairs only. Shuffle volume is |events| + Σ interval-spans, and the
join is hash/sort-merge (AQE-eligible, skew-splittable), never a
nested loop. Epoch length trades duplication (long intervals span
more epochs) against candidate precision; intervals are deduped by
construction since disjoint per-key sessions can't double-match an
event, and multi-epoch matches collapse with a distinct on the
output key.

The naive formulation is kept as the labeled correctness baseline
(the GEMM-baseline convention of the similarity family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPOCH_SECONDS = 3600


def interval_join_naive(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Labeled baseline: direct equi+theta join. Correct at any
    scale Spark can shuffle, but the theta residual evaluates per
    key-matched pair — quadratic within hot keys."""
    return events.join(
        intervals,
        on=[
            events[key] == intervals[key],
            events[ts_col] >= intervals[lo_col],
            events[ts_col] <= intervals[hi_col],
        ],
    ).select(events[key], events[ts_col], intervals[lo_col], intervals[hi_col])


def interval_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    epoch_seconds: int = EPOCH_SECONDS,
) -> DataFrame:
    """Scale path: epoch-bucketed equi-join (see module docstring).

    Output: (key, ts, lo, hi) — one row per (event, containing
    interval) pair, identical to the naive join's result set.
    """
    if epoch_seconds <= 0:
        raise ValueError("epoch_seconds must be positive")
    ep = lambda c: (F.unix_timestamp(F.col(c)) / epoch_seconds).cast("long")  # noqa: E731
    ev = events.select(
        F.col(key), F.col(ts_col), ep(ts_col).alias("_epoch")
    )
    iv = intervals.select(
        F.col(key),
        F.col(lo_col),
        F.col(hi_col),
        F.explode(
            F.sequence(ep(lo_col), ep(hi_col))
        ).alias("_epoch"),
    )
    return (
        ev.join(iv, on=[key, "_epoch"])
        .where(
            (F.col(ts_col) >= F.col(lo_col))
            & (F.col(ts_col) <= F.col(hi_col))
        )
        .select(key, ts_col, lo_col, hi_col)
        # no dedup needed: the event row carries exactly ONE epoch,
        # so each (event, interval) pair matches in at most one
        # epoch — output multiplicity is identical to the naive join
    )
