"""Interval joins (operators/rangejoin.py): bucketed == naive on
boundary-heavy cases, and the plan never degenerates to a nested
loop."""

from __future__ import annotations

import datetime as dt

import pytest

import __spark_entry__ as E
from fxa_activity_metrics_spark.operators.rangejoin import (
    interval_join_bucketed,
    interval_join_naive,
)

SF = "/root/testdata/sf0.01"


def _frames(spark):
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    sec = dt.timedelta(seconds=1)
    events = spark.createDataFrame(
        [
            (1, t0),                      # == interval lo
            (1, t0 + 3599 * sec),         # just inside epoch 1
            (1, t0 + 3600 * sec),         # exactly on an epoch edge
            (1, t0 + 7200 * sec),         # == interval hi
            (1, t0 + 7201 * sec),         # outside (hi is inclusive)
            (2, t0 + 10 * sec),           # other key, no interval
            (1, t0 - 1 * sec),            # before lo
        ],
        "k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (1, t0, t0 + 7200 * sec),              # spans 3 epochs
            (1, t0 + 9000 * sec, t0 + 9000 * sec), # zero-length
            (2, t0 + 100 * sec, t0 + 200 * sec),   # misses the event
        ],
        "k long, lo timestamp, hi timestamp",
    )
    return events, intervals


def _rows(df):
    return sorted((r.k, r.ts, r.lo, r.hi) for r in df.collect())


@pytest.mark.parametrize("epoch", [1, 7, 3600, 10**6])
def test_bucketed_equals_naive_all_epoch_lengths(spark, epoch):
    events, intervals = _frames(spark)
    naive = _rows(
        interval_join_naive(events, intervals, "k", "ts", "lo", "hi")
    )
    bucketed = _rows(
        interval_join_bucketed(
            events, intervals, "k", "ts", "lo", "hi", epoch_seconds=epoch
        )
    )
    assert bucketed == naive
    # sanity: the expected containments, by hand
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    assert [(k, ts) for k, ts, _, _ in naive] == [
        (1, t0),
        (1, t0 + dt.timedelta(seconds=3599)),
        (1, t0 + dt.timedelta(seconds=3600)),
        (1, t0 + dt.timedelta(seconds=7200)),
    ]


def test_duplicate_events_keep_multiplicity(spark):
    t0 = dt.datetime(2024, 5, 1, 0, 0, 0)
    events = spark.createDataFrame(
        [(1, t0), (1, t0)], "k long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(1, t0, t0)], "k long, lo timestamp, hi timestamp"
    )
    out = interval_join_bucketed(events, intervals, "k", "ts", "lo", "hi")
    assert out.count() == 2, "one output row per input event row"


def test_registry_query_plan_no_nested_loop(spark):
    df = E.queries()["interval_join"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
    )


def test_invalid_epoch(spark):
    events, intervals = _frames(spark)
    with pytest.raises(ValueError):
        interval_join_bucketed(
            events, intervals, "k", "ts", "lo", "hi", epoch_seconds=0
        )
