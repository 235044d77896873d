"""Unit semantics for the activity-analytics rollups: cohort
retention triangle and ordered-funnel conversion. Oracle hash-parity
is covered by test_oracle_parity.py; these pin the contracts on
crafted fixtures."""

from __future__ import annotations

import datetime as dt

import pytest

from fxa_activity_metrics_spark.operators.summaries import (
    cohort_retention,
    funnel_steps,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _events(spark, rows):
    # (event_id, ts, user_id, event_type)
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _at(day: int, minute: int = 0) -> dt.datetime:
    return T0 + dt.timedelta(days=day, minutes=minute)


def test_cohort_retention_triangle(spark):
    # cohort day0: users 1,2 (user 1 returns day1+day3, user 2 never)
    # cohort day1: user 3 (returns day2)
    rows = [
        (1, _at(0), 1, "view"),
        (2, _at(0, 5), 2, "view"),
        (3, _at(1), 1, "view"),
        (4, _at(3), 1, "view"),
        (5, _at(1, 9), 3, "view"),
        (6, _at(2), 3, "view"),
        # second event same user same day must not double-count
        (7, _at(2, 30), 3, "click"),
    ]
    got = {
        (r["cohort_day"], r["day_offset"]): (
            r["n_active"],
            r["n_cohort"],
            r["rate_ppm"],
        )
        for r in cohort_retention(_events(spark, rows)).collect()
    }
    d0 = T0.date()
    d1 = d0 + dt.timedelta(days=1)
    assert got == {
        (d0, 0): (2, 2, 1000000),
        (d0, 1): (1, 2, 500000),
        (d0, 3): (1, 2, 500000),
        (d1, 0): (1, 1, 1000000),
        (d1, 1): (1, 1, 1000000),
    }


def test_cohort_retention_single_events_shuffle_no_join(spark):
    # the events relation is shuffled exactly once (user_id groupBy);
    # everything after operates on the tiny (cohort_day, offset)
    # aggregate — n_cohort comes from a window over it, never from a
    # join that would re-scan events
    df = cohort_retention(_events(spark, [(1, _at(0), 1, "view")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # uid groupBy + counts agg + cohort_day window partitioning
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Join" not in plan
    assert plan.count("FileScan") <= 1 and plan.count("Scan ExistingRDD") <= 1


def test_funnel_counts_each_prefix(spark):
    steps = ["signup", "view", "purchase"]
    rows = [
        # user 1: full chain in order
        (1, _at(0), 1, "signup"),
        (2, _at(0, 1), 1, "view"),
        (3, _at(0, 2), 1, "purchase"),
        # user 2: signup then purchase (skips view) -> stops at 1
        (4, _at(0), 2, "signup"),
        (5, _at(0, 1), 2, "purchase"),
        # user 3: view before signup does not count; reaches 2 via
        # the later view
        (6, _at(0), 3, "view"),
        (7, _at(0, 1), 3, "signup"),
        (8, _at(0, 2), 3, "view"),
        # user 4: never signs up -> unreached entirely
        (9, _at(0), 4, "view"),
        (10, _at(0, 1), 4, "purchase"),
    ]
    got = {
        r["step"]: (r["step_name"], r["n_users"])
        for r in funnel_steps(_events(spark, rows), steps).collect()
    }
    assert got == {
        1: ("signup", 3),
        2: ("view", 2),
        3: ("purchase", 1),
    }


def test_funnel_requires_strictly_later_step(spark):
    # view at the SAME timestamp as signup must not advance the chain
    rows = [
        (1, _at(0), 1, "signup"),
        (2, _at(0), 1, "view"),
        (3, _at(0), 2, "signup"),
        (4, _at(0, 1), 2, "view"),
    ]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_steps(_events(spark, rows), ["signup", "view"]).collect()
    }
    assert got == {1: 2, 2: 1}


def test_funnel_greedy_anchors_at_earliest(spark):
    # earliest-chain: anchor is the FIRST signup even though a later
    # signup would also admit the view; and the min view after the
    # anchor is taken (not the last)
    rows = [
        (1, _at(0), 1, "signup"),
        (2, _at(0, 30), 1, "signup"),
        (3, _at(0, 45), 1, "view"),
        (4, _at(0, 50), 1, "view"),
    ]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_steps(_events(spark, rows), ["signup", "view"]).collect()
    }
    assert got == {1: 1, 2: 1}


def test_funnel_empty_steps_raises(spark):
    with pytest.raises(ValueError):
        funnel_steps(_events(spark, []), [])


def test_funnel_repeated_step_name(spark):
    # a double-view funnel needs two view events strictly ordered
    rows = [
        (1, _at(0), 1, "view"),
        (2, _at(0, 1), 1, "view"),
        (3, _at(0), 2, "view"),
    ]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_steps(_events(spark, rows), ["view", "view"]).collect()
    }
    assert got == {1: 2, 2: 1}


def test_funnel_conversion_window_cuts_late_steps(spark):
    rows = [
        # user 1: view 10 min after signup -> converts
        (1, _at(0), 1, "signup"),
        (2, _at(0, 10), 1, "view"),
        # user 2: view 2 days later -> outside a 1-hour window
        (3, _at(0), 2, "signup"),
        (4, _at(2), 2, "view"),
    ]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_steps(
            _events(spark, rows), ["signup", "view"], max_step_gap_seconds=3600
        ).collect()
    }
    assert got == {1: 2, 2: 1}


def test_funnel_window_not_resurrected_by_later_anchor(spark):
    # greedy: the chain anchors at the EARLIEST signup; the view is
    # within 1h of the SECOND signup only, so the chain stalls —
    # matching the chained-min oracle exactly
    rows = [
        (1, _at(0), 1, "signup"),
        (2, _at(0, 300), 1, "signup"),
        (3, _at(0, 330), 1, "view"),
    ]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_steps(
            _events(spark, rows), ["signup", "view"], max_step_gap_seconds=3600
        ).collect()
    }
    # the unreached tail is reported zero-filled, not dropped
    assert got == {1: 1, 2: 0}


def test_funnel_window_boundary_inclusive(spark):
    rows = [
        (1, _at(0), 1, "signup"),
        (2, _at(0, 60), 1, "view"),   # exactly at the 1h boundary
        (3, _at(0), 2, "signup"),
        (4, _at(0, 61), 2, "view"),   # one minute past
    ]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_steps(
            _events(spark, rows), ["signup", "view"], max_step_gap_seconds=3600
        ).collect()
    }
    assert got == {1: 2, 2: 1}


# ---------------------------------------------------------------------------
# SCD2 history (type-2 dimension derivation + incremental maintenance)
# ---------------------------------------------------------------------------


def _scd2_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_scd2_collapses_runs_and_marks_current(spark):
    from datetime import datetime as dt

    from fxa_activity_metrics_spark.operators.summaries import scd2_history

    ev = _scd2_events(spark, [
        (1, dt(2024, 1, 1), 7, "a"),
        (2, dt(2024, 1, 2), 7, "a"),   # same attr: folds into run 1
        (3, dt(2024, 1, 3), 7, "b"),
        (4, dt(2024, 1, 4), 7, "a"),   # a again: NEW interval, not merged
        (5, dt(2024, 1, 1), 8, "x"),
    ])
    got = {tuple(r) for r in scd2_history(ev).collect()}
    assert got == {
        (7, "a", dt(2024, 1, 1), dt(2024, 1, 3), False, 1),
        (7, "b", dt(2024, 1, 3), dt(2024, 1, 4), False, 3),
        (7, "a", dt(2024, 1, 4), None, True, 4),
        (8, "x", dt(2024, 1, 1), None, True, 5),
    }


def test_scd2_tie_breaks_on_event_id(spark):
    """Two events at the SAME timestamp: the higher event_id wins the
    ordering, so the interval sequence is deterministic."""
    from datetime import datetime as dt

    from fxa_activity_metrics_spark.operators.summaries import scd2_history

    ev = _scd2_events(spark, [
        (2, dt(2024, 1, 1), 7, "b"),
        (1, dt(2024, 1, 1), 7, "a"),
    ])
    rows = sorted(scd2_history(ev).collect(), key=lambda r: r.valid_from is None)
    assert [(r.event_type, r.is_current) for r in rows] == [("a", False), ("b", True)]


def test_scd2_incremental_equals_batch(spark):
    """Folding day-drops through scd2_apply_increment reproduces the
    batch derivation bit-exactly after every prefix — including a drop
    that only EXTENDS current intervals (no attribute change) and one
    that touches a strict subset of keys."""
    from pyspark.sql import functions as F

    from fxa_activity_metrics_spark.operators.summaries import (
        scd2_apply_increment,
        scd2_history,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    days = [r[0] for r in ev.select(F.to_date("ts").alias("d")).distinct()
            .orderBy("d").collect()][:4]
    hist = None
    seen = None
    for d in days:
        drop = ev.filter(F.to_date("ts") == F.lit(d))
        seen = drop if seen is None else seen.unionByName(drop)
        hist = (scd2_history(drop) if hist is None
                else scd2_apply_increment(hist, drop))
        batch = {tuple(r) for r in scd2_history(seen).collect()}
        inc = {tuple(r) for r in hist.collect()}
        assert inc == batch, f"incremental != batch after day {d}"


def test_scd2_incremental_preserves_same_ts_opener_order(spark):
    """Two openers sharing one timestamp: the stored open_event_id
    must replay them in batch order across an increment — a constant
    sentinel tiebreak would reorder them nondeterministically."""
    from datetime import datetime as dt

    from fxa_activity_metrics_spark.operators.summaries import (
        scd2_apply_increment,
        scd2_history,
    )

    day1 = _scd2_events(spark, [
        (1, dt(2024, 1, 1), 7, "a"),
        (2, dt(2024, 1, 1), 7, "b"),   # same ts: zero-length "a" run
    ])
    day2 = _scd2_events(spark, [(3, dt(2024, 1, 2), 7, "b")])
    inc = {tuple(r) for r in
           scd2_apply_increment(scd2_history(day1), day2).collect()}
    batch = {tuple(r) for r in
             scd2_history(day1.unionByName(day2)).collect()}
    assert inc == batch
    assert (7, "a", dt(2024, 1, 1), dt(2024, 1, 1), False, 1) in inc


def test_scd2_plan_single_exchange(spark):
    """The gaps-and-islands derivation must be ONE shuffle: lag,
    filter, and lead share the key-partitioned sort — no groupBy, no
    join, no second exchange."""
    from fxa_activity_metrics_spark.operators.summaries import scd2_history

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = scd2_history(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
