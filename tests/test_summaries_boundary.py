"""J1 boundary semantics: the 7-day lookback is INCLUSIVE of exactly
7 days back (past.day >= present.day - 7, calculate_daily_summary.py:
99-101) — a device pair 7 days apart pairs up, 8 days apart does not.
Both formulations (range join and window) must agree row-for-row."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.summaries import (
    multi_device_users_grouped,
    multi_device_users_join,
    multi_device_users_window,
)

D0 = dt.date(2024, 6, 1)


@pytest.fixture(scope="module")
def dapd(spark):
    rows = [
        # uid 'u7': devices exactly 7 days apart → must pair
        (D0, "u7", "a"),
        (D0 + dt.timedelta(days=7), "u7", "b"),
        # uid 'u8': devices 8 days apart → must NOT pair
        (D0, "u8", "a"),
        (D0 + dt.timedelta(days=8), "u8", "b"),
        # uid 'u0': two devices same day → pairs both directions
        (D0, "u0", "a"),
        (D0, "u0", "b"),
        # uid 'u1': single device on two days → never pairs (device !=)
        (D0, "u1", "a"),
        (D0 + dt.timedelta(days=3), "u1", "a"),
    ]
    return spark.createDataFrame(rows, "day date, uid string, device_id string")


def _rows(df):
    return sorted(
        (str(r["day"]), r["uid"], r["device_now"], r["device_prev"]) for r in df.collect()
    )


def test_seven_day_boundary_join(dapd):
    got = _rows(multi_device_users_join(dapd, 7))
    assert got == [
        (str(D0), "u0", "a", "b"),
        (str(D0), "u0", "b", "a"),
        (str(D0 + dt.timedelta(days=7)), "u7", "b", "a"),
    ]


def test_window_form_agrees(dapd):
    assert _rows(multi_device_users_window(dapd, 7)) == _rows(
        multi_device_users_join(dapd, 7)
    )


def test_grouped_form_agrees(dapd):
    assert _rows(multi_device_users_grouped(dapd, 7)) == _rows(
        multi_device_users_join(dapd, 7)
    )


def test_rolling_actives_window_and_observed_days_only(spark):
    from fxa_activity_metrics_spark.operators.summaries import rolling_actives

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (2, "2024-01-05 10:00:00"),
            (2, "2024-01-05 11:00:00"),  # same user+day: distinct'd
        ],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    got = {str(r["day"]): r for r in rolling_actives(events, 7).collect()}
    # only days WITH events appear (the trailing window is a read on
    # observed days, not a calendar densification)
    assert sorted(got) == ["2024-01-01", "2024-01-05"]
    assert got["2024-01-01"]["dau"] == 1 and got["2024-01-01"]["wau"] == 1
    # day 5: user 1 (active day 1) still inside the trailing 7 days
    assert got["2024-01-05"]["dau"] == 1 and got["2024-01-05"]["wau"] == 2
    assert got["2024-01-05"]["stickiness_micro"] == 500_000


def test_rolling_actives_window_expiry(spark):
    from fxa_activity_metrics_spark.operators.summaries import rolling_actives

    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-08 00:00:00")],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    got = {str(r["day"]): r for r in rolling_actives(events, 7).collect()}
    # day 8 is the first day user 1's activity no longer supports
    assert got["2024-01-08"]["wau"] == 1


def test_daily_spikes_gate_and_first_day(spark):
    from fxa_activity_metrics_spark.operators.summaries import daily_spikes

    rows = []
    # days 1-7: 10 events each; day 8: 25 events (spike); day 9: 10
    for d in range(1, 8):
        rows += [(i, f"2024-01-0{d} 00:00:0{i % 10}") for i in range(10)]
    rows += [(i, "2024-01-08 00:00:00") for i in range(25)]
    rows += [(i, "2024-01-09 00:00:00") for i in range(10)]
    events = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    # NOTE: counts are EVENTS (not distinct users): 10/day then 25
    got = {str(r["day"]): r for r in daily_spikes(events, 7, 150).collect()}
    first = got["2024-01-01"]
    assert first["trail_days"] == 0 and not first["spike"]
    assert got["2024-01-08"]["spike"]  # 25 > 1.5 x 10
    assert got["2024-01-08"]["trail_sum"] == 70
    assert not got["2024-01-02"]["spike"]  # equal volume
    # day 9's trailing window now contains the spike day
    assert got["2024-01-09"]["trail_sum"] == 10 * 6 + 25
    assert not got["2024-01-09"]["spike"]
