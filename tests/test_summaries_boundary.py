"""J1 boundary semantics: the 7-day lookback is INCLUSIVE of exactly
7 days back (past.day >= present.day - 7, calculate_daily_summary.py:
99-101) — a device pair 7 days apart pairs up, 8 days apart does not.
Both formulations (range join and window) must agree row-for-row."""

from __future__ import annotations

import datetime as dt

import pytest

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
