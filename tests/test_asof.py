"""As-of join semantics on crafted rows: at-or-before matching
(inclusive boundary), NULL when no prior right row, per-key
isolation, and agreement of the window and join formulations."""

from __future__ import annotations

import datetime as dt

import pytest

from fxa_activity_metrics_spark.operators.asof import asof_join, asof_join_via_join

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("k1", _ts(10), "l-early"),    # before any right row → NULL
            ("k1", _ts(20), "l-exact"),    # exactly at right ts 20 → matches it
            ("k1", _ts(35), "l-mid"),      # between 20 and 40 → matches 20
            ("k1", _ts(45), "l-late"),     # after 40 → matches 40
            ("k2", _ts(100), "l-otherkey"),  # k2 has no right rows → NULL
        ],
        "k string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts(20), "r20"),
            ("k1", _ts(40), "r40"),
            ("k3", _ts(5), "r-unused"),
        ],
        "k string, rts timestamp, val string",
    )
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    got = {
        r["tag"]: r["val"]
        for r in asof_join(left, right, "k", "ts", "rts", ["rts", "val"]).collect()
    }
    assert got == {
        "l-early": None,
        "l-exact": "r20",
        "l-mid": "r20",
        "l-late": "r40",
        "l-otherkey": None,
    }


def test_formulations_agree(frames):
    left, right = frames
    a = sorted(map(str, asof_join(left, right, "k", "ts", "rts", ["rts", "val"]).collect()))
    b = sorted(
        map(str, asof_join_via_join(left, right, "k", "ts", "rts", ["rts", "val"]).collect())
    )
    assert a == b


def test_locf_fill_carries_forward_and_leading_nulls(spark):
    from pyspark.sql import functions as F
    from fxa_activity_metrics_spark.operators.asof import locf_fill

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", 10.0),
            (1, "2024-01-01 10:00:00", 12.0),  # same day: MAX wins
            (1, "2024-01-03 09:00:00", 7.0),
            (2, "2024-01-02 09:00:00", 5.0),
        ],
        "user_id long, ts string, value double",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    got = {
        (r["uid"], str(r["day"])): r for r in locf_fill(events).collect()
    }
    # grid = 2 users x 3 observed days
    assert len(got) == 6
    assert got[(1, "2024-01-01")]["filled_value"] == 12.0  # MAX of the day
    assert got[(1, "2024-01-02")]["filled_value"] == 12.0  # carried
    assert not got[(1, "2024-01-02")]["observed"]
    assert got[(1, "2024-01-03")]["filled_value"] == 7.0   # new obs wins
    assert got[(2, "2024-01-01")]["filled_value"] is None  # before first obs
    assert got[(2, "2024-01-03")]["filled_value"] == 5.0
