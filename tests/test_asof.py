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
