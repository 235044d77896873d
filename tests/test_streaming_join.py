"""Stream-stream time-range join == the batch correlate() join over
the same drops, including across a checkpoint restart."""

from __future__ import annotations

import datetime as dt
import json
import os
import time

import pytest

from fxa_activity_metrics_spark.streaming.join_stream import (
    correlate,
    run_correlation_stream,
)

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _ts(s):
    return (T0 + dt.timedelta(seconds=s)).isoformat(sep=" ")


A_ROWS = [
    {"a_id": 1, "user_id": 7, "a_ts": _ts(0)},
    {"a_id": 2, "user_id": 7, "a_ts": _ts(1200)},
    {"a_id": 3, "user_id": 9, "a_ts": _ts(100)},
]
B_ROWS = [
    {"b_id": 10, "user_id": 7, "b_ts": _ts(300)},    # matches a_id 1
    {"b_id": 11, "user_id": 7, "b_ts": _ts(1500)},   # matches a_id 2
    {"b_id": 12, "user_id": 7, "b_ts": _ts(5000)},   # no a within window
    {"b_id": 13, "user_id": 9, "b_ts": _ts(650)},    # matches a_id 3
    {"b_id": 14, "user_id": 8, "b_ts": _ts(100)},    # no such user in a
]


def _write(dirpath, name, rows, mtime):
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (mtime, mtime))


@pytest.fixture()
def dirs(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    base = time.time() - 3600
    _write(str(a), "a-0.json", A_ROWS, base)
    _write(str(b), "b-0.json", B_ROWS, base + 30)
    return str(a), str(b)


def _batch_pairs(spark):
    a = spark.createDataFrame(
        [(r["a_id"], r["user_id"], dt.datetime.fromisoformat(r["a_ts"])) for r in A_ROWS],
        "a_id long, user_id long, a_ts timestamp",
    )
    b = spark.createDataFrame(
        [(r["b_id"], r["user_id"], dt.datetime.fromisoformat(r["b_ts"])) for r in B_ROWS],
        "b_id long, user_id long, b_ts timestamp",
    )
    return sorted(
        (r.user_id, r.a_id, r.b_id) for r in correlate(a, b).collect()
    )


def _sink_pairs(spark, out_dir):
    return sorted(
        (r.user_id, r.a_id, r.b_id)
        for r in spark.read.parquet(out_dir).collect()
    )


def test_stream_join_matches_batch(spark, dirs, tmp_path):
    a_dir, b_dir = dirs
    out = str(tmp_path / "out")
    q = run_correlation_stream(
        spark, a_dir, b_dir, out, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = _sink_pairs(spark, out)
    want = _batch_pairs(spark)
    assert got == want
    assert got == [(7, 1, 10), (7, 2, 11), (9, 3, 13)]


def test_stream_join_restart_picks_up_new_matches(spark, dirs, tmp_path):
    a_dir, b_dir = dirs
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_correlation_stream(spark, a_dir, b_dir, out, ckpt).awaitTermination(120)
    first = _sink_pairs(spark, out)
    # a new b-drop arrives matching the previously unmatched a window
    _write(
        b_dir,
        "b-1.json",
        [{"b_id": 20, "user_id": 7, "b_ts": _ts(1300)}],  # matches a_id 2
        time.time() - 1800,
    )
    run_correlation_stream(spark, a_dir, b_dir, out, ckpt).awaitTermination(120)
    got = _sink_pairs(spark, out)
    assert sorted(first + [(7, 2, 20)]) == got
