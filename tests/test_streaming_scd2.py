"""Streaming SCD2 maintenance == batch scd2_history over everything
ingested, after every day-drop prefix and across a checkpoint
restart; re-delivered days are no-ops (idempotent overwrite)."""

from __future__ import annotations

import json
import os
import time
from datetime import datetime

import pytest

from fxa_activity_metrics_spark.operators.summaries import scd2_history
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.streaming.scd2_stream import (
    SCD2_SCHEMA,
    run_scd2_stream,
)

# (event_id, ts, user_id, event_type) — user 7 changes attribute
# across days (including a same-attr day-2 event that must only
# EXTEND the current interval), user 8 appears on day 2 only.
_DAY1 = [
    (1, "2024-07-01T01:00:00", 7, "a"),
    (2, "2024-07-01T02:00:00", 7, "b"),
]
_DAY2 = [
    (3, "2024-07-02T01:00:00", 7, "b"),
    (4, "2024-07-02T02:00:00", 8, "x"),
]
_DAY3 = [
    (5, "2024-07-03T01:00:00", 7, "a"),
    (6, "2024-07-03T02:00:00", 8, "x"),
]


def _write_drop(dirpath: str, name: str, rows, mtime: float) -> None:
    path = os.path.join(dirpath, name)
    with open(path, "w") as f:
        for eid, ts, uid, etype in rows:
            f.write(
                json.dumps(
                    {"event_id": eid, "ts": ts, "user_id": uid, "event_type": etype}
                )
                + "\n"
            )
    os.utime(path, (mtime, mtime))


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(e, datetime.fromisoformat(t), u, a) for e, t, u, a in rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def _table_rows(lake):
    return sorted(
        map(tuple, lake.read("scd2_history", SCD2_SCHEMA).collect()),
        key=str,
    )


def _batch_rows(spark, rows):
    return sorted(map(tuple, scd2_history(_events_df(spark, rows)).collect()), key=str)


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    base = time.time() - 3600
    _write_drop(str(d), "events-2024-07-01.json", _DAY1, base)
    _write_drop(str(d), "events-2024-07-02.json", _DAY2, base + 60)
    return str(d)


def test_scd2_stream_matches_batch(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_scd2_stream(spark, src_dir, lake, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = _table_rows(lake)
    assert got == _batch_rows(spark, _DAY1 + _DAY2)
    # the day-2 same-attr event EXTENDED user 7's (b) interval rather
    # than opening a new one: exactly 2 intervals for user 7
    assert sum(1 for r in got if r[0] == 7) == 2


def test_scd2_stream_restart_continues(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    q = run_scd2_stream(spark, src_dir, lake, ckpt)
    q.awaitTermination(120)
    _write_drop(src_dir, "events-2024-07-03.json", _DAY3, time.time())
    q2 = run_scd2_stream(spark, src_dir, lake, ckpt)
    q2.awaitTermination(120)
    assert _table_rows(lake) == _batch_rows(spark, _DAY1 + _DAY2 + _DAY3)


def test_scd2_redelivered_day_is_noop(spark, src_dir, tmp_path):
    """Replaying an already-folded day through a FRESH checkpoint
    (forced re-delivery) leaves the table unchanged — the overwrite
    is idempotent, so checkpoint-recovery replays are safe."""
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_scd2_stream(spark, src_dir, lake, str(tmp_path / "ckpt1"))
    q.awaitTermination(120)
    before = _table_rows(lake)
    q2 = run_scd2_stream(spark, src_dir, lake, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert _table_rows(lake) == before
