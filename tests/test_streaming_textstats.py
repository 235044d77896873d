"""Streaming text-curation stats == batch text_stats + pii counts
over everything ingested, including across a checkpoint restart
(day-partitioned idempotent sink)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.textstats import pii_scrub, text_stats
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.streaming.textstats_stream import (
    run_text_stats_stream,
)

_DAY1 = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "reach me at a@b.com or 10.0.0.1 account 123456789"),
]
_DAY2 = [
    (11, "und der das ist nicht ein und der"),
    (12, ""),
]


def _write_drop(dirpath: str, name: str, rows, mtime: float) -> None:
    path = os.path.join(dirpath, name)
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.utime(path, (mtime, mtime))


def _batch_rows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_stats(df).join(
        pii_scrub(df).select("doc_id", "n_email", "n_ipv4", "n_long_digits"),
        "doc_id",
    )
    return sorted(map(tuple, out.collect()))


def _table_rows(lake, table):
    return sorted(
        map(tuple, lake.read(table).drop("day").collect())
    )


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    base = time.time() - 3600
    _write_drop(str(d), "documents-2024-07-01.json", _DAY1, base)
    _write_drop(str(d), "documents-2024-07-02.json", _DAY2, base + 60)
    return str(d)


def test_stream_matches_batch_stats(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_text_stats_stream(spark, src_dir, lake, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _table_rows(lake, "doc_stats") == _batch_rows(spark, _DAY1 + _DAY2)
    # day-partitioned: each drop landed in its file's day partition
    assert [str(d) for d in lake.days("doc_stats")] == ["2024-07-01", "2024-07-02"]
    # the planted PII was counted
    r = (
        lake.read("doc_stats")
        .filter(F.col("doc_id") == 2)
        .collect()[0]
    )
    assert r["n_email"] == 1 and r["n_ipv4"] == 1 and r["n_long_digits"] == 1


def test_stream_restart_is_idempotent_and_extends(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    q = run_text_stats_stream(spark, src_dir, lake, ckpt)
    q.awaitTermination(120)
    before = _table_rows(lake, "doc_stats")
    # restart with no new files: nothing changes
    q2 = run_text_stats_stream(spark, src_dir, lake, ckpt)
    q2.awaitTermination(120)
    assert _table_rows(lake, "doc_stats") == before
    # a new day extends the table to the batch result over everything
    day3 = [(21, "fresh words entirely")]
    _write_drop(src_dir, "documents-2024-07-03.json", day3, time.time())
    q3 = run_text_stats_stream(spark, src_dir, lake, ckpt)
    q3.awaitTermination(120)
    assert _table_rows(lake, "doc_stats") == _batch_rows(
        spark, _DAY1 + _DAY2 + day3
    )


def test_duplicated_doc_id_does_not_fan_out(spark, tmp_path):
    """A dirty drop repeating a doc_id must produce exactly as many
    stats rows as input rows (per-row projection, no join fan-out)."""
    d = tmp_path / "dup_drops"
    d.mkdir()
    rows = [(5, "alpha beta"), (5, "alpha beta"), (6, "gamma delta")]
    _write_drop(str(d), "documents-2024-07-01.json", rows, time.time() - 60)
    lake = Lake(spark, str(tmp_path / "dup_lake"))
    q = run_text_stats_stream(spark, str(d), lake, str(tmp_path / "dup_ckpt"))
    q.awaitTermination(120)
    assert lake.read("doc_stats").count() == 3
