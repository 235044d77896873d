"""Streaming training-chunk assembly == the batch gate→chunk→split
compose over everything ingested, including across a checkpoint
restart (day-partitioned idempotent sink, join-free transform)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.streaming.assembly_stream import (
    run_training_chunks_stream,
    training_chunks_batch,
)

_GOOD = (
    "the quick brown fox jumps over a lazy dog and runs to the old river "
    "bank where the water is cold and the light is low "
) * 4
_BAD = "#### !!!! @@@@ %%%% ^^^^ &&&& **** (((( )))) ____"

_DAY1 = [(1, _GOOD), (2, _BAD)]
_DAY2 = [(11, _GOOD + " extra words of fine prose in the end"), (12, "")]


def _write_drop(dirpath: str, name: str, rows, mtime: float) -> None:
    path = os.path.join(dirpath, name)
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.utime(path, (mtime, mtime))


def _batch_rows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(map(tuple, training_chunks_batch(df).collect()))


def _table_rows(lake, table):
    return sorted(map(tuple, lake.read(table).drop("day").collect()))


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    base = time.time() - 3600
    _write_drop(str(d), "documents-2024-07-01.json", _DAY1, base)
    _write_drop(str(d), "documents-2024-07-02.json", _DAY2, base + 60)
    return str(d)


def test_stream_matches_batch_compose(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_training_chunks_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = _table_rows(lake, "training_chunks")
    want = _batch_rows(spark, _DAY1 + _DAY2)
    assert got == want
    # the bad/empty docs were gated or chunkless
    ids = {r[0] for r in got}
    assert 2 not in ids and 12 not in ids and {1, 11} <= ids


def test_stream_restart_idempotent_and_extends(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    run_training_chunks_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    first = _table_rows(lake, "training_chunks")
    # restart with no new data: nothing changes
    run_training_chunks_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    assert _table_rows(lake, "training_chunks") == first
    # a third day arrives; restart picks up only that file
    _write_drop(
        src_dir,
        "documents-2024-07-03.json",
        [(21, _GOOD + " more closing words")],
        time.time() - 1800,
    )
    run_training_chunks_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    got = _table_rows(lake, "training_chunks")
    want = _batch_rows(
        spark, _DAY1 + _DAY2 + [(21, _GOOD + " more closing words")]
    )
    assert got == want


def test_chunks_carry_split_and_score(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_training_chunks_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    df = lake.read("training_chunks")
    assert {"doc_id", "chunk_id", "chunk_text", "n_chunk_tokens", "score", "split", "day"} <= set(df.columns)
    rows = df.collect()
    assert all(r.split in ("train", "val", "test") for r in rows)
    assert all(r.score >= 0.5 for r in rows), "gate admits only >= 0.5"
    # every chunk of a doc shares the doc's split (per-doc decision)
    per_doc = df.groupBy("doc_id").agg(
        F.countDistinct("split").alias("k")
    ).collect()
    assert all(r.k == 1 for r in per_doc)
