"""Streaming end-to-end curation (streaming/curation_stream.py):
after any prefix of day-drops, manifest_from_lake must bit-equal the
batch training_manifest composition (quality gate → exact-dedup
keepers → block packing) over the same documents — including when a
LATER day introduces a smaller-id duplicate that steals keepership —
and replays / restarts must converge."""

from __future__ import annotations

import datetime as dt
import json
import os
import time

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators import dedup, textstats
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.streaming.curation_stream import (
    manifest_from_lake,
    run_curation_stream,
)

# Quality-passing docs need length/stopword/variety balance; the
# "junk" rows must fail the 0.5 gate. Doc 50 (day 1) and doc 2
# (day 3) share EXACT text — once day 3 arrives, keepership moves
# from 50 to 2 and the packing must re-derive around it.
_SHARED = "the quick brown fox jumps over the lazy dog and rests by the river"
_DAY1 = [
    (50, _SHARED),
    (51, "a calm morning walk through the old town square with fresh bread"),
    (52, "!!!! #### $$$$"),  # junk: punctuation-only, fails the gate
]
_DAY2 = [
    (60, "she reads a long novel about the sea and its many quiet storms"),
    (61, "xxxx"),  # junk: too short / no stopwords
]
_DAY3 = [
    (2, _SHARED),  # smaller-id exact duplicate of doc 50
    (70, "the market opens early and the vendors call out their daily wares"),
]

CAPACITY, BLOCK = 24, 4


def _write_drop(dirpath: str, name: str, rows, mtime: float) -> None:
    path = os.path.join(dirpath, name)
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    base = time.time() - 3600
    _write_drop(str(d), "documents-2024-07-01.json", _DAY1, base)
    _write_drop(str(d), "documents-2024-07-02.json", _DAY2, base + 60)
    return str(d)


def _batch_manifest(spark, rows):
    """The batch training_manifest composition (q_training_manifest's
    exact recipe) over an explicit row set — the oracle."""
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    passing = (
        textstats.text_stats(docs)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id")
    )
    kept0 = docs.join(passing, "doc_id")
    keepers = dedup.exact_duplicates(kept0).select(
        F.col("keeper_id").alias("doc_id")
    )
    kept = kept0.join(keepers, "doc_id")
    return textstats.pack_sequences(kept, capacity=CAPACITY, block_size=BLOCK)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_manifest_equals_batch_and_rekeeps_on_late_duplicate(
    spark, src_dir, tmp_path
):
    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    run_curation_stream(spark, src_dir, lake, ckpt).awaitTermination(120)

    got = _rows(manifest_from_lake(lake, capacity=CAPACITY, block_size=BLOCK))
    want = _rows(_batch_manifest(spark, _DAY1 + _DAY2))
    assert got == want and len(got) > 0
    # the junk docs must have been gated out
    ids = {r[0] for r in got}
    assert 52 not in ids and 61 not in ids and 50 in ids

    # day 3 arrives with a smaller-id exact duplicate: keepership
    # must move from 50 to 2 in the derived manifest
    _write_drop(src_dir, "documents-2024-07-03.json", _DAY3, time.time())
    run_curation_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    got3 = _rows(manifest_from_lake(lake, capacity=CAPACITY, block_size=BLOCK))
    want3 = _rows(_batch_manifest(spark, _DAY1 + _DAY2 + _DAY3))
    assert got3 == want3
    ids3 = {r[0] for r in got3}
    assert 2 in ids3 and 50 not in ids3, "late smaller-id duplicate must take keepership"


def test_stream_restart_and_replay_converge(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    run_curation_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    before = _rows(manifest_from_lake(lake, capacity=CAPACITY, block_size=BLOCK))

    # restart over the same checkpoint: nothing replays, state intact
    run_curation_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    assert _rows(manifest_from_lake(lake, capacity=CAPACITY, block_size=BLOCK)) == before

    # cold replay (fresh checkpoint): every day re-ingests through the
    # replace-the-day sink and the manifest converges, not duplicates
    run_curation_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt2")
    ).awaitTermination(120)
    assert _rows(manifest_from_lake(lake, capacity=CAPACITY, block_size=BLOCK)) == before
    assert lake.days("curated_docs") == [dt.date(2024, 7, 1), dt.date(2024, 7, 2)]
