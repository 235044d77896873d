"""Streaming LM count maintenance (streaming/lm_stream.py): after any
prefix of day-drops the lake model must equal the one-shot batch
model over the same documents (bit-exact — integer counts, integer
micro-nat scores), replays must converge, and the stream-maintained
model must score through the same core as the in-session path."""

from __future__ import annotations

import json
import os
import time

import pytest

from fxa_activity_metrics_spark.operators.lmfilter import lm_counts, lm_score
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.streaming.lm_stream import (
    lm_score_from_lake,
    model_from_lake,
    run_lm_counts_stream,
)

_DAY1 = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat"),
    (3, "dogs bark"),
]
_DAY2 = [
    (11, "the dog sat on the rug"),
    (12, "cats and dogs"),
    (13, ""),
]
_DAY3 = [
    (21, "the cat naps"),
    (22, "the mat sat still"),
]


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


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _model_rows(uni, bg):
    return (
        sorted((r["w1"], r["c1"]) for r in uni.collect()),
        sorted((r["w1"], r["w2"], r["c12"]) for r in bg.collect()),
    )


def test_stream_model_equals_batch_model(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_lm_counts_stream(spark, src_dir, lake, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert not q.isActive

    got = _model_rows(*model_from_lake(lake))
    want = _model_rows(*lm_counts(_docs_df(spark, _DAY1 + _DAY2)))
    assert got == want

    # a third day arrives: the folded model must track it exactly
    _write_drop(src_dir, "documents-2024-07-03.json", _DAY3, time.time())
    q2 = run_lm_counts_stream(spark, src_dir, lake, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    got3 = _model_rows(*model_from_lake(lake))
    want3 = _model_rows(*lm_counts(_docs_df(spark, _DAY1 + _DAY2 + _DAY3)))
    assert got3 == want3


def test_stream_replay_is_idempotent(spark, src_dir, tmp_path):
    """Re-running over the same checkpoint replays nothing; nuking
    the checkpoint and re-ingesting everything REPLACES each day and
    converges to the same tables (no double counting)."""
    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    run_lm_counts_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    before = _model_rows(*model_from_lake(lake))
    run_lm_counts_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    assert _model_rows(*model_from_lake(lake)) == before
    run_lm_counts_stream(spark, src_dir, lake, str(tmp_path / "ckpt2")).awaitTermination(120)
    assert _model_rows(*model_from_lake(lake)) == before


def test_lake_model_scores_equal_in_session(spark, src_dir, tmp_path):
    """lm_score_from_lake over the stream-maintained model must be
    bit-identical to lm_score with model_corpus = the same documents
    (shared lm_score_with_counts core + integer arithmetic)."""
    lake = Lake(spark, str(tmp_path / "lake"))
    run_lm_counts_stream(spark, src_dir, lake, str(tmp_path / "ckpt")).awaitTermination(120)
    probe = _docs_df(spark, [(100, "the cat sat on a rug"), (101, "qq zz")])
    got = sorted(map(tuple, lm_score_from_lake(probe, lake).collect()))
    want = sorted(
        map(
            tuple,
            lm_score(probe, model_corpus=_docs_df(spark, _DAY1 + _DAY2)).collect(),
        )
    )
    assert got == want and len(got) == 2


def test_bad_filename_fails_loudly(spark, tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    _write_drop(str(d), "documents-notaday.json", _DAY1, time.time() - 60)
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_lm_counts_stream(spark, str(d), lake, str(tmp_path / "ckpt"))
    with pytest.raises(Exception, match="notaday|day"):
        q.awaitTermination(120)
        if q.exception():
            raise q.exception()


def test_rollup_preserves_scores_and_bounds_partitions(spark, src_dir, tmp_path):
    """Verdict-#8 maintenance: folding old day partitions into the
    base partition must leave every score bit-identical, cut the
    partition count to (live days + 1 base), and be idempotent."""
    import datetime as dt

    from fxa_activity_metrics_spark.streaming.lm_stream import (
        BASE_DAY,
        rollup_counts,
    )

    lake = Lake(spark, str(tmp_path / "lake"))
    _write_drop(src_dir, "documents-2024-07-03.json", _DAY3, time.time())
    run_lm_counts_stream(spark, src_dir, lake, str(tmp_path / "ckpt")).awaitTermination(120)
    probe = _docs_df(spark, [(100, "the cat sat on a rug"), (101, "qq zz")])
    before_scores = sorted(map(tuple, lm_score_from_lake(probe, lake).collect()))
    before_model = _model_rows(*model_from_lake(lake))
    assert len(lake.days("lm_unigrams")) == 3

    folded = rollup_counts(lake, keep_from=dt.date(2024, 7, 3))
    assert folded["lm_unigrams"] == [dt.date(2024, 7, 1), dt.date(2024, 7, 2)]
    # bounded layout: one live day + the base partition
    assert lake.days("lm_unigrams") == [BASE_DAY, dt.date(2024, 7, 3)]
    assert lake.days("lm_bigrams") == [BASE_DAY, dt.date(2024, 7, 3)]
    # totals and scores are bit-identical
    assert _model_rows(*model_from_lake(lake)) == before_model
    assert sorted(map(tuple, lm_score_from_lake(probe, lake).collect())) == before_scores

    # idempotent: nothing left to fold
    assert rollup_counts(lake, keep_from=dt.date(2024, 7, 3)) == {
        "lm_unigrams": [],
        "lm_bigrams": [],
    }
    assert _model_rows(*model_from_lake(lake)) == before_model

    # a LATER roll-up folds the remaining day INTO the existing base
    # (base ∪ day3 re-aggregates, not overwrites)
    folded2 = rollup_counts(lake, keep_from=dt.date(2024, 8, 1))
    assert folded2["lm_unigrams"] == [dt.date(2024, 7, 3)]
    assert lake.days("lm_unigrams") == [BASE_DAY]
    assert _model_rows(*model_from_lake(lake)) == before_model
    assert sorted(map(tuple, lm_score_from_lake(probe, lake).collect())) == before_scores
