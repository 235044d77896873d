"""Streaming sketch maintenance (streaming/sketch_stream.py): after
any prefix of day-drops the lake-folded CMS must be BIT-IDENTICAL to
a one-shot cms_build over the same documents (additive merge), the
lake-folded Misra-Gries top-k must EXACTLY equal the batch grouped-MG
answer with day as the group key (mergeable reduce, not just
within-bound), and replays must converge."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.dedup import tokens
from fxa_activity_metrics_spark.operators.rollup import (
    cms_build,
    heavy_hitters_exact,
    misra_gries_grouped,
)
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.streaming.sketch_stream import (
    CMS_D,
    CMS_W,
    MG_CHUNK,
    MG_K,
    cms_from_lake,
    heavy_hitters_from_lake,
    run_token_sketch_stream,
)

_DAY1 = [
    (1, "spark shuffles the join keys " * 8),
    (2, "the scan prunes partitions and the join broadcasts"),
    (3, "rows rows rows columns"),
]
_DAY2 = [
    (11, "the join keys hash to the same shuffle partition " * 6),
    (12, "broadcast the small side of the join"),
    (13, ""),
]
_DAY3 = [
    (21, "sketches merge losslessly across days"),
    (22, "the join wins again " * 10),
]

_DAYS = {
    "2024-07-01": _DAY1,
    "2024-07-02": _DAY2,
    "2024-07-03": _DAY3,
}


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


def _docs_with_day(spark, days: dict):
    rows = []
    for day, docs in days.items():
        for doc_id, text in docs:
            rows.append((doc_id, text, day))
    return spark.createDataFrame(
        rows, "doc_id long, text string, d string"
    ).withColumn("day", F.col("d").cast("date"))


def _batch_cms(spark, days: dict):
    docs = _docs_with_day(spark, days)
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    return cms_build(toks, "tok", d=CMS_D, w=CMS_W)


def _batch_mg(spark, days: dict):
    docs = _docs_with_day(spark, days)
    toks = docs.select(
        "day", "doc_id", F.posexplode(tokens("text")).alias("pos", "item")
    )
    return misra_gries_grouped(
        toks, "day", ("doc_id", "pos"), "item", k=MG_K, chunk=MG_CHUNK
    )


def _cms_rows(df):
    return sorted((r["j"], r["bucket"], r["weight"]) for r in df.collect())


def _mg_rows(df):
    return sorted((r["item"], r["est"]) for r in df.collect())


def test_stream_sketches_equal_batch(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_token_sketch_stream(spark, src_dir, lake, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert not q.isActive

    two = {k: _DAYS[k] for k in ("2024-07-01", "2024-07-02")}
    assert _cms_rows(cms_from_lake(lake)) == _cms_rows(_batch_cms(spark, two))
    assert _mg_rows(heavy_hitters_from_lake(lake)) == _mg_rows(
        _batch_mg(spark, two)
    )

    # a third day arrives: both folds must track it exactly
    _write_drop(src_dir, "documents-2024-07-03.json", _DAY3, time.time())
    q2 = run_token_sketch_stream(spark, src_dir, lake, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert _cms_rows(cms_from_lake(lake)) == _cms_rows(_batch_cms(spark, _DAYS))
    assert _mg_rows(heavy_hitters_from_lake(lake)) == _mg_rows(
        _batch_mg(spark, _DAYS)
    )


def test_stream_replay_converges(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    run_token_sketch_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    cms_before = _cms_rows(cms_from_lake(lake))
    mg_before = _mg_rows(heavy_hitters_from_lake(lake))
    # same checkpoint: nothing replays
    run_token_sketch_stream(spark, src_dir, lake, ckpt).awaitTermination(120)
    assert _cms_rows(cms_from_lake(lake)) == cms_before
    # fresh checkpoint: every day re-ingests, the day sink REPLACES
    # each partition — no double counting
    run_token_sketch_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt2")
    ).awaitTermination(120)
    assert _cms_rows(cms_from_lake(lake)) == cms_before
    assert _mg_rows(heavy_hitters_from_lake(lake)) == mg_before


def test_streamed_topk_respects_mg_bounds(spark, src_dir, tmp_path):
    """The streamed fold is still an MG summary of the full token
    stream: est <= true, undercount <= n/(k+1), phi-frequent items
    survive."""
    lake = Lake(spark, str(tmp_path / "lake"))
    run_token_sketch_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    two = {k: _DAYS[k] for k in ("2024-07-01", "2024-07-02")}
    items = _docs_with_day(spark, two).select(
        F.explode(tokens("text")).alias("item")
    )
    exact = {
        r["item"]: r["n"]
        for r in items.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    mg = dict(_mg_rows(heavy_hitters_from_lake(lake)))
    assert 0 < len(mg) <= MG_K
    for item, est in mg.items():
        assert est <= exact[item]
        assert exact[item] - est <= n_total // (MG_K + 1)
    hh = {r["item"] for r in heavy_hitters_exact(items, "item", k=MG_K).collect()}
    assert hh and hh <= set(mg)


# --- streaming KMV vocabulary sketches -----------------------------------


def _batch_vocab_kmv(spark, days: dict):
    """One-shot KMV over every ingested token: the merged stream
    fold's exactness baseline."""
    docs = _docs_with_day(spark, days)
    return (
        docs.select(F.explode(tokens("text")).alias("item"))
        .select(F.md5("item").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(64)
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
        .first()["hs"]
    )


def test_stream_kmv_fold_equals_oneshot(spark, src_dir, tmp_path):
    from fxa_activity_metrics_spark.streaming.sketch_stream import (
        KMV_DAY_SCHEMA,
        run_vocab_kmv_stream,
        vocab_uniques_from_lake,
    )
    from fxa_activity_metrics_spark.operators.rollup import kmv_merge

    lake = Lake(spark, str(tmp_path / "lake"))
    run_vocab_kmv_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    two = {k: _DAYS[k] for k in ("2024-07-01", "2024-07-02")}
    merged = kmv_merge(lake.read("vocab_kmv", KMV_DAY_SCHEMA), k=64).first()
    assert merged["hs"] == _batch_vocab_kmv(spark, two)
    # estimate surfaces through the lake reader, sub-k -> exact count
    est = vocab_uniques_from_lake(lake).first()
    n_vocab = len(
        set(
            t
            for _, rows in two.items()
            for _, text in rows
            for t in text.split()
            if t
        )
    )
    if n_vocab < 64:
        assert est["est_uniques"] == float(n_vocab)

    # third day arrives; the fold must track exactly
    _write_drop(src_dir, "documents-2024-07-03.json", _DAY3, time.time())
    run_vocab_kmv_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    merged = kmv_merge(lake.read("vocab_kmv", KMV_DAY_SCHEMA), k=64).first()
    assert merged["hs"] == _batch_vocab_kmv(spark, _DAYS)


def test_stream_kmv_replay_converges(spark, src_dir, tmp_path):
    from fxa_activity_metrics_spark.streaming.sketch_stream import (
        KMV_DAY_SCHEMA,
        run_vocab_kmv_stream,
    )
    from fxa_activity_metrics_spark.operators.rollup import kmv_merge

    lake = Lake(spark, str(tmp_path / "lake"))
    run_vocab_kmv_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    before = kmv_merge(lake.read("vocab_kmv", KMV_DAY_SCHEMA), k=64).first()["hs"]
    # fresh checkpoint: full re-ingestion replaces each day's row
    run_vocab_kmv_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt2")
    ).awaitTermination(120)
    after = kmv_merge(lake.read("vocab_kmv", KMV_DAY_SCHEMA), k=64).first()["hs"]
    assert after == before


def test_stream_vocab_overlap_equals_batch(spark, src_dir, tmp_path):
    """Consecutive-day overlap read from the STREAM-MAINTAINED sketch
    table must equal kmv_day_overlap over a one-shot batch build of
    the same days (the maintained sketches are pinned bit-exact, so
    the derived set-operation estimates must be too)."""
    from fxa_activity_metrics_spark.operators.rollup import kmv_day_overlap
    from fxa_activity_metrics_spark.streaming.sketch_stream import (
        day_vocab_kmv,
        run_vocab_kmv_stream,
        vocab_overlap_from_lake,
    )

    lake = Lake(spark, str(tmp_path / "lake"))
    run_vocab_kmv_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    via_stream = sorted(
        map(tuple, vocab_overlap_from_lake(lake).collect())
    )
    rows = [
        (day, doc_id, text)
        for day, drops in _DAYS.items()
        for doc_id, text in drops
        if day in ("2024-07-01", "2024-07-02")
    ]
    batch_docs = spark.createDataFrame(
        rows, "day string, doc_id long, text string"
    ).withColumn("day", F.col("day").cast("date"))
    via_batch = sorted(
        map(tuple, kmv_day_overlap(day_vocab_kmv(batch_docs)).collect())
    )
    assert via_stream == via_batch
    assert len(via_stream) >= 1  # 07-01 -> 07-02 pair exists
