"""Streaming IVFPQ index maintenance == batch maintenance over
everything ingested, across restarts and late-arriving days."""

from __future__ import annotations

import json
import math
import os
import time

import pytest

from fxa_activity_metrics_spark.operators.similarity import (
    ivfpq_build_index,
    ivfpq_query_index,
    ivfpq_upsert_index,
)
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.streaming.ann_stream import run_ann_index_stream

DIM = 4


def _vec(i: int) -> list[float]:
    # deterministic, well-spread unit-ish vectors
    return [
        round(math.sin(0.7 * i + j) + 0.01 * i, 6) for j in range(DIM)
    ]


_DAY1 = [(i, _vec(i)) for i in range(32)]
_DAY2 = [(i, _vec(i)) for i in range(100, 110)]
_DAY3 = [(i, _vec(i)) for i in range(200, 205)]

_BUILD_KW = dict(n_cells=2, m=2, n_codes=4)


def _write_drop(dirpath: str, name: str, rows, mtime: float) -> None:
    path = os.path.join(dirpath, name)
    with open(path, "w") as f:
        for vec_id, emb in rows:
            f.write(json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")
    os.utime(path, (mtime, mtime))


def _queries(spark):
    return spark.createDataFrame(
        [(9001, _vec(3)), (9002, _vec(105))],
        "vec_id long, embedding array<double>",
    )


def _query_rows(spark, lake):
    return sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine)
        for r in ivfpq_query_index(
            lake, _queries(spark), k=3, n_probe=2, shortlist_factor=8
        ).collect()
    )


def _batch_rows(spark, tmp_path, day_batches, tag):
    """Batch-maintained twin: build on the first day, upsert the rest
    — exactly the operations the stream performs."""
    lake = Lake(spark, str(tmp_path / f"batch_{tag}"))
    first, *rest = day_batches
    ivfpq_build_index(
        lake,
        spark.createDataFrame(first, "vec_id long, embedding array<double>"),
        **_BUILD_KW,
    )
    for rows in rest:
        ivfpq_upsert_index(
            lake,
            spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        )
    return _query_rows(spark, lake)


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    base = time.time() - 3600
    _write_drop(str(d), "embeddings-2024-07-01.json", _DAY1, base)
    _write_drop(str(d), "embeddings-2024-07-02.json", _DAY2, base + 60)
    return str(d)


def test_stream_index_matches_batch_maintenance(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_ann_index_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt"), **_BUILD_KW
    )
    q.awaitTermination(120)
    got = _query_rows(spark, lake)
    assert got == _batch_rows(spark, tmp_path, [_DAY1, _DAY2], "a")
    assert len({r[0] for r in got}) == 2  # both queries served


def test_stream_restart_is_noop_and_late_day_extends(
    spark, src_dir, tmp_path
):
    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    run_ann_index_stream(
        spark, src_dir, lake, ckpt, **_BUILD_KW
    ).awaitTermination(120)
    first = _query_rows(spark, lake)
    codes_tbl = lake.read("ivfpq_centroids").first()["codes_table"]
    n_codes_rows = lake.read(codes_tbl).count()
    # restart, no new data: index unchanged (no rewrite, same answers)
    run_ann_index_stream(
        spark, src_dir, lake, ckpt, **_BUILD_KW
    ).awaitTermination(120)
    assert _query_rows(spark, lake) == first
    assert lake.read(codes_tbl).count() == n_codes_rows
    # a late day arrives: only its delta is upserted; results equal
    # batch maintenance over all three days
    _write_drop(
        src_dir, "embeddings-2024-07-03.json", _DAY3, time.time() - 1800
    )
    run_ann_index_stream(
        spark, src_dir, lake, ckpt, **_BUILD_KW
    ).awaitTermination(120)
    assert _query_rows(spark, lake) == _batch_rows(
        spark, tmp_path, [_DAY1, _DAY2, _DAY3], "b"
    )


def test_replayed_upsert_is_idempotent_directly(spark, tmp_path):
    """The exactly-once claim reduces to: re-upserting the same delta
    rewrites identical rows. Pin it without the stream machinery."""
    lake = Lake(spark, str(tmp_path / "lake"))
    ivfpq_build_index(
        lake,
        spark.createDataFrame(_DAY1, "vec_id long, embedding array<double>"),
        **_BUILD_KW,
    )
    delta = spark.createDataFrame(
        _DAY2, "vec_id long, embedding array<double>"
    )
    ivfpq_upsert_index(lake, delta)
    codes_tbl = lake.read("ivfpq_centroids").first()["codes_table"]
    before = sorted(
        (r["id"], r["s"], r["cell"], r["code"])
        for r in lake.read(codes_tbl).collect()
    )
    ivfpq_upsert_index(lake, delta)  # replay
    after = sorted(
        (r["id"], r["s"], r["cell"], r["code"])
        for r in lake.read(codes_tbl).collect()
    )
    assert after == before


def test_unparseable_drop_name_fails_loud(spark, tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    _write_drop(str(d), "embeddings-notaday.json", _DAY1, time.time() - 60)
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_ann_index_stream(
        spark, str(d), lake, str(tmp_path / "ckpt"), **_BUILD_KW
    )
    with pytest.raises(Exception, match="YYYY-MM-DD"):
        q.awaitTermination(120)
        q.processAllAvailable()
