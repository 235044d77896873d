"""Streaming exact dedup == batch exact_duplicates over everything
ingested, including across a checkpoint restart."""

from __future__ import annotations

import json
import os
import time

import pytest

from fxa_activity_metrics_spark.operators.dedup import exact_duplicates
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.streaming.dedup_stream import run_exact_dedup_stream

_DAY1 = [
    (1, "alpha beta gamma"),
    (2, "delta epsilon zeta"),
    (3, "alpha beta gamma"),
]
_DAY2 = [
    (11, "alpha beta gamma"),
    (12, "eta theta iota"),
    (13, "delta epsilon zeta"),
]


def _write_drop(dirpath: str, name: str, rows, mtime: float) -> None:
    path = os.path.join(dirpath, name)
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.utime(path, (mtime, mtime))


def _table_rows(lake, table):
    return sorted(
        (r["content_hash"], r["keeper_id"], r["n_copies"])
        for r in lake.read(table).collect()
    )


def _batch_rows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(
        (r["content_hash"], r["keeper_id"], r["n_copies"])
        for r in exact_duplicates(df).collect()
    )


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    base = time.time() - 3600
    _write_drop(str(d), "documents-2024-07-01.json", _DAY1, base)
    _write_drop(str(d), "documents-2024-07-02.json", _DAY2, base + 60)
    return str(d)


def test_stream_matches_batch_dedup(spark, src_dir, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_exact_dedup_stream(spark, src_dir, lake, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _table_rows(lake, "dedup_keepers") == _batch_rows(spark, _DAY1 + _DAY2)


def test_stream_restart_continues_from_checkpoint(spark, src_dir, tmp_path):
    """New files after a restart update the same state: counts keep
    accumulating, keepers stay the global min."""
    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    q = run_exact_dedup_stream(spark, src_dir, lake, ckpt)
    q.awaitTermination(120)
    day3 = [(21, "alpha beta gamma"), (0, "eta theta iota")]
    _write_drop(src_dir, "documents-2024-07-03.json", day3, time.time())
    q2 = run_exact_dedup_stream(spark, src_dir, lake, ckpt)
    q2.awaitTermination(120)
    assert _table_rows(lake, "dedup_keepers") == _batch_rows(
        spark, _DAY1 + _DAY2 + day3
    )


def test_badly_named_file_fails_fast(spark, tmp_path):
    """A drop whose name has no parseable day must kill the query, not
    silently land its rows in the default partition outside every
    read_days window."""
    from pyspark.errors import StreamingQueryException

    from fxa_activity_metrics_spark.streaming.dedup_stream import (
        run_signature_import_stream,
    )

    d = tmp_path / "drops"
    d.mkdir()
    _write_drop(str(d), "documents-notaday.json", _DAY1, time.time() - 60)
    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_signature_import_stream(
        spark, str(d), lake, str(tmp_path / "ckpt"), shingle_n=2
    )
    with pytest.raises(StreamingQueryException, match="cannot parse a day"):
        q.awaitTermination(120)


def test_signature_stream_feeds_incremental_candidates(spark, src_dir, tmp_path):
    """The streaming signature import writes the SAME table the batch
    plan maintains: signatures are byte-identical to the batch build,
    and incremental_candidates works on it unchanged."""
    import datetime as dt

    from fxa_activity_metrics_spark.plans.dedup_incremental import (
        append_signatures,
        incremental_candidates,
    )
    from fxa_activity_metrics_spark.streaming.dedup_stream import (
        run_signature_import_stream,
    )

    lake = Lake(spark, str(tmp_path / "lake"))
    q = run_signature_import_stream(
        spark, src_dir, lake, str(tmp_path / "ckpt"), shingle_n=2
    )
    q.awaitTermination(120)

    batch_lake = Lake(spark, str(tmp_path / "batch_lake"))
    for day, rows in [
        (dt.date(2024, 7, 1), _DAY1),
        (dt.date(2024, 7, 2), _DAY2),
    ]:
        append_signatures(
            batch_lake,
            spark.createDataFrame(rows, "doc_id long, text string"),
            day,
            shingle_n=2,
        )

    def rows(lk):
        return sorted(
            (r["id"], tuple(r["sig"]), str(r["day"]))
            for r in lk.read("dedup_signatures").collect()
        )

    assert rows(lake) == rows(batch_lake)
    got = {
        (r["id_a"], r["id_b"])
        for r in incremental_candidates(lake, dt.date(2024, 7, 2)).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in incremental_candidates(batch_lake, dt.date(2024, 7, 2)).collect()
    }
    assert got == want and got, "cross-day candidates must match and be non-empty"


def test_end_to_end_incremental_dedup_stream(spark, src_dir, tmp_path):
    """Signature + candidate tables maintained by the stream: after
    all files, the candidates table equals the one-shot LSH candidate
    set over everything ingested; a new file appends its day's pairs."""
    import datetime as dt

    from fxa_activity_metrics_spark.operators.dedup import minhash_lsh_candidates
    from fxa_activity_metrics_spark.streaming.dedup_stream import (
        run_incremental_dedup_stream,
    )

    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    q = run_incremental_dedup_stream(spark, src_dir, lake, ckpt, shingle_n=2)
    q.awaitTermination(120)

    def cand_pairs():
        return {
            (r["id_a"], r["id_b"])
            for r in lake.read("dedup_candidates").collect()
        }

    def oneshot(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(df, shingle_n=2).collect()
        }

    assert cand_pairs() == oneshot(_DAY1 + _DAY2)
    day3 = [(21, "alpha beta gamma"), (22, "kappa lambda mu")]
    _write_drop(src_dir, "documents-2024-07-03.json", day3, time.time())
    q2 = run_incremental_dedup_stream(spark, src_dir, lake, ckpt, shingle_n=2)
    q2.awaitTermination(120)
    assert cand_pairs() == oneshot(_DAY1 + _DAY2 + day3)
