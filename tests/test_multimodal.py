"""Multimodal plumbing tests: the Arrow/mapInPandas batch shapes are
real even though the codec kernels are stubbed — schemas, 1→1 and
1→N fan-out, determinism, shuffle-freedom, and the stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators import multimodal as mm
from fxa_activity_metrics_spark.sources.testdata import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def blobs(spark):
    docs = read_table(spark, SF, "documents").limit(50)
    return mm.attach_blob(docs).cache()


def test_stubs_raise_cleanly(blobs):
    with pytest.raises(Exception, match="Pillow|PyAV|torchaudio"):
        mm.image_features(blobs).collect()


def test_image_features_fake_kernel(blobs):
    out = mm.image_features(blobs, kernel=mm._fake_decode_image_batch)
    rows = out.collect()
    assert len(rows) == 50
    assert out.schema == mm.IMAGE_FEATURES_SCHEMA
    r = rows[0]
    assert 16 <= r["width"] < 80 and len(r["feature"]) == 4
    # deterministic: same input → same features
    again = mm.image_features(blobs, kernel=mm._fake_decode_image_batch).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_resize_fake_kernel(blobs):
    out = mm.resize_images(blobs, 64, 48, kernel=mm._fake_resize_batch)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["width"] == 64 and r["height"] == 48 for r in rows)
    assert all(bytes(r["blob"]).endswith(b":64x48") for r in rows)


def test_frame_sampling_fan_out(blobs):
    out = mm.sample_video_frames(blobs, every_ms=500, kernel=mm._fake_sample_frames_batch)
    per_doc = out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(per_doc) == 50
    assert all(r["n"] >= 2 for r in per_doc), "each doc fans out to multiple frames"
    ts = out.filter(F.col("frame_idx") == 1).select("frame_ts_ms").distinct().collect()
    assert ts == [((500,))], "frame timestamps follow the sampling cadence"


def test_audio_features_fake_kernel(blobs):
    rows = mm.audio_features(blobs, kernel=mm._fake_audio_features_batch).collect()
    assert len(rows) == 50
    assert all(r["sample_rate"] in (8000, 16000, 44100) for r in rows)
    assert all(0.0 <= r["rms"] <= 1.0 for r in rows)


def test_mapinpandas_is_shuffle_free(blobs):
    plan = (
        mm.blob_stats(blobs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, "multimodal maps must not shuffle"
