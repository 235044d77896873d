"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention: a multimodal table carries
  - `blob BINARY` — the raw image/audio/video bytes,
  - `media_type STRING`, plus a typed metadata struct.

Decode / feature-extraction runs as Arrow-batched `mapInPandas`
(never row-at-a-time UDFs): each batch is a pandas DataFrame, the
codec library is invoked per batch, and partitioning is preserved so
a 100 TB corpus decodes embarrassingly parallel with zero shuffle.

Kernel status: image decode / resize are REAL for binary PPM (P6)
and audio features are REAL for RIFF PCM16 WAV — pure-numpy parsers,
no codec library needed, exercised end-to-end in tests. Compressed
formats (JPEG/PNG/mp3/ogg) require codec libraries (Pillow /
torchaudio / av) that are NOT in this container; those branches
raise `NotImplementedError`, with deterministic fake kernels used by
tests to pin the Spark plumbing (schema, batching, UDF signature,
1→N fan-out). Video frame sampling remains fully stubbed (no
container-safe format exists).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("blob_md5", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Testing helper: fabricate a binary payload column from a text
    column (`encode(text, 'utf-8')`). Real pipelines read blob columns
    straight from Parquet — BINARY is a first-class Parquet type."""
    return docs.withColumn("blob", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def blob_stats(docs: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Byte-level stats via mapInPandas — the canonical multimodal
    batch shape. Arrow moves the binary column in columnar batches;
    Python touches each batch once (vectorized), no per-row serde."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[blob_col].map(len).astype("int64"),
                    "blob_md5": pdf[blob_col].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return docs.select(id_col, blob_col).mapInPandas(compute, BLOB_STATS_SCHEMA)


def _ppm_parse(b: bytes):
    """Parse a binary PPM (P6) image: header tokens (magic, width,
    height, maxval; '#' comments allowed), then one whitespace byte,
    then h×w×3 raw samples. Pure numpy — no codec library."""
    import numpy as np

    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    i, tokens = 0, []
    while len(tokens) < 4:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        tokens.append(b[i:j])
        i = j
    i += 1  # exactly one whitespace byte after maxval
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )
    return w, h, maxval, data


def decode_image_batch(blobs: pd.Series) -> pd.DataFrame:
    """Image decode kernel. REAL for binary PPM (P6) — a pure-numpy
    parser, no codec library needed; feature = (mean R, mean G,
    mean B, mean luminance), maxval-normalized. Compressed formats
    (JPEG/PNG) need Pillow/libjpeg, absent from this container, and
    raise — swap in a `PIL.Image.open` branch in production.
    """
    import numpy as np

    rows = []
    for b in blobs:
        b = bytes(b)
        if not b.startswith(b"P6"):
            raise NotImplementedError(
                "only PPM(P6) decodes without Pillow/libjpeg; "
                f"got magic {b[:2]!r}"
            )
        w, h, maxval, data = _ppm_parse(b)
        means = data.reshape(-1, 3).mean(axis=0) / maxval
        luma = float(0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2])
        rows.append(
            {
                "width": w,
                "height": h,
                "feature": [float(means[0]), float(means[1]), float(means[2]), luma],
            }
        )
    return pd.DataFrame(rows)


def _fake_decode_image_batch(blobs: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode used by tests: derives (width,
    height, 4-dim feature) from the blob digest. Same signature and
    output shape as decode_image_batch."""
    rows = []
    for b in blobs:
        d = hashlib.md5(bytes(b)).digest()
        rows.append(
            {
                "width": 16 + d[0] % 64,
                "height": 16 + d[1] % 64,
                "feature": [float(d[i]) / 255.0 for i in range(4)],
            }
        )
    return pd.DataFrame(rows)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.FloatType()),
    ]
)


def resize_image_batch(blobs: pd.Series, width: int, height: int) -> pd.Series:
    """Resize kernel. REAL for binary PPM (P6): nearest-neighbor via
    numpy fancy indexing, re-emitted as P6 bytes. Other formats need
    Pillow and raise."""
    import numpy as np

    def resize_one(b) -> bytes:
        b = bytes(b)
        if not b.startswith(b"P6"):
            raise NotImplementedError(
                "only PPM(P6) resizes without Pillow; swap the kernel in production"
            )
        src_w, src_h, maxval, data = _ppm_parse(b)
        ys = (np.arange(height) * src_h) // height
        xs = (np.arange(width) * src_w) // width
        out = data[ys][:, xs]
        return f"P6\n{width} {height}\n{maxval}\n".encode() + out.tobytes()

    return blobs.map(resize_one)


def _fake_resize_batch(blobs: pd.Series, width: int, height: int) -> pd.Series:
    """Deterministic fake: 'resized' blob = md5(blob) || dims tag."""
    tag = f":{width}x{height}".encode()
    return blobs.map(lambda b: hashlib.md5(bytes(b)).digest() + tag)


def resize_images(
    docs: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    kernel=None,
) -> DataFrame:
    """Batch image resize over mapInPandas: blob in → resized blob
    out, partition-parallel, zero shuffle."""
    k = kernel or resize_image_batch

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "blob": k(pdf[blob_col], width, height),
                    "width": width,
                    "height": height,
                }
            )

    return docs.select(id_col, blob_col).mapInPandas(compute, RESIZED_SCHEMA)


def sample_frames_batch(blobs: pd.Series, every_ms: int) -> pd.DataFrame:
    """Video frame-sampling kernel — STUB (needs PyAV/ffmpeg)."""
    raise NotImplementedError("frame sampling requires PyAV/ffmpeg; not in this container")


def _fake_sample_frames_batch(blobs: pd.Series, every_ms: int) -> pd.DataFrame:
    """Deterministic fake: blob length picks a fake duration; one
    'frame' (digest slice) per every_ms step. Returns one row PER
    FRAME with a `_src` index back into the input batch."""
    rows = []
    for i, b in enumerate(blobs):
        b = bytes(b)
        duration_ms = 1000 + (len(b) % 5) * 1000
        for idx, ts in enumerate(range(0, duration_ms, every_ms)):
            d = hashlib.md5(b + ts.to_bytes(8, "big")).digest()
            rows.append({"_src": i, "frame_idx": idx, "frame_ts_ms": ts, "frame": d})
    return pd.DataFrame(rows, columns=["_src", "frame_idx", "frame_ts_ms", "frame"])


def sample_video_frames(
    docs: DataFrame,
    every_ms: int = 1000,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    kernel=None,
) -> DataFrame:
    """Frame sampling: one input row fans out to N frame rows — the
    mapInPandas iterator shape handles 1→N naturally (no explode of a
    giant materialized array)."""
    k = kernel or sample_frames_batch

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = k(pdf[blob_col], every_ms)
            frames.insert(0, "doc_id", pdf[id_col].values[frames["_src"].values])
            yield frames.drop(columns=["_src"]).astype(
                {"frame_idx": "int32", "frame_ts_ms": "int64"}
            )

    return docs.select(id_col, blob_col).mapInPandas(compute, FRAMES_SCHEMA)


def audio_features_batch(blobs: pd.Series) -> pd.DataFrame:
    """Audio feature kernel. REAL for RIFF/WAVE PCM16 — a pure-numpy
    chunk parser (fmt + data), yielding duration_ms / sample_rate /
    rms over normalized samples. Compressed audio (mp3/ogg/flac)
    needs torchaudio/soundfile and raises."""
    import numpy as np

    rows = []
    for b in blobs:
        b = bytes(b)
        if b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise NotImplementedError(
                "only PCM WAV decodes without torchaudio/soundfile"
            )
        i, fmt, data = 12, None, None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            size = int.from_bytes(b[i + 4 : i + 8], "little")
            body = b[i + 8 : i + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        channels = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if bits != 16:
            raise NotImplementedError("only PCM16 WAV supported")
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        n_frames = len(samples) // max(channels, 1)
        rows.append(
            {
                "duration_ms": int(n_frames * 1000 // max(rate, 1)),
                "sample_rate": rate,
                "rms": float(np.sqrt((samples * samples).mean())) if len(samples) else 0.0,
            }
        )
    return pd.DataFrame(rows)


def _fake_audio_features_batch(blobs: pd.Series) -> pd.DataFrame:
    rows = []
    for b in blobs:
        d = hashlib.md5(bytes(b)).digest()
        rows.append(
            {
                "duration_ms": 500 + int.from_bytes(d[:2], "big") % 10000,
                "sample_rate": [8000, 16000, 44100][d[2] % 3],
                "rms": float(d[3]) / 255.0,
            }
        )
    return pd.DataFrame(rows)


def audio_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    kernel=None,
) -> DataFrame:
    k = kernel or audio_features_batch

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = k(pdf[blob_col])
            feats.insert(0, "doc_id", pdf[id_col].values)
            yield feats

    return docs.select(id_col, blob_col).mapInPandas(compute, AUDIO_FEATURES_SCHEMA)


def image_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    kernel=None,
) -> DataFrame:
    """Image decode + feature extraction over mapInPandas.

    ``kernel`` is a batch function pd.Series[bytes] → pd.DataFrame
    (width, height, feature); defaults to the real (stubbed) decoder.
    Partition-parallel, shuffle-free; batch size follows
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    k = kernel or decode_image_batch

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = k(pdf[blob_col])
            feats.insert(0, "doc_id", pdf[id_col].values)
            yield feats

    return docs.select(id_col, blob_col).mapInPandas(compute, IMAGE_FEATURES_SCHEMA)
