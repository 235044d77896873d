"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention: a multimodal table carries
  - `blob BINARY` — the raw image/audio/video bytes,
  - `media_type STRING`, plus a typed metadata struct.

Decode / feature-extraction runs as Arrow-batched `mapInPandas`
(never row-at-a-time UDFs): each batch is a pandas DataFrame, the
codec library is invoked per batch, and partitioning is preserved so
a 100 TB corpus decodes embarrassingly parallel with zero shuffle.

The actual codec libraries (Pillow / torchaudio / av) are NOT in this
container — the decode kernels are stubbed behind
`NotImplementedError` with a deterministic fake used by tests (SPARK
plumbing — schema, batching, UDF signature — is real and tested).
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


def decode_image_batch(blobs: pd.Series) -> pd.DataFrame:
    """Decode kernel — requires an image codec library.

    STUB: Pillow is not available in this environment. The Spark-side
    plumbing (image_features below) is real; swap this kernel for a
    `PIL.Image.open` implementation in production.
    """
    raise NotImplementedError(
        "image decode requires Pillow/libjpeg; not present in this container"
    )


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
