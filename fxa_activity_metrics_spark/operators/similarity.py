"""Embedding similarity search (ANN) over array<float> columns.

Two paths, per the scale contract:

- brute_force_topk: exact cosine top-k. The query side is broadcast;
  the corpus is scanned once, partition-parallel, with the dot
  product computed JVM-side via zip_with + aggregate (sequential
  fold → bit-reproducible against the DuckDB oracle). Cost
  O(|corpus| × |queries| × dim) FLOPs but zero shuffle of the corpus;
  correct baseline and fine for small query batches.

- lsh_topk: random-hyperplane LSH. Each vector gets an n-bit bucket
  (sign of dot with n deterministic hyperplanes); top-k runs within
  matching buckets only. Shuffle is on bucket keys; recall < 1.0 —
  multi-probe (flipping each bit) trades cost for recall. The 100 TB
  path: corpus bucketing is a one-pass map, candidates per query drop
  by ~2^n.

Hyperplane components are deterministic ±1 derived from md5, so runs
are reproducible across sessions and engines with no stored model.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: F.Column) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-fold dot product: ((0+x1y1)+x2y2)+... — the exact
    evaluation order matters for cross-engine float reproducibility."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: F.Column) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, cosine) — rank 1..k by
    cosine desc, ties broken by neighbor_id asc; self-matches
    excluded. The broadcast hint keeps the corpus un-shuffled.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def hyperplanes(dim: int, n_planes: int, seed: str = "fxa-lsh") -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5(seed:plane:i) parity.
    Driver-side, tiny (n_planes × dim), embedded as literals."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            digest = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()
            row.append(1.0 if int(digest[:2], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def bucket_ids(
    df: DataFrame, vec_col: str, planes: list[list[float]], out_col: str = "bucket"
) -> DataFrame:
    """n-bit LSH bucket: bit p = (dot(vec, plane_p) > 0)."""
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(v, lit_plane) > 0, F.lit(1 << p)).otherwise(0)
    return df.withColumn(out_col, bucket.cast("long"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via hyperplane-LSH bucketing.

    Queries probe their own bucket plus (multiprobe) every
    one-bit-flip neighbor bucket. Join is equi-keyed on bucket — the
    corpus shuffles once on bucket, candidates shrink ~2^n_planes /
    (1 + n_planes) fold. Output schema matches brute_force_topk.
    """
    dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    c = bucket_ids(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
        planes,
    )
    q = bucket_ids(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
        planes,
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p)).cast("long")
                for p in range(n_planes)
            ],
        )
        q = q.select(
            "query_id", "q_vec", F.explode(probes).alias("bucket")
        )
    cand = c.join(q, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(_as_double(F.col("q_vec")), _as_double(F.col("c_vec"))).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )
