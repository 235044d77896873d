"""Deduplication operators for large-scale text corpora.

Beyond the reference's surface (SURVEY §2 lists no dedup beyond
SELECT DISTINCT / dropDuplicates) — these are the training-data
pipeline operators, designed for 100 TB:

- exact_duplicates: hash-groupBy on a content digest. One shuffle on
  the digest; the digest (md5) is computed JVM-side.
- minhash_lsh_candidates: shingle → minhash → band → bucket-join.
  Candidate generation is groupBy-band (shuffle on band keys), never
  an all-pairs product; cost is O(docs × bands) rows.
- jaccard_pairs: verify candidate pairs with exact n-gram Jaccard.
- simhash: 32-bit signature via sign-sum of token-hash bits.

Everything is built-in Spark SQL expressions (transform/aggregate/
filter over arrays) — no Python UDFs — so the whole path stays inside
whole-stage codegen and Arrow never enters the picture.

Determinism contract: hashes are md5-of-UTF8 (identical in DuckDB),
so every operator here has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens(text_col: str | F.Column = "text") -> F.Column:
    """Whitespace tokens, empties dropped. Matches the DuckDB oracle's
    list_filter(string_split(text, ' '), t -> t <> '')."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, " "), lambda t: t != "")


def shingles(text_col: str | F.Column = "text", n: int = 3) -> F.Column:
    """Word n-gram shingles as strings ("w1 w2 w3"). Built from the
    token array with transform over an index sequence — JVM-side.
    Docs with fewer than n tokens get an empty shingle set (guarded:
    Spark's sequence(a, b) runs DESCENDING when b < a)."""
    toks = tokens(text_col)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content digest; the lowest id is the
    keeper. Returns (content_hash, keeper_id, n_copies)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signature(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 1,
) -> DataFrame:
    """MinHash signatures: sig[i] = min over shingles of
    md5('{i}:' || shingle). String-min over hex digests is a valid
    uniform min-hash family and is reproducible in any engine with
    md5. Output: (id, sig array<string> of length num_hashes)."""
    sh = shingles(text_col, shingle_n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda t: F.md5(F.concat(i.cast("string"), F.lit(":"), t)))
        ),
    )
    # docs with an empty shingle set have null minhashes — excluded
    # (the SQL analogue drops them via NULL-key join semantics)
    return docs.select(F.col(id_col).alias("id"), sig.alias("sig")).filter(
        F.col("sig").getItem(0).isNotNull()
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 1,
) -> DataFrame:
    """LSH candidate pairs: split the signature into bands of
    ``band_size``; docs sharing any band key are candidates.

    Scale path: explode to (band_idx, band_key, id) — docs × bands
    rows — then self-join on the band key. The join is equi-keyed so
    Spark shuffles on (band_idx, band_key); no cross product. Output:
    distinct (id_a, id_b) with id_a < id_b.
    """
    assert num_hashes % band_size == 0
    n_bands = num_hashes // band_size
    sigs = minhash_signature(docs, id_col, text_col, num_hashes, shingle_n)
    bands = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.concat_ws(
                    "|", F.slice(F.col("sig"), b * band_size + 1, band_size)
                ),
            )
        ).alias("band_idx", "band_key"),
    )
    a = bands.select(F.col("id").alias("id_a"), "band_idx", "band_key")
    b = bands.select(F.col("id").alias("id_b"), "band_idx", "band_key")
    pairs = a.join(b, ["band_idx", "band_key"]).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b").distinct()


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_n: int = 1,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs.

    With ``candidates`` (e.g. from minhash_lsh_candidates) only those
    pairs are verified — the 100 TB path. Without, all id_a < id_b
    pairs are scored (quadratic; correctness baseline / small inputs
    only). Jaccard = |A∩B| / |A∪B| over distinct shingles.
    Output: (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    sets_ = docs.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    )
    a = sets_.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    if candidates is not None:
        pairs = candidates.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash signature: for each bit b, sum +1/-1 over distinct
    tokens by whether bit b of the token's 32-bit hash is set; bit b
    of the signature is 1 iff the sum is positive.

    Token hash = first 8 hex chars of md5 → 32-bit int (reproducible
    in SQL engines). Bit test uses floor(h / 2^b) % 2, exact in
    doubles for h < 2^32. Output: (id, simhash BIGINT).
    """
    toks = F.array_distinct(tokens(text_col))
    # hash every token ONCE (md5 is the expensive step), then the
    # 32-bit sweep runs on a long array — pure integer ops
    hs = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    bit_set = lambda h, b: (  # noqa: E731
        F.floor(h / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2 == 1
    )
    # per-bit net vote: 2*set_count - n_tokens > 0  <=>  majority set
    sig = F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            F.size(F.filter(hs, lambda h: bit_set(h, b))) * 2 > F.size(hs),
            F.floor(F.pow(F.lit(2.0), b.cast("double"))).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return docs.select(F.col(id_col).alias("id"), sig.alias("simhash"))
