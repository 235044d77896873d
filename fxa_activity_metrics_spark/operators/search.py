"""Lexical (BM25) search over the document corpus — the keyword
complement to the embedding-based similarity operators.

Shape at 100 TB:

- corpus statistics (doc count, total token length, per-query-term
  document frequencies) are ONE map-side-combining aggregate whose
  output is a single row — broadcast back, never a shuffle of the
  corpus;
- scoring is a per-row projection (term frequencies come from the
  row's own token array — no posting-list join, no explode);
- top-k is orderBy+limit, which Spark plans as TakeOrderedAndProject:
  per-partition partial top-k merged on the driver — NOT a
  row_number window over a single global sort partition.

Determinism/oracle notes: idf is snapped to integer micro-units
(round(ln(...)·1e6) as BIGINT) so the one libm-sensitive op (ln —
within 1 ulp but not correctly rounded on every platform) is
quantized far from any rounding boundary; every other op in the
score is an IEEE correctly-rounded +,-,*,/ chain written in the same
association order as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.dedup import tokens


def _term_eq(term: str):
    """Unary HOF lambda comparing an element to a bound literal —
    a factory so pyspark sees arity 1 (a two-arg lambda would be
    read as (element, index))."""
    return lambda x: x == F.lit(term)


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 rank of the corpus against a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))
    with the BM25+ style always-positive idf
    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1).

    Ties in the 6dp-rounded score break by ascending doc id, so the
    top-k set and order are deterministic. Output:
    (id, score, rank) — rank 1-based, ≤ top_k rows.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    toks = tokens(text_col)
    tokd = docs.select(
        F.col(id_col), toks.alias("toks"), F.size(toks).alias("dl")
    )
    stats = tokd.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.array_contains("toks", t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    scored = tokd.crossJoin(F.broadcast(stats))
    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n
    contribs = []
    for i, t in enumerate(query_terms):
        tf = F.size(F.filter(F.col("toks"), _term_eq(t)))
        df_t = F.col(f"df_{i}").cast("double")
        # micro-quantized idf: the ln is the only non-correctly-rounded
        # op in the whole score — snap it to an exact integer
        idf = (
            F.round(
                F.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0) * 1e6
            )
            .cast("bigint")
            .cast("double")
            / 1e6
        )
        tfd = tf.cast("double")
        denom = tfd + k1 * (
            (1.0 - b) + b * (F.col("dl").cast("double") / avgdl)
        )
        contribs.append(
            F.when(tf > 0, idf * (tfd * (k1 + 1.0)) / denom).otherwise(
                F.lit(0.0)
            )
        )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    ranked = (
        scored.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )
    # rank the ≤ top_k survivors (tiny frame — the global sort already
    # happened as TakeOrderedAndProject, not a single-partition window)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", "score"
    )
