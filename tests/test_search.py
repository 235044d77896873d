"""BM25 lexical search (operators/search.py): ranking semantics and
the physical-plan scale contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from fxa_activity_metrics_spark.operators import search

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_matching_docs_first(spark):
    docs = _mkdocs(
        spark,
        [
            (1, "spark spark spark engine"),
            (2, "spark engine"),
            (3, "totally unrelated words here"),
            (4, "spark"),
        ],
    )
    out = search.bm25_search(docs, ["spark"], top_k=10).collect()
    order = [r.doc_id for r in out]
    # doc 3 has no hits -> score 0 and last; repeated-term docs first
    assert order[0] == 1
    assert order[-1] == 3
    scores = {r.doc_id: r.score for r in out}
    assert scores[3] == 0.0
    assert scores[1] > scores[4] > scores[3]


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc scores higher (b > 0)."""
    docs = _mkdocs(
        spark,
        [
            (1, "hit " + "pad " * 50),
            (2, "hit pad"),
            (3, "none at all"),
        ],
    )
    scores = {
        r.doc_id: r.score
        for r in search.bm25_search(docs, ["hit"], top_k=10).collect()
    }
    assert scores[2] > scores[1] > scores[3] == 0.0


def test_bm25_matches_reference_formula(spark):
    """Spot-check one score against a pure-Python BM25 evaluation
    with the same micro-quantized idf."""
    texts = {1: "a b a c", 2: "a d", 3: "e f g"}
    docs = _mkdocs(spark, list(texts.items()))
    out = {
        r.doc_id: r.score
        for r in search.bm25_search(docs, ["a"], top_k=10).collect()
    }
    n, df = 3, 2
    idf = round(round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)) / 1e6
    avgdl = (4 + 2 + 3) / 3
    for doc, tf, dl in ((1, 2, 4), (2, 1, 2)):
        expect = round(
            idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))), 6
        )
        assert out[doc] == pytest.approx(expect, abs=2e-6)


def test_bm25_top_k_and_rank_contiguous(spark):
    df = E.queries()["bm25_search"](spark, SF)
    rows = df.collect()
    assert len(rows) == 20
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, 21)
    )


def test_bm25_plan_take_ordered_not_global_window(spark):
    """Top-k must plan as TakeOrderedAndProject (per-partition partial
    top-k), and the stats side must broadcast — the corpus never
    hash-shuffles."""
    df = E.queries()["bm25_search"](spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_invalid_args(spark):
    docs = _mkdocs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        search.bm25_search(docs, [])
    with pytest.raises(ValueError):
        search.bm25_search(docs, ["a", "a"])


# ---- tf-idf keyword extraction -------------------------------------


def test_tfidf_universal_term_scores_zero_and_ranks_last(spark):
    from fxa_activity_metrics_spark.operators.search import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "shared rare1 rare1 rare1"),
            (2, "shared rare2"),
            (3, "shared other"),
        ],
        "doc_id long, text string",
    )
    got = tfidf_top_terms(docs, top_k=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'shared' is in every doc: idf = ln(1) = 0 exactly
    for r in got:
        if r["term"] == "shared":
            assert r["score_micro"] == 0 and r["df"] == 3
    # doc 1: rare1 (tf=3, df=1) must outrank shared
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert d1[0]["term"] == "rare1" and d1[0]["tf"] == 3
    assert d1[0]["score_micro"] == 3 * round(__import__("math").log(3) * 1e6)
    # deterministic tie-break: zero-score terms order alphabetically
    zero = [r["term"] for r in d1 if r["score_micro"] == 0]
    assert zero == sorted(zero)


def test_tfidf_top_k_truncates(spark):
    from fxa_activity_metrics_spark.operators.search import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x")], "doc_id long, text string"
    )
    got = tfidf_top_terms(docs, top_k=3).collect()
    assert sum(1 for r in got if r["doc_id"] == 1) == 3
    assert sum(1 for r in got if r["doc_id"] == 2) == 1
