"""Persisted inverted index (build_text_index / query_text_index):
bitwise parity with direct bm25_search, partition-pruned probes,
versioned rebuild lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators import search
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.sources.testdata import read_table

SF = "/root/testdata/sf0.01"
TERMS = ["data", "query", "table", "vector"]


@pytest.fixture()
def lake(spark, tmp_path):
    return Lake(spark, str(tmp_path / "lake"))


def _docs(spark):
    return read_table(spark, SF, "documents")


def test_indexed_equals_direct_bitwise(spark, lake):
    docs = _docs(spark)
    search.build_text_index(lake, docs, n_buckets=16)
    direct = search.bm25_search(docs, TERMS, top_k=20).collect()
    indexed = search.query_text_index(lake, TERMS, top_k=20).collect()
    # enough matching docs that the candidate-only contract is moot
    assert len(indexed) == 20
    assert [(r.doc_id, r.rank, r.score) for r in direct] == [
        (r.doc_id, r.rank, r.score) for r in indexed
    ]


def test_query_scan_is_partition_pruned(spark, lake):
    search.build_text_index(lake, _docs(spark), n_buckets=16)
    df = search.query_text_index(lake, ["data"], top_k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, (
        "probed term buckets must prune postings partitions"
    )
    b = search.term_bucket_py("data", 16)
    assert f"bucket#" in plan and str(b) in plan


def test_bucket_twins_agree(spark):
    terms = ["data", "query", "zebra", "Ω-mega", ""]
    got = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", search.term_bucket_col("term", 16).alias("b"))
        .collect()
    )
    for r in got:
        assert r.b == search.term_bucket_py(r.term, 16), r.term


def test_rebuild_drops_stale_versions(spark, lake):
    docs = _docs(spark)
    search.build_text_index(lake, docs, n_buckets=16)
    search.build_text_index(lake, docs.limit(100), n_buckets=8)
    versions = lake.tables("bm25_postings_v")
    assert versions == ["bm25_postings_v2"]
    m = lake.read("bm25_stats").first()
    assert m["postings_table"] == "bm25_postings_v2"
    assert m["n_docs"] == 100 and m["n_buckets"] == 8
    # queries resolve through the manifest, not the dropped table
    assert search.query_text_index(lake, ["data"], top_k=5).count() <= 5


def test_missing_term_contributes_nothing(spark, lake):
    docs = _docs(spark)
    search.build_text_index(lake, docs, n_buckets=16)
    with_missing = search.query_text_index(
        lake, ["data", "zzz_never_seen"], top_k=20
    ).collect()
    direct = search.bm25_search(docs, ["data", "zzz_never_seen"], top_k=20)
    # same scores as the direct path on the same term list
    assert [(r.doc_id, r.score) for r in with_missing] == [
        (r.doc_id, r.score) for r in direct.collect()
    ]


def test_query_index_invalid_args(spark, lake):
    search.build_text_index(lake, _docs(spark).limit(10), n_buckets=4)
    with pytest.raises(ValueError):
        search.query_text_index(lake, [])
    with pytest.raises(ValueError):
        search.query_text_index(lake, ["a", "a"])


def test_empty_corpus_builds_empty_queryable_index(spark, lake):
    empty = spark.createDataFrame([], "doc_id long, text string")
    search.build_text_index(lake, empty, n_buckets=4)
    m = lake.read("bm25_stats").first()
    assert m["n_docs"] == 0 and m["sum_dl"] == 0
    out = search.query_text_index(lake, ["data"], top_k=5)
    assert out.count() == 0
    assert out.columns == ["doc_id", "rank", "score"]
