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


def test_upsert_equals_full_rebuild(spark, lake):
    """upsert(delta) over build(head) must give bitwise-identical
    query results to a one-shot build over head ∪ delta — including
    a MODIFIED re-imported doc whose old postings must vanish."""
    docs = _docs(spark)
    head = docs.where("doc_id < 400")
    search.build_text_index(lake, head, n_buckets=16)
    # delta: 100 fresh docs + one modified re-import
    fresh = docs.where("doc_id >= 400")
    modified = head.where("doc_id = 7").withColumn(
        "text", F.lit("data data data only")
    )
    search.upsert_text_index(lake, fresh.unionByName(modified))
    upserted = search.query_text_index(lake, TERMS, top_k=20).collect()

    lake2 = Lake(spark, lake.root + "2")
    final = docs.where("doc_id <> 7").unionByName(
        docs.where("doc_id = 7").withColumn(
            "text", F.lit("data data data only")
        )
    )
    search.build_text_index(lake2, final, n_buckets=16)
    rebuilt = search.query_text_index(lake2, TERMS, top_k=20).collect()
    assert [(r.doc_id, r.rank, r.score) for r in upserted] == [
        (r.doc_id, r.rank, r.score) for r in rebuilt
    ]
    # manifest totals reconciled exactly
    assert (
        lake.read("bm25_stats").first()["sum_dl"]
        == lake2.read("bm25_stats").first()["sum_dl"]
    )
    assert lake.read("bm25_stats").first()["n_docs"] == final.count()


def test_upsert_untouched_buckets_keep_files(spark, lake):
    """A one-term upsert doc touches one bucket; every other bucket's
    files must be byte-identical after the upsert."""
    import os

    docs = _docs(spark)
    search.build_text_index(lake, docs, n_buckets=16)
    tbl = lake.read("bm25_stats").first()["postings_table"]
    root = lake.path(tbl)

    def snapshot():
        out = {}
        for dirp, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirp, f)
                out[p] = (os.path.getmtime(p), os.path.getsize(p))
        return out

    before = snapshot()
    new_doc = spark.createDataFrame(
        [(999_999, "zzz_solo_term")], "doc_id long, text string"
    )
    search.upsert_text_index(lake, new_doc)
    after = snapshot()
    hot = search.term_bucket_py("zzz_solo_term", 16)
    for p, meta in before.items():
        if f"bucket={hot}" not in p:
            assert after.get(p) == meta, f"untouched file rewritten: {p}"


def test_upsert_zero_token_reimport_deletes_stale_postings(spark, lake):
    """A doc re-imported with text that tokenizes to NOTHING must
    lose all its old postings (the new postings frame has no row for
    it, so deletion is driven by the batch's full doc-id set) — and
    the result must equal a fresh rebuild."""
    docs = _docs(spark)
    search.build_text_index(lake, docs, n_buckets=16)
    emptied = spark.createDataFrame([(1, "")], "doc_id long, text string")
    search.upsert_text_index(lake, emptied)
    # doc 1 must no longer match anything, for any term it used to hold
    hits = search.query_text_index(lake, TERMS, top_k=1000).collect()
    assert all(r.doc_id != 1 for r in hits)
    postings = lake.read(lake.read("bm25_stats").first()["postings_table"])
    assert postings.where("doc_id = 1").count() == 0
    # upsert == rebuild, bitwise
    lake2 = Lake(spark, lake.root + "2")
    search.build_text_index(
        lake2,
        docs.select("doc_id", "text").where("doc_id <> 1").unionByName(emptied),
        n_buckets=16,
    )
    up = search.query_text_index(lake, TERMS, top_k=20).collect()
    rb = search.query_text_index(lake2, TERMS, top_k=20).collect()
    assert [(r.doc_id, r.rank, r.score) for r in up] == [
        (r.doc_id, r.rank, r.score) for r in rb
    ]
    # manifest still counts the emptied doc once, with dl = 0
    assert (
        lake.read("bm25_stats").first()["n_docs"]
        == lake2.read("bm25_stats").first()["n_docs"]
    )


def test_duplicate_doc_ids_in_batch_raise(spark, lake):
    dirty = spark.createDataFrame(
        [(1, "alpha"), (1, "beta"), (2, "gamma")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="duplicate doc_id"):
        search.build_text_index(lake, dirty, n_buckets=4)
    search.build_text_index(lake, _docs(spark).limit(10), n_buckets=4)
    with pytest.raises(ValueError, match="duplicate doc_id"):
        search.upsert_text_index(lake, dirty)
