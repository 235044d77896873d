"""Suffix-ordering substring dedup (VERDICT r8 item 6).

Three-way pin: (1) the sorted-run path's span set equals a
brute-force Python oracle on docs engineered with OVERLAPPING
long-token duplicates; (2) the anchor path's found-set is contained
in (and in fact equals) the exact path's on real corpus data; (3)
the plan is the promised shape — one range exchange, zero joins.
DuckDB value-hash parity runs in test_oracle_parity.py like every
registry entry.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.dedup import (
    duplicated_spans,
    duplicated_spans_sorted,
)
from tests.conftest import SF001


def _brute_spans(texts: dict[int, str], k: int, min_count: int):
    """Union of duplicated-k-gram coverage, maximal per-doc spans —
    the definition, computed the slow way."""
    from collections import Counter

    toks = {d: [t for t in s.split(" ") if t] for d, s in texts.items()}
    counts = Counter()
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            counts[tuple(ts[i : i + k])] += 1
    spans = set()
    for d, ts in toks.items():
        covered = sorted(
            i
            for i in range(len(ts) - k + 1)
            if counts[tuple(ts[i : i + k])] >= min_count
        )
        if not covered:
            continue
        start = prev = covered[0]
        islands = []
        for p in covered[1:]:
            if p - prev > k:
                islands.append((start, prev))
                start = p
            prev = p
        islands.append((start, prev))
        for s, e in islands:
            spans.add((d, s + 1, e + k))  # 1-based inclusive
    return spans


def test_overlapping_long_duplicates_found_exactly(spark):
    # doc 1: a 60-token periodic text — every 50-gram occurs >= 2
    # times and the occurrences OVERLAP each other (the case a naive
    # non-overlapping segmenter misses); docs 2/3 share a 55-token
    # run embedded at different offsets; doc 4 is clean.
    period = " ".join(f"w{i % 10}" for i in range(60))
    shared = " ".join(f"s{i}" for i in range(55))
    texts = {
        1: period,
        2: "a b c " + shared + " x y z",
        3: "p q " + shared + " r",
        4: " ".join(f"u{i}" for i in range(80)),
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    k = 50
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans_sorted(docs, k=k, min_count=2).collect()
    }
    assert got == _brute_spans(texts, k, 2)
    # the periodic doc's whole body is one maximal span
    assert (1, 1, 60) in got
    # the shared run is found at its exact offsets in both carriers
    assert (2, 4, 58) in got and (3, 3, 57) in got
    # the clean doc produces nothing
    assert not any(d == 4 for d, _, _ in got)


def test_anchor_found_set_subset_of_exact(spark):
    """The hash-aggregate anchor path never finds a span the suffix
    path misses — and on this corpus the sets are identical (both
    compute the union of duplicated-gram coverage)."""
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    key = lambda r: (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_grams)
    anchor = {key(r) for r in duplicated_spans(docs, k=8, min_count=2).collect()}
    exact = {
        key(r)
        for r in duplicated_spans_sorted(docs, k=8, min_count=2).collect()
    }
    assert anchor <= exact, "anchor path found a span the exact path missed"
    assert anchor == exact
    assert exact, "sf0.001 corpus contains duplicated spans"


def test_max_gram_occ_matches_independent_aggregate(spark):
    """max_gram_occ (free from the run window) must equal the value a
    second-pass aggregate over the anchor path would compute."""
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    from fxa_activity_metrics_spark.operators.dedup import (
        _positional_gram_hashes,
    )

    occ = _positional_gram_hashes(docs, 8, "doc_id", "text")
    cnt = occ.groupBy("gh").agg(F.count(F.lit(1)).alias("c"))
    expect = {
        (r.doc_id, r.pos): r.c
        for r in occ.join(cnt, "gh").filter(F.col("c") >= 2).collect()
    }
    for r in duplicated_spans_sorted(docs, k=8, min_count=2).collect():
        hot = max(
            c
            for (d, p), c in expect.items()
            if d == r.doc_id and r.span_start <= p <= r.span_end - 7
        )
        assert r.max_gram_occ == hot


def test_plan_one_range_exchange_no_join(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    plan = (
        duplicated_spans_sorted(docs, k=8, min_count=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning(gh" in plan, "suffix blocks must range-partition"
    assert "Join" not in plan, "the sorted path has no join anywhere"
    # exactly two shuffles total: the suffix sort + the doc_id islands
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 2
