"""Round-10 training-data operators: hard-negative mining, quality
keeper selection, KMV set algebra. Registry oracle parity is covered
by test_oracle_parity; these pin the operator SEMANTICS on small
hand-built fixtures."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators import dedup, similarity
from fxa_activity_metrics_spark.operators.rollup import kmv_set_overlap


def _emb_rows(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_hard_negatives_excludes_same_label_and_self(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),   # closest, but same label — excluded
        (2, [0.9, 0.2], 1),
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 2),
    ]
    emb = _emb_rows(spark, rows)
    out = similarity.hard_negatives(
        emb, emb.filter(F.col("vec_id") == 0), k=3
    ).collect()
    got = [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    # vec 1 (label 0) must not appear; order by cosine among labels != 0
    assert [n for n, _ in got] == [2, 3, 4]
    assert all(r.neg_label != 0 for r in out)


def test_hard_negatives_matches_bruteforce_when_labels_disjoint(spark):
    # all-distinct labels => the label filter only removes self-pairs,
    # i.e. hard_negatives == brute_force_topk on the shared columns
    rows = [
        (i, [float((i * 7) % 5) + 0.1, float((i * 3) % 4) + 0.2], i)
        for i in range(12)
    ]
    emb = _emb_rows(spark, rows)
    q = emb.filter(F.col("vec_id") < 3)
    hn = {
        (r.query_id, r.rank): r.neighbor_id
        for r in similarity.hard_negatives(emb, q, k=4).collect()
    }
    bf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in similarity.brute_force_topk(emb, q, k=4).collect()
    }
    assert hn == bf


def _docs_rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


def test_cluster_keepers_picks_heaviest_member(spark):
    # two clusters: {1,2,3} and {10,11}; weights favor 2 and 11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    docs = _docs_rows(
        spark,
        [(1, "a", 5), (2, "b", 9), (3, "c", 7), (10, "d", 4), (11, "e", 8)],
    )
    out = {r.cluster_id: r for r in dedup.cluster_keepers(pairs, docs).collect()}
    assert out[1].keeper_id == 2 and out[1].n_members == 3
    assert out[1].keeper_weight == 9
    assert out[10].keeper_id == 11 and out[10].n_members == 2


def test_cluster_keepers_weight_tie_breaks_to_smaller_id(spark):
    pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    docs = _docs_rows(spark, [(5, "x", 3), (6, "y", 3)])
    out = dedup.cluster_keepers(pairs, docs).collect()
    assert len(out) == 1 and out[0].keeper_id == 5


def test_cluster_keepers_counts_members_missing_from_docs(spark):
    """A member id absent from docs (caller passed a filtered corpus)
    must still count toward n_members with a null weight that ranks
    LAST — an inner join would silently shrink the cluster and could
    elect the wrong keeper."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    # doc 2 (the heaviest in the full corpus) is missing here
    docs = _docs_rows(spark, [(1, "a", 5), (3, "c", 7)])
    out = dedup.cluster_keepers(pairs, docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_members == 3, "missing member must still be counted"
    assert r.keeper_id == 3 and r.keeper_weight == 7
    # all-weightless cluster: min id wins, weight surfaces as null
    out2 = dedup.cluster_keepers(
        pairs, _docs_rows(spark, [])
    ).collect()
    assert len(out2) == 1
    assert out2[0].keeper_id == 1 and out2[0].keeper_weight is None
    assert out2[0].n_members == 3


def test_kmv_overlap_exact_below_k(spark):
    # two types with known overlap, all sets far below k=64: every
    # estimate must be EXACT (the sketch is the value set)
    rows = [(i, "a") for i in range(10)] + [(i, "b") for i in range(5, 20)]
    ev = spark.createDataFrame(
        [(uid, t, "2024-01-01 00:00:00") for uid, t in rows],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = kmv_set_overlap(ev, k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b) == ("a", "b")
    assert r.est_a == 10.0 and r.est_b == 15.0
    assert r.n_union_kept == 20 and r.est_union == 20.0
    assert r.n_common == 5
    assert r.jaccard_micro == 5 * 1_000_000 // 20
    assert r.est_intersection == 5.0


def test_kmv_overlap_estimator_matches_python_twin_above_k(spark):
    # 300 vs 300 ids with 100 shared, k=16: replay the bottom-k
    # estimator in pure python and require bit-equality
    k = 16
    a_ids = list(range(300))
    b_ids = list(range(200, 500))
    ev = spark.createDataFrame(
        [(u, "a", "2024-01-01 00:00:00") for u in a_ids]
        + [(u, "b", "2024-01-01 00:00:00") for u in b_ids],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = kmv_set_overlap(ev, k=k).collect()[0]

    def h(u):
        return hashlib.md5(str(u).encode()).hexdigest()

    hs_a = sorted(h(u) for u in set(a_ids))[:k]
    hs_b = sorted(h(u) for u in set(b_ids))[:k]
    u = sorted(set(hs_a) | set(hs_b))[:k]
    n_common = sum(1 for x in u if x in set(hs_a) and x in set(hs_b))
    frac = int(u[k - 1][:15], 16) / float(1 << 60)
    est_union = round((k - 1) / frac, 4)
    assert out.n_union_kept == k
    assert out.n_common == n_common
    assert out.jaccard_micro == n_common * 1_000_000 // k
    assert out.est_union == est_union
    assert out.est_intersection == round(n_common / k * est_union, 4)


# ---------------------------------------------------------------------------
# hashed tf·idf vectors / sparse-cosine text ANN
# ---------------------------------------------------------------------------


def test_hashed_vectors_match_python_twin(spark):
    from fxa_activity_metrics_spark.operators.search import (
        hashed_tfidf_vectors,
    )

    rows = [
        (1, "alpha beta beta gamma"),
        (2, "alpha delta"),
        (3, "epsilon zeta eta theta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.j): r.w_micro
        for r in hashed_tfidf_vectors(docs, dim=16).collect()
    }

    import math

    n_docs = len(rows)
    df: dict[str, int] = {}
    for _, text in rows:
        for t in set(text.split()):
            df[t] = df.get(t, 0) + 1
    want: dict[tuple, int] = {}
    for doc_id, text in rows:
        tf: dict[str, int] = {}
        for t in text.split():
            tf[t] = tf.get(t, 0) + 1
        for t, c in tf.items():
            h = hashlib.md5(t.encode()).hexdigest()
            j = int(h[:12], 16) % 16
            sign = 1 if h[12] in "01234567" else -1
            idf = round(math.log(n_docs / df[t]) * 1e6)
            want[(doc_id, j)] = want.get((doc_id, j), 0) + sign * c * idf
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want


def test_text_ann_finds_exact_duplicate_first(spark):
    from fxa_activity_metrics_spark.operators.search import (
        hashed_vector_topk,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (50, "the quick brown fox jumps over the lazy dog"),  # dup of 0
        (51, "completely different words entirely here now"),
        (52, "another unrelated document about spark engines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = hashed_vector_topk(docs, k=2, dim=32, n_queries=1).collect()
    top = [r for r in out if r.query_id == 0 and r.rank == 1][0]
    assert top.neighbor_id == 50 and top.cosine == 1.0


def test_simhash_null_text_propagates_null(spark):
    """NULL text → NULL signature (pre-r12 single-fold behavior): the
    per-bit scalar folds must not collapse null-text docs to simhash 0,
    which would make them all mutual hamming-0 near-duplicates."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, "")],
        ["doc_id", "text"],
    )
    got = {r["id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert got[1] is not None
    assert got[2] is None
    # empty string tokenizes to an empty array, not NULL: signature 0
    assert got[3] == 0


def test_simhash_lane_overflow_raises(spark):
    """A document at the 2^20 distinct-token packed-lane bound must
    raise loudly instead of silently corrupting the adjacent lane's
    count (ADVICE r13). The guard lives on `_n`, so it fires whenever
    the signature is actually computed (collect/write); a bare count()
    column-prunes the whole projection and computes nothing."""
    import pytest
    from pyspark.sql import functions as F

    big = spark.range(1).select(
        F.lit(7).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(1 << 20)),
                lambda i: F.concat(F.lit("w"), i.cast("string")),
            ),
        ).alias("text"),
    )
    with pytest.raises(Exception, match="distinct tokens"):
        dedup.simhash(big).collect()
