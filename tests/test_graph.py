"""Integer PageRank contracts: determinism under partitioning,
structural sanity on known graphs, and the micro-unit arithmetic
bounds the oracle replay depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.graph import pagerank, symmetrize


def _ranks(spark, pairs, n_iters=3):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = pagerank(symmetrize(df), n_iters=n_iters).collect()
    return {r["id"]: r["pr_micro"] for r in rows}


def test_star_center_dominates(spark):
    # 0 connected to 1..5: the hub must outrank every spoke, and all
    # spokes tie exactly (integer arithmetic — not approximately)
    got = _ranks(spark, [(0, i) for i in range(1, 6)])
    spokes = {got[i] for i in range(1, 6)}
    assert len(spokes) == 1
    assert got[0] > max(spokes)


def test_symmetric_graph_symmetric_ranks(spark):
    # path 1-2-3: the ends must tie bit-exactly
    got = _ranks(spark, [(1, 2), (2, 3)])
    assert got[1] == got[3]
    assert got[2] > got[1]


def test_rank_floor_is_base_mass(spark):
    # every node receives at least the (1-d) base each round
    got = _ranks(spark, [(1, 2), (3, 4), (4, 5)])
    assert all(v >= 150000 for v in got.values())


def test_partitioning_invariance(spark):
    """The oracle contract: ranks are a pure function of the graph.
    Any repartitioning of the edge list yields bit-identical
    ranks."""
    pairs = [(i, (i * 7 + 3) % 50) for i in range(200) if i != (i * 7 + 3) % 50]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    base = {
        r["id"]: r["pr_micro"]
        for r in pagerank(symmetrize(df), n_iters=3).collect()
    }
    for parts in (1, 7, 32):
        shuffled = symmetrize(df).repartition(parts, F.col("dst"))
        got = {
            r["id"]: r["pr_micro"]
            for r in pagerank(shuffled, n_iters=3).collect()
        }
        assert got == base, parts


def test_iteration_count_changes_ranks(spark):
    # a bipartite-ish star OSCILLATES round to round (hub mass
    # sloshes to spokes and back), so distinct n_iters must give
    # distinct — but always hub-dominant — rank vectors
    pairs = [(0, i) for i in range(1, 8)]
    r1 = _ranks(spark, pairs, n_iters=1)
    r3 = _ranks(spark, pairs, n_iters=3)
    assert r1 != r3
    assert r1[0] > r1[1] and r3[0] > r3[1]


# --- triangle counting ---------------------------------------------------


def _tris(spark, pairs):
    from fxa_activity_metrics_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r["doc_id"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }


def test_triangle_single(spark):
    got = _tris(spark, [(1, 2), (2, 3), (1, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_shared_edges(spark):
    # K4: every node sits in C(3,2)=3 triangles
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = _tris(spark, k4)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_open_wedge_is_not_a_triangle(spark):
    assert _tris(spark, [(1, 2), (2, 3)]) == {}


def test_triangle_found_exactly_once(spark):
    # a triangle plus a pendant edge: the pendant never inflates
    got = _tris(spark, [(1, 2), (2, 3), (1, 3), (3, 9)])
    assert got == {1: 1, 2: 1, 3: 1}


# ---- fixed-round k-core peeling ------------------------------------


def _core(spark, pairs, k=2, n_rounds=3):
    from fxa_activity_metrics_spark.operators.graph import kcore

    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = kcore(df, k=k, n_rounds=n_rounds).collect()
    return {r["doc_id"]: r["degree"] for r in rows}


def test_kcore_cycle_survives(spark):
    # C4 is its own 2-core: every node keeps degree 2 forever
    got = _core(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_kcore_path_peels_to_nothing(spark):
    # P4: endpoints peel in round 1, the remaining pair in round 2
    got = _core(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {}


def test_kcore_pendant_stripped_triangle_stays(spark):
    # triangle + pendant edge: the pendant (and only it) peels
    got = _core(spark, [(1, 2), (2, 3), (1, 3), (3, 9)])
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_round_limit_is_the_contract(spark):
    # a 4-chain hanging off a triangle needs 4 peels to fully clear;
    # with n_rounds=2 exactly the part still standing after 2 peels
    # remains (8 peels round 1, 7 round 2 — node 6 is KEPT in round 2
    # because its degree was still 2 at decision time, and ends the
    # round holding one edge)
    pairs = [(1, 2), (2, 3), (1, 3), (3, 5), (5, 6), (6, 7), (7, 8)]
    got2 = _core(spark, pairs, n_rounds=2)
    assert got2 == {1: 2, 2: 2, 3: 3, 5: 2, 6: 1}
    got4 = _core(spark, pairs, n_rounds=4)
    assert got4 == {1: 2, 2: 2, 3: 2}


def test_kcore_k3_keeps_only_the_clique(spark):
    # K4 plus a triangle sharing one vertex: only K4 is 3-core
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(4, 5), (5, 6), (4, 6)]
    got = _core(spark, k4 + tri, k=3)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
