"""Mega-cell mitigation pin for semantic_dedup (VERDICT r7 #4): on a
corpus whose md5 centroid sample lands badly — all 16 sampled ids
inside one tight cluster — two deterministic Lloyd's iterations
(kmeans_centroids) must both SHRINK the worst cell's pairwise-join
cost and RESTORE the drop set to the exact all-pairs answer.

Fixture: 1000 vectors in 16-dim; the 16 md5-smallest ids (the exact
ivf_centroids sample, computed with hashlib up front) plus 24 more
form tight cluster T (sigma 0.05); the remaining 960 spread across 8
separated clusters (sigma 0.15). Untrained, every non-T point funnels
through the few boundary-most T centroids (max-cell pairs ~20k);
trained, centroids migrate to the mass (max-cell pairs ~7k, measured
2.8x smaller) and at theta=0.97 the within-cell drop set equals the
global all-pairs drop set, which the untrained cells split."""

import hashlib

import numpy as np
import pytest

from fxa_activity_metrics_spark.operators import similarity

N, DIM, K, THETA = 1000, 16, 16, 0.97


def _fixture():
    rng = np.random.default_rng(7)
    ids = list(range(N))
    order = sorted(
        ids,
        key=lambda i: (hashlib.md5(f"fxa-ivf:{i}".encode()).hexdigest(), i),
    )
    samp = set(order[:K])
    centers = rng.normal(size=(9, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.zeros((N, DIM))
    others = [i for i in ids if i not in samp]
    tight = list(samp) + others[:24]
    rest = others[24:]
    for i in tight:
        X[i] = centers[0] + 0.05 * rng.normal(size=DIM)
    for j, i in enumerate(rest):
        X[i] = centers[1 + (j % 8)] + 0.15 * rng.normal(size=DIM)
    return X


def _max_cell_pairs(dedup_rows):
    counts: dict[int, int] = {}
    for r in dedup_rows:
        counts[r["cell"]] = counts.get(r["cell"], 0) + 1
    return max(n * (n - 1) // 2 for n in counts.values())


@pytest.fixture(scope="module")
def corpus(spark):
    X = _fixture()
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).coalesce(4)
    df.persist().count()
    yield X, df
    df.unpersist()


def test_trained_cells_shrink_mega_cell(corpus):
    X, df = corpus
    untrained = similarity.ivf_centroids(df, n_cells=K)
    trained = similarity.kmeans_centroids(df, n_cells=K, n_iter=2)
    rows_un = similarity.semantic_dedup(
        df, threshold=THETA, centroids=untrained
    ).collect()
    rows_tr = similarity.semantic_dedup(
        df, threshold=THETA, centroids=trained
    ).collect()
    mp_un, mp_tr = _max_cell_pairs(rows_un), _max_cell_pairs(rows_tr)
    # measured on this fixture: 20503 untrained vs 7140 trained
    assert mp_tr * 2 < mp_un, (mp_tr, mp_un)

    # exact all-pairs drop set (min-id survivor rule) from numpy
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T
    iu = np.triu_indices(N, 1)
    hit = cos[iu] >= THETA
    all_drops = set(int(b) for b in iu[1][hit])
    assert all_drops, "fixture must contain near-duplicates"

    drops_tr = {r["vec_id"] for r in rows_tr if not r["keep"]}
    drops_un = {r["vec_id"] for r in rows_un if not r["keep"]}
    # within-cell gating can only ever drop a subset of all-pairs
    assert drops_tr <= all_drops and drops_un <= all_drops
    # trained cells co-locate every near-dup pair at this theta...
    assert drops_tr == all_drops
    # ...which the untrained mega-cell split demonstrably does not
    assert drops_un < all_drops


def test_trained_centroids_deterministic(corpus):
    _, df = corpus
    a = similarity.kmeans_centroids(df, n_cells=K, n_iter=2)
    b = similarity.kmeans_centroids(
        df.repartition(13, "vec_id"), n_cells=K, n_iter=2
    )
    assert a == b, "fixed-point training must be partitioning-invariant"
