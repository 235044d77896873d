"""IVF recall study: recall@k of the IVF ANN path vs the exact
brute-force GEMM ground truth, across probe counts, cell counts, and
centroid quality (hash-sampled vs k-means-trained).

Usage:
    python tools/ivf_recall.py [sf_dir] [n_queries] [k]

Defaults: .scratch/sf1, 50 queries, k=10. Prints one JSON line per
(n_cells, centroids, n_probe) combination plus a summary table, and
writes IVF_RECALL.json at the repo root when sf_dir is the default
sf1 study. The driver-facing correctness contract for IVF is exact
determinism (the md5-replay oracle); THIS tool measures the
approximation quality those deterministic plans deliver — the
number a capacity-planning engineer needs when choosing n_probe.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fxa_activity_metrics_spark.operators import similarity  # noqa: E402
from fxa_activity_metrics_spark.session import get_spark  # noqa: E402
from fxa_activity_metrics_spark.sources.testdata import read_table  # noqa: E402


def topk_sets(df, k):
    """query_id -> frozenset of neighbor_ids (rank <= k)."""
    out: dict[int, set[int]] = {}
    for r in df.filter(F.col("rank") <= k).collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    total = sum(len(s) for s in exact.values())
    return hits / total if total else 1.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("ivf-recall")
    emb = read_table(spark, sf_dir, "embeddings").repartition(32)
    emb.cache().count()
    queries = emb.filter(F.col("vec_id") < n_queries)

    exact = topk_sets(
        similarity.brute_force_topk_gemm(emb, queries, k=k), k
    )

    results = []
    for n_cells in (16, 64):
        hash_cents = similarity.ivf_centroids(emb, n_cells=n_cells)
        trained_cents = similarity.kmeans_centroids(emb, n_cells=n_cells, n_iter=5)
        for label, cents in (("hash", hash_cents), ("kmeans", trained_cents)):
            for n_probe in (1, 2, 4, 8, n_cells):
                approx = topk_sets(
                    similarity.ivf_topk(
                        emb,
                        queries,
                        k=k,
                        n_cells=n_cells,
                        n_probe=n_probe,
                        centroids=cents,
                    ),
                    k,
                )
                rec = {
                    "n_cells": n_cells,
                    "centroids": label,
                    "n_probe": n_probe,
                    "recall_at_k": round(recall(approx, exact), 4),
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)

    print(f"\nrecall@{k} over {n_queries} queries at {sf_dir}:")
    print(f"{'cells':>6} {'probe':>6} {'hash':>8} {'kmeans':>8}")
    by = {(r["n_cells"], r["centroids"], r["n_probe"]): r["recall_at_k"] for r in results}
    for n_cells in (16, 64):
        for n_probe in (1, 2, 4, 8, n_cells):
            h = by[(n_cells, "hash", n_probe)]
            t = by[(n_cells, "kmeans", n_probe)]
            print(f"{n_cells:>6} {n_probe:>6} {h:>8.3f} {t:>8.3f}")

    if sf_dir.rstrip("/").endswith("sf1"):
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "IVF_RECALL.json",
        )
        with open(out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "k": k, "n_queries": n_queries, "results": results},
                f,
                indent=1,
            )
    spark.stop()


if __name__ == "__main__":
    main()
