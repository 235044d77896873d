"""Filtered-ANN recall study (VERDICT r11 item 6): recall@k of the
FILTERED persisted-IVF search vs the filtered brute-force ground
truth, swept across filter selectivity × n_probe, with and without
candidate-aware probe escalation (``_escalate_probes``).

The failure mode being measured: `ann_filtered`'s oracle pins the
full-probe configuration (n_probe == n_cells, where filtered search
== filtered brute force by construction), but a SELECTIVE filter at
LOW n_probe starves the shortlist — the allowed ids concentrate
outside the probed cells, so recall collapses as selectivity drops.
``auto_probe`` escalates the probe count by 1/selectivity, restoring
the expected number of ALLOWED candidates per query; the scored
stream stays bounded because the allowed-id semi-join has already cut
it to the filter's size.

Usage:
    python tools/filtered_recall.py [sf_dir] [n_queries] [k]

Defaults: /root/testdata/sf0.1 (the honest curve — no replication
inflation), 50 queries, k=5. Writes FILTERED_RECALL.json at the repo
root when run on the default sf0.1 data.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fxa_activity_metrics_spark.operators import similarity  # noqa: E402
from fxa_activity_metrics_spark.session import get_spark  # noqa: E402
from fxa_activity_metrics_spark.sources.lake import Lake  # noqa: E402
from fxa_activity_metrics_spark.sources.testdata import read_table  # noqa: E402

N_CELLS = 32
# allowed fraction: vec_id % m == 0  ->  selectivity ~= 1/m
SELECTIVITY_MODS = [2, 5, 20, 100]
PROBES = [1, 2, 4, 8, N_CELLS]


def topk_sets(df, k):
    out: dict[int, set[int]] = {}
    for r in df.filter(F.col("rank") <= k).collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx, exact) -> float:
    hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    total = sum(len(s) for s in exact.values())
    return hits / total if total else 1.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = get_spark("filtered-recall")
    emb = read_table(spark, sf_dir, "embeddings").repartition(32)
    emb.cache().count()
    queries = emb.filter(F.col("vec_id") < n_queries)

    tmp = tempfile.mkdtemp(prefix="filtered_recall_")
    lake = Lake(spark, tmp)
    similarity.ivf_build_index(lake, emb, name="fr", n_cells=N_CELLS)

    results = []
    for m in SELECTIVITY_MODS:
        allowed = emb.filter(F.col("vec_id") % m == 0).select("vec_id")
        fcorpus = emb.join(allowed, "vec_id", "left_semi")
        exact = topk_sets(
            similarity.brute_force_topk(fcorpus, queries, k=k), k
        )
        for n_probe in PROBES:
            row = {"selectivity": round(1.0 / m, 4), "n_probe": n_probe}
            for auto in (False, True):
                approx = topk_sets(
                    similarity.ivf_query_index(
                        lake,
                        queries,
                        name="fr",
                        k=k,
                        n_probe=n_probe,
                        candidate_ids=allowed,
                        auto_probe=auto,
                    ),
                    k,
                )
                key = "recall_auto" if auto else "recall_fixed"
                row[key] = round(recall(approx, exact), 4)
            row["escalated_probes"] = similarity._escalate_probes(
                n_probe, N_CELLS, allowed.count(), emb.count()
            )
            results.append(row)
            print(json.dumps(row), flush=True)

    print(f"\nfiltered recall@{k}, {n_queries} queries, "
          f"{N_CELLS} cells, at {sf_dir}:")
    print(f"{'sel':>6} {'probe':>6} {'fixed':>8} {'auto':>8} {'eff_probe':>10}")
    for r in results:
        print(f"{r['selectivity']:>6} {r['n_probe']:>6} "
              f"{r['recall_fixed']:>8.3f} {r['recall_auto']:>8.3f} "
              f"{r['escalated_probes']:>10}")

    if sf_dir.rstrip("/").endswith("sf0.1"):
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "FILTERED_RECALL.json",
        )
        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "k": k,
                    "n_queries": n_queries,
                    "n_cells": N_CELLS,
                    "results": results,
                },
                f,
                indent=1,
            )
    import shutil

    shutil.rmtree(tmp)
    spark.stop()


if __name__ == "__main__":
    main()
