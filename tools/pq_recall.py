"""PQ / IVFPQ recall study → PQ_RECALL.json: recall@k of the ADC
paths vs the exact GEMM brute force across subspace counts, codebook
training, and cell-probe widths — the quantitative counterpart to
the ann_pq / ann_ivfpq determinism oracles, and the committed
evidence for the operating points the registry pins (m=16,
shortlist 8k; ivfpq n_probe=4). Usage:
python tools/pq_recall.py [sf_dir]  (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fxa_activity_metrics_spark.session import get_spark  # noqa: E402
from fxa_activity_metrics_spark.operators import similarity  # noqa: E402


def _sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pq-recall")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _sets(similarity.brute_force_topk_gemm(emb, queries, k=5))

    def recall(approx):
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        return round(hits / sum(len(v) for v in exact.values()), 3)

    out = {"sf_dir": sf_dir, "k": 5, "n_queries": len(exact), "pq": {}, "ivfpq": {}}
    for m in (4, 8, 16):
        hashed = similarity.pq_codebooks(emb, m=m, n_codes=16)
        trained = similarity.pq_train_codebooks(emb, m=m, n_codes=16, n_iter=2)
        out["pq"][f"m{m}"] = {
            "hashed": recall(_sets(similarity.pq_topk(
                emb, queries, k=5, m=m, n_codes=16,
                shortlist_factor=8, codebooks=hashed))),
            "trained": recall(_sets(similarity.pq_topk(
                emb, queries, k=5, m=m, n_codes=16,
                shortlist_factor=8, codebooks=trained))),
        }
    for n_probe in (2, 4, 8, 16):
        out["ivfpq"][f"probe{n_probe}"] = recall(_sets(similarity.ivfpq_topk(
            emb, queries, k=5, n_cells=16, n_probe=n_probe,
            m=16, n_codes=16, shortlist_factor=8)))
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PQ_RECALL.json"), "w") as f:
        f.write(line)
    spark.stop()


if __name__ == "__main__":
    main()
