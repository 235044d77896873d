"""Regenerate BENCH_ORGANIC.json: the pair-output-bound dedup family
measured on ORGANIC-DUPLICATE scaled corpora (VERDICT r12 items 2-3).

The standard replica corpora (tools/make_scaled_sf.py, no cap) give
every document `factor` near-identical clones, so the LSH candidate
pair set — and with it every pair-output-bound downstream (the
jaccard verify, cluster resolution, per-pair DP verify, pHash
Hamming buckets, wedge joins) — grows as factor², which measures the
generator, not the engine: on organic corpora duplicate-group sizes
do not grow with corpus scale. This tool measures exactly that family
on `--clone-cap 2` corpora (bounded 2-clone cliques + salted unique
growth; documents-only, the family's sole input) at 10× and 100× the
sf0.1 base, and applies the repo's own scaling gate
(bench.scaling_violations: t must not grow faster than the data) so
the family's scale evidence is machine-checked instead of excluded.

Usage: python tools/bench_organic.py
(expects .scratch/sf1organic and .scratch/sf10organic from
 make_scaled_sf.py [10|100] /root/testdata/sf0.1 <dir>
 --clone-cap 2 --tables documents)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fxa_activity_metrics_spark.session import get_spark  # noqa: E402
from fxa_activity_metrics_spark import cacheutil  # noqa: E402

from bench import scaling_violations  # noqa: E402

# every pair-output-bound consumer of the near-dup pair structure:
# the three adjudicated in VERDICT r12 item 2, plus the three already
# excluded at sf >= 1 with the replica-clique rationale — organic
# corpora are exactly the setting where they CAN be measured honestly
FAMILY = [
    "jaccard_dedup",
    "dedup_clusters",
    "cluster_keepers",
    "neardup_editdist",
    "triangle_counts",
    # phash_pairs is measured separately below: its duplicate groups
    # come from the synthetic image generator (doc_id % groups), not
    # from the text, so the organic DOCUMENTS don't bound them — the
    # registry's oracle-pinned groups=50 means 10,000-member identical
    # image groups at 500k docs (billions of pairs, Java-heap OOM
    # measured). The organic contract applied to the image table is
    # groups ∝ N: constant ~100-member duplicate groups, matching the
    # sf0.1 base geometry (5000 docs / 50 groups), so the same-name
    # gate row compares like with like.
]

PHASH_GROUPS = {"sf1organic": 500, "sf10organic": 5000}

RUNS = [("sf1organic", 10.0), ("sf10organic", 100.0)]
CLONE_CAP = 2


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as em

    with open(os.path.join(root, "BENCH_LOCAL.json")) as f:
        base = json.load(f)["queries"]

    spark = get_spark("bench-organic")
    qs = em.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    record: dict = {"clone_cap": CLONE_CAP, "runs": {}}
    from fxa_activity_metrics_spark.operators import multimodal

    for run_name, ratio in RUNS:
        sf_dir = os.path.join(root, ".scratch", run_name)
        timings: dict[str, float] = {}

        def q_phash_scaled(spark, sf_dir, _g=PHASH_GROUPS[run_name]):
            hashes = multimodal.phash_images(
                multimodal.synth_ppm_images(em._docs(spark, sf_dir), groups=_g)
            )
            return multimodal.phash_pairs(hashes, max_hamming=7)

        for name, fn in [(n, qs[n]) for n in FAMILY] + [
            ("phash_pairs", q_phash_scaled)
        ]:
            per = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                per.append(time.perf_counter() - t0)
                cacheutil.release_all()
            timings[name] = round(min(per), 3)
            print(f"{run_name} {name}: {timings[name]}", file=sys.stderr)
        record["runs"][run_name] = {
            "data_ratio_vs_base": ratio,
            "queries": timings,
            "phash_groups": PHASH_GROUPS[run_name],
            "gate": scaling_violations(timings, base, ratio),
        }
    line = json.dumps(record)
    print(line)
    with open(os.path.join(root, "BENCH_ORGANIC.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
