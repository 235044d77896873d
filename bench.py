"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: reference-parity spine + the scale-path extension ops
BENCH_QUERIES = [
    "pricing_summary",
    "order_revenue",
    "nation_revenue",
    "daily_activity_per_device",
    "multi_device_users_join",
    "multi_device_users_window",
    "flow_sessionize",
    "asof_join",
    "session_window",
    "daily_uniques_hll",
    "value_percentiles",
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
    "embedding_neardup_lsh",
    "injection_filter",
    "empty_backfill",
    "text_quality",
    "language_id",
    "fingerprint",
    "winnow_fingerprint",
    "token_histogram",
    "token_count_bpe",
    "blob_stats",
]


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark("fxa-bench")
    qs = entrymod.queries()
    # warmup: JVM/codegen spin-up on a trivial job
    spark.range(1000).selectExpr("sum(id)").collect()

    # Three timed runs per query: the first pays one-time whole-stage
    # codegen / JIT compilation (~1-3s per distinct plan shape, a
    # per-process constant that vanishes at any real scale); the min
    # of the later runs is the steady-state execution time (two
    # steady samples damp scheduler/GC noise on a shared machine).
    # `queries`/`value` report steady state; `cold_value` keeps the
    # first-run sum.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        per_run = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            per_run.append(time.perf_counter() - t0)
        cold[name] = round(per_run[0], 3)
        timings[name] = round(min(per_run), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline-suite wall clock (sum of per-query sec, steady-state)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "cold_value": round(sum(cold.values()), 3),
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
