"""Isolated per-query timing (noop sink, min of N runs) for A/B
comparison during optimization. Usage:

    python tools/time_queries.py [sf_dir] query [query ...]

Prints one line per query: steady-state (min), all runs, and the
Python-side build time of the last run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fxa_activity_metrics_spark.session import get_spark  # noqa: E402
from fxa_activity_metrics_spark import cacheutil  # noqa: E402

N_RUNS = int(os.environ.get("SPARK_GRAFT_TIME_RUNS", "3"))


def main() -> None:
    import __spark_entry__ as entrymod

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    spark = get_spark("fxa-time")
    qs = entrymod.all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in args:
        fn = qs[name]
        runs = []
        build = 0.0
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            cacheutil.release_all()
        print(
            f"{name:<30} min={min(runs):6.3f} build={build:5.2f} "
            f"runs={[round(r, 2) for r in runs]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
