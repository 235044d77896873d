"""Measure Lake.optimize_zorder on the lake's REAL keys: a
day-partitioned activity-like table clustered per-partition on
(timestamp, uid) — the reference's SORTKEY/DISTKEY pair
(import_events.py:62, import_activity_events.py:8) — using the r12
DATE/TIMESTAMP/STRING surrogate support. Writes
ZORDER_ACTIVITY_SKIP.json.

Layouts compared (same rows, same day= partition dirs):
- ``asloaded``: what write_days produces — sortWithinPartitions on
  timestamp (the classic single SORTKEY). Time-slice scans prune;
  uid-equality scans read every row group.
- ``zorder``: optimize_zorder(["timestamp", "uid"]) per partition.
  BOTH axes' per-row-group extents collapse, so uid point lookups
  (the multi-device / device-flow join probes) and combined
  uid+time-window scans skip most row groups, while time-slice scans
  stay pruned.

The uid surrogate is order-preserving (leading-7-byte rank, not a
hash), so the parquet footer min/max on the STRING column itself is
what delivers the skipping — verified here by reading the footers
and timing both engines that prune on them (Spark, DuckDB).

Usage: python tools/zorder_activity_bench.py [n_rows] [n_days]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fxa_activity_metrics_spark.session import get_spark  # noqa: E402
from fxa_activity_metrics_spark.sources.lake import Lake  # noqa: E402

N_USERS = 100_000
DAY0 = "2021-03-01"
# deterministic probe uids (md5 of small ints, guaranteed present)
PROBE_UIDS = [7, 1234, 55555, 90001, 31415]
# 1%-of-day time windows (start second within the day)
WINDOWS = [(3600, 864), (43200, 864), (79200, 864)]


def ts_extent(root: str) -> float:
    """Mean per-row-group timestamp extent as a fraction of one day,
    across all day partitions."""
    vals = []
    for f in glob.glob(os.path.join(root, "day=*", "*.parquet")):
        pf = pq.ParquetFile(f)
        ci = pf.schema_arrow.get_field_index("timestamp")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(ci).statistics
            if st is None:  # INT96 legacy writes carry no stats
                vals.append(1.0)
                continue
            vals.append((st.max - st.min).total_seconds() / 86_400)
    return round(sum(vals) / len(vals), 4)


def uid_extent(root: str) -> float:
    """Mean per-row-group uid extent as a fraction of the hex domain
    (7-char prefix as a base-16 integer)."""
    vals = []
    for f in glob.glob(os.path.join(root, "day=*", "*.parquet")):
        pf = pq.ParquetFile(f)
        ci = pf.schema_arrow.get_field_index("uid")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(ci).statistics
            vals.append((int(st.max[:7], 16) - int(st.min[:7], 16)) / 16**7)
    return round(sum(vals) / len(vals), 4)


def time_spark(spark, root: str, mode: str) -> float:
    from pyspark.sql import functions as F
    import hashlib

    total = 0.0
    probes = (
        PROBE_UIDS if mode in ("uid", "both") else [PROBE_UIDS[0]]
    )
    for i, u in enumerate(probes):
        uid = hashlib.md5(str(u).encode()).hexdigest()
        cond = F.lit(True)
        if mode in ("uid", "both"):
            cond = F.col("uid") == uid
        if mode in ("time", "both"):
            s, w = WINDOWS[i % len(WINDOWS)]
            lo = F.to_timestamp(F.lit(DAY0)) + F.expr(f"INTERVAL {s} SECONDS")
            hi = F.to_timestamp(F.lit(DAY0)) + F.expr(
                f"INTERVAL {s + w} SECONDS"
            )
            cond = cond & (F.col("timestamp") >= lo) & (F.col("timestamp") < hi)
        per = []
        for _ in range(2):
            t0 = time.perf_counter()
            spark.read.parquet(root).filter(cond).agg(
                F.count("*"), F.sum("v")
            ).collect()
            per.append(time.perf_counter() - t0)
        total += min(per)
    return round(total, 3)


def time_duckdb(root: str, mode: str) -> float:
    import hashlib

    con = duckdb.connect()
    con.execute("SET threads=32")
    total = 0.0
    probes = (
        PROBE_UIDS if mode in ("uid", "both") else [PROBE_UIDS[0]]
    )
    for i, u in enumerate(probes):
        uid = hashlib.md5(str(u).encode()).hexdigest()
        where = []
        if mode in ("uid", "both"):
            where.append(f"uid = '{uid}'")
        if mode in ("time", "both"):
            s, w = WINDOWS[i % len(WINDOWS)]
            where.append(
                f"timestamp >= TIMESTAMP '{DAY0} 00:00:00' "
                f"+ INTERVAL {s} SECOND"
            )
            where.append(
                f"timestamp < TIMESTAMP '{DAY0} 00:00:00' "
                f"+ INTERVAL {s + w} SECOND"
            )
        per = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(
                f"SELECT count(*), sum(v) FROM "
                f"read_parquet('{root}/day=*/*.parquet', "
                f"hive_partitioning=1) WHERE {' AND '.join(where)}"
            ).fetchall()
            per.append(time.perf_counter() - t0)
        total += min(per)
    con.close()
    return round(total, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # 4 MB row groups: at bench scale a whole day fits one default
    # (128 MB) row group, which hides intra-day pruning entirely; at
    # 100 TB a day partition is THOUSANDS of row groups, and granular
    # row groups are what footer-stat skipping operates on. This
    # models that ratio honestly instead of benchmarking a 1-row-group
    # degenerate layout.
    spark = get_spark(
        "zorder-activity-bench",
        extra_conf={"spark.hadoop.parquet.block.size": str(4 * 1024 * 1024)},
    )
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="zorder_act_")
    lake = Lake(spark, tmp)
    base = (
        spark.range(n)
        .withColumn("day", F.date_add(F.lit(DAY0),
                                      (F.col("id") % n_days).cast("int")))
        .withColumn(
            "timestamp",
            (F.unix_timestamp(F.col("day").cast("timestamp"))
             + F.pmod(F.hash(F.col("id") * 5 + 3), F.lit(86_400))
             ).cast("timestamp"),
        )
        .withColumn(
            "uid",
            F.md5(F.pmod(F.hash(F.col("id") * 7 + 1),
                         F.lit(N_USERS)).cast("string")),
        )
        .withColumn("v", (F.col("id") % 997).cast("double"))
    )
    # asloaded layout: write_days = dynamic overwrite + timestamp sort
    lake.write_days("asloaded", base)
    # z-ordered layout: same data, per-partition (timestamp, uid)
    shutil.copytree(lake.path("asloaded"), lake.path("zorder"))
    t0 = time.perf_counter()
    lake.optimize_zorder("zorder", ["timestamp", "uid"], bits=8, n_files=8)
    zorder_sec = round(time.perf_counter() - t0, 3)

    out: dict = {
        "n_rows": n,
        "n_days": n_days,
        "n_users": N_USERS,
        "keys": ["timestamp", "uid"],
        "zorder_rewrite_sec": zorder_sec,
        "layouts": {},
    }
    for layout in ("asloaded", "zorder"):
        p = lake.path(layout)
        out["layouts"][layout] = {
            # uid point lookups across all days — DISTKEY-probe shape
            "spark_sec_uid": time_spark(spark, p, "uid"),
            "duckdb_sec_uid": time_duckdb(p, "uid"),
            # 1%-of-day time slices — SORTKEY shape (must not regress)
            "spark_sec_time": time_spark(spark, p, "time"),
            "duckdb_sec_time": time_duckdb(p, "time"),
            # combined uid + time window
            "spark_sec_both": time_spark(spark, p, "both"),
            "duckdb_sec_both": time_duckdb(p, "both"),
            "mean_rg_extent_timestamp": ts_extent(p),
            "mean_rg_extent_uid": uid_extent(p),
        }
    shutil.rmtree(tmp)
    spark.stop()
    line = json.dumps(out)
    print(line)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "ZORDER_ACTIVITY_SKIP.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
