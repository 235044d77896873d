"""Lake maintenance (S7 compaction, S8 targeted delete) + seeded
property checks for the fidelity-critical scalar logic + the skew
salting fallback."""

from __future__ import annotations

import datetime as dt
import glob
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fxa_activity_metrics_spark.functions.core import cohort_bucket
from fxa_activity_metrics_spark.functions.skew import salted_join
from fxa_activity_metrics_spark.sources.lake import Lake, _add_months


def _mk_events(spark, n_days=2, rows_per_day=40):
    rows = []
    for d in range(n_days):
        day = dt.date(2024, 5, 1) + dt.timedelta(days=d)
        for i in range(rows_per_day):
            rows.append((dt.datetime(2024, 5, 1 + d, 8, 0, i % 60), f"u{i%7}", day))
    return spark.createDataFrame(rows, "timestamp timestamp, uid string, day date")


def test_compaction_preserves_data(spark, tmp_path):
    """S7: compact rewrites each day partition to one sorted file with
    identical content."""
    lake = Lake(spark, str(tmp_path / "lake"))
    df = _mk_events(spark)
    # write each day fragmented into many files
    lake.write_days("t", df.repartition(8))
    frag = glob.glob(str(tmp_path / "lake/t/day=*/*.parquet"))
    before = sorted(map(str, lake.read("t").collect()))
    lake.compact("t")
    after_files = glob.glob(str(tmp_path / "lake/t/day=*/*.parquet"))
    assert len(after_files) == 2 and len(after_files) < max(len(frag), 3)
    assert sorted(map(str, lake.read("t").collect())) == before


def test_delete_where_drops_empty_partitions(spark, tmp_path):
    """S8: anti-filter rewrite; partitions whose rows all die are
    dropped entirely."""
    lake = Lake(spark, str(tmp_path / "lake2"))
    df = _mk_events(spark)
    lake.write_days("t", df)
    days = lake.days("t")
    lake.delete_where("t", F.col("day") == F.lit(str(days[0])).cast("date"), days)
    assert lake.days("t") == [days[1]]
    lake.delete_where("t", F.col("uid") == "u0", [days[1]])
    assert lake.read("t").filter(F.col("uid") == "u0").count() == 0
    assert lake.read("t").count() > 0


def test_add_months_matches_spark(spark):
    """The pure-Python retention arithmetic must agree with Spark's
    add_months (month-end clamping included) — seeded sweep."""
    rng = random.Random(42)
    dates = [dt.date(2020, 1, 1) + dt.timedelta(days=rng.randrange(0, 3000)) for _ in range(300)]
    dates += [dt.date(2024, 1, 31), dt.date(2024, 3, 31), dt.date(2023, 12, 31), dt.date(2024, 2, 29)]
    months = [-24, -6, -3, -1, 1, 3]
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    for m in months:
        got = {r["d"]: r["x"] for r in df.select("d", F.add_months("d", m).alias("x")).collect()}
        for d in dates:
            assert got[d] == _add_months(d, m), (d, m)


def test_cohort_bucket_matches_python_model(spark):
    """cohort rule: first SEVEN hex chars, hex→int, % 100
    (import_events.py:114 — the FROM 0 FOR 8 off-by-one)."""
    rng = random.Random(7)
    ids = ["%064x" % rng.getrandbits(256) for _ in range(500)]
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    got = {r["id"]: r["b"] for r in df.select("id", cohort_bucket("id").alias("b")).collect()}
    for i in ids:
        assert got[i] == int(i[:7], 16) % 100, i


def test_salted_join_matches_plain_join(spark):
    """Salting only redistributes — the result multiset is identical
    to the unsalted join, for inner and left."""
    rng = random.Random(11)
    # skewed: 80% of rows share one key
    big = spark.createDataFrame(
        [(("hot" if rng.random() < 0.8 else f"k{rng.randrange(20)}"), i) for i in range(2000)],
        "k string, v long",
    )
    dim = spark.createDataFrame(
        [(f"k{j}", f"name{j}") for j in range(15)] + [("hot", "hotname")],
        "k string, name string",
    )
    for how in ("inner", "left"):
        plain = sorted(map(str, big.join(dim, "k", how).collect()))
        salted = sorted(map(str, salted_join(big, dim, "k", n_salts=8, how=how).collect()))
        assert salted == plain, how
