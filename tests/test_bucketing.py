"""Bucketed-table co-location (SURVEY §4 scale lever): a bucket-
aligned equi-join must plan with NO shuffle exchange on either side,
and must return exactly the rows the shuffled join returns."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fxa_activity_metrics_spark.sources.lake import Lake


def _mk_activity(spark, n_users=50, days=5):
    rows = []
    for u in range(n_users):
        for d in range(days):
            rows.append(
                (f"u{u}", dt.date(2024, 6, 1 + d), f"dev{(u + d) % 3}")
            )
    return spark.createDataFrame(rows, "uid string, day date, device string")


def test_bucketed_self_join_has_no_exchange(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    df = _mk_activity(spark)
    lake.write_bucketed("activity_bucketed", df, ["uid"], 8, sort_cols=["uid"])
    t = lake.read_bucketed("activity_bucketed")

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = t.select(F.col("uid"), F.col("day").alias("day_a"))
        b = t.select(F.col("uid").alias("b_uid"), F.col("day").alias("day_b"))
        joined = a.join(b, a["uid"] == b["b_uid"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        # equality vs the shuffled (path-read) join
        p = spark.read.parquet(lake.path("activity_bucketed"))
        pa = p.select(F.col("uid"), F.col("day").alias("day_a"))
        pb = p.select(F.col("uid").alias("b_uid"), F.col("day").alias("day_b"))
        expected = sorted(map(tuple, pa.join(pb, pa["uid"] == pb["b_uid"]).collect()))
        got = sorted(map(tuple, joined.collect()))
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_bucketed_groupby_has_no_exchange(spark, tmp_path):
    """Aggregation on the bucket key also skips the exchange."""
    lake = Lake(spark, str(tmp_path / "lake"))
    lake.write_bucketed("activity_bucketed", _mk_activity(spark), ["uid"], 8)
    t = lake.read_bucketed("activity_bucketed")
    agg = t.groupBy("uid").agg(F.countDistinct("device").alias("n_devices"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert agg.count() == 50


def test_path_readers_still_work_and_analyze_runs(spark, tmp_path):
    """The bucketed table is external: the plain path read sees the
    same rows (minus co-location), and ANALYZE computes stats."""
    lake = Lake(spark, str(tmp_path / "lake"))
    df = _mk_activity(spark)
    lake.write_bucketed("activity_bucketed", df, ["uid"], 8)
    assert spark.read.parquet(lake.path("activity_bucketed")).count() == df.count()
    lake.analyze("activity_bucketed")
    desc = spark.sql(
        f"DESCRIBE TABLE EXTENDED {lake._catalog_name('activity_bucketed')}"
    ).collect()
    stats = [r for r in desc if r["col_name"] == "Statistics"]
    assert stats, "ANALYZE must attach table statistics"
