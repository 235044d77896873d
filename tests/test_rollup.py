"""Sketch rollups (operators/rollup.py): estimate quality vs the
exact twin, lossless merge invariants, incremental day maintenance,
and partition-pruned range reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators import rollup
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.sources.testdata import read_table

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def lake(spark, tmp_path):
    return Lake(spark, str(tmp_path / "lake"))


def _events(spark):
    return read_table(spark, SF, "events")


def _span(spark):
    r = _events(spark).agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    ).first()
    return r.lo, r.hi


def test_estimate_close_to_exact(spark, lake):
    ev = _events(spark)
    lo, hi = _span(spark)
    rollup.build_daily_sketches(lake, ev)
    est = rollup.range_uniques(lake, lo, hi).first()
    exact = rollup.range_uniques_exact(ev, lo, hi).first().uniques
    assert est.n_days == lake.read(rollup.SKETCH_TABLE).count()
    assert est.uniques_est == pytest.approx(exact, rel=0.05)


def test_union_of_days_equals_direct_range_sketch(spark, lake):
    """HLL unions at equal lg_k are lossless: merging per-day
    sketches must give the same estimate as sketching the raw range
    in one pass."""
    ev = _events(spark)
    lo, hi = _span(spark)
    rollup.build_daily_sketches(lake, ev)
    merged = rollup.range_uniques(lake, lo, hi).first().uniques_est
    direct = (
        ev.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
            ).alias("e")
        ).first().e
    )
    assert merged == direct


def test_incremental_day_append_and_idempotence(spark, lake):
    ev = _events(spark)
    lo, hi = _span(spark)
    days = sorted(r.d for r in ev.select(F.to_date("ts").alias("d")).distinct().collect())
    head, tail = days[:-1], days[-1]
    rollup.build_daily_sketches(
        lake, ev.where(F.to_date("ts") != F.lit(tail))
    )
    assert lake.read(rollup.SKETCH_TABLE).count() == len(head)
    # the new day arrives: only its row is added
    rollup.build_daily_sketches(
        lake, ev.where(F.to_date("ts") == F.lit(tail))
    )
    full = rollup.range_uniques(lake, lo, hi).first()
    assert full.n_days == len(days)
    # replaying the last day is idempotent
    rollup.build_daily_sketches(
        lake, ev.where(F.to_date("ts") == F.lit(tail))
    )
    again = rollup.range_uniques(lake, lo, hi).first()
    assert again.uniques_est == full.uniques_est
    # and equals the one-shot build
    rollup.build_daily_sketches(lake, ev)
    oneshot = rollup.range_uniques(lake, lo, hi).first()
    assert oneshot.uniques_est == full.uniques_est


def test_range_read_is_partition_pruned(spark, lake):
    ev = _events(spark)
    rollup.build_daily_sketches(lake, ev)
    days = sorted(r.d for r in ev.select(F.to_date("ts").alias("d")).distinct().collect())
    sub = rollup.range_uniques(lake, days[1], days[2])
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    assert sub.first().n_days == 2
    # subrange estimate is bounded by the full-range estimate
    full = rollup.range_uniques(lake, days[0], days[-1]).first()
    assert sub.first().uniques_est <= full.uniques_est


def test_unpopulated_range_estimates_zero(spark, lake):
    rollup.build_daily_sketches(lake, _events(spark))
    r = rollup.range_uniques(lake, "2030-01-01", "2030-01-02").first()
    assert r.n_days == 0 and r.uniques_est == 0
