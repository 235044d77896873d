"""Z-ORDER clustering rewrite (Lake.optimize_zorder): multi-column
scan-pruning maintenance.

The measurable contract: after clustering on (x, y), every output
file/row-group's min-max extent is a small fraction of BOTH columns'
domains — that is exactly the footer-stats property Parquet readers
(Spark, DuckDB, Trino) prune on. A linear sort delivers it for the
leading column only; z-order delivers it for all clustering columns
simultaneously. Pinned here against pyarrow-read footer stats, plus
full content preservation and the loud-failure guards.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.sources.lake import Lake

N = 40_000
DOMAIN = 10_000


def _mk(spark, lakedir: str, table: str) -> Lake:
    """A table of two INDEPENDENT pseudo-uniform columns in
    [0, DOMAIN), written in hash-shuffled (i.e. unclustered) order."""
    lake = Lake(spark, lakedir)
    df = (
        spark.range(N)
        .withColumn("x", F.pmod(F.hash(F.col("id") * 2 + 1), F.lit(DOMAIN)))
        .withColumn("y", F.pmod(F.hash(F.col("id") * 3 + 7), F.lit(DOMAIN)))
        .repartition(16)
    )
    df.write.mode("overwrite").parquet(lake.path(table))
    return lake


def _extents(path: str, col: str) -> list[float]:
    """Per-row-group (min,max) extent of `col` as a fraction of its
    domain, straight from the Parquet footers."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pf = pq.ParquetFile(f)
        ci = pf.schema_arrow.get_field_index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(ci).statistics
            out.append((st.max - st.min) / DOMAIN)
    return out


def _mean(xs: list[float]) -> float:
    return sum(xs) / len(xs)


def test_zorder_bounds_every_clustering_column(spark, tmp_path):
    lake = _mk(spark, str(tmp_path), "t")
    before_x = _mean(_extents(lake.path("t"), "x"))
    before_y = _mean(_extents(lake.path("t"), "y"))
    # hash-shuffled: every file spans ~the whole domain on both axes
    assert before_x > 0.9 and before_y > 0.9

    total = spark.read.parquet(lake.path("t"))
    before_rows = total.count()
    before_sum = total.agg(F.sum("x"), F.sum("y"), F.sum("id")).collect()[0]

    # 64 files over a 64x64 z-grid: each file holds a ~64-cell Morton
    # run, i.e. roughly an (aligned) 8x8 cell block -> per-dim extent
    # ~0.125-0.25 of the domain, vs ~1.0 unclustered
    lake.optimize_zorder("t", ["x", "y"], bits=6, n_files=64)

    after = spark.read.parquet(lake.path("t"))
    assert after.count() == before_rows
    assert after.agg(F.sum("x"), F.sum("y"), F.sum("id")).collect()[0] == before_sum

    xs = _extents(lake.path("t"), "x")
    ys = _extents(lake.path("t"), "y")
    ex, ey = _mean(xs), _mean(ys)
    # BOTH columns' per-row-group extents collapse, and the 2D area a
    # row group covers (the fraction of the table a two-predicate
    # scan must read) drops from ~100% to a few percent
    assert ex < 0.35 and ey < 0.35, (ex, ey)
    assert _mean([a * b for a, b in zip(xs, ys)]) < 0.08


def test_linear_sort_bounds_only_the_leading_column(spark, tmp_path):
    """The motivating contrast: sorting by x alone leaves y's
    extents at ~domain width, so a y-predicate scan reads everything
    — z-order (above) bounds both."""
    lake = _mk(spark, str(tmp_path), "t")
    df = (
        spark.read.parquet(lake.path("t"))
        .repartitionByRange(16, "x")
        .sortWithinPartitions("x")
    )
    out = lake.path("t") + "._lin"
    df.write.mode("overwrite").parquet(out)
    assert _mean(_extents(out, "x")) < 0.2
    assert _mean(_extents(out, "y")) > 0.9


def test_zorder_filter_results_unchanged(spark, tmp_path):
    lake = _mk(spark, str(tmp_path), "t")
    pred = (F.col("x") < 500) & (F.col("y") >= 9000)
    want = sorted(
        r.id for r in spark.read.parquet(lake.path("t")).filter(pred).collect()
    )
    lake.optimize_zorder("t", ["x", "y"], bits=6, n_files=16)
    got = sorted(
        r.id for r in spark.read.parquet(lake.path("t")).filter(pred).collect()
    )
    assert got == want and len(got) > 0


def test_zorder_loud_failures(spark, tmp_path):
    lake = Lake(spark, str(tmp_path))
    df = spark.range(10).withColumn("s", F.col("id").cast("string"))
    df.write.mode("overwrite").parquet(lake.path("t"))
    with pytest.raises(ValueError, match="not numeric"):
        lake.optimize_zorder("t", ["s"])
    with pytest.raises(ValueError, match="at least one column"):
        lake.optimize_zorder("t", [])
    with pytest.raises(ValueError, match="63-bit"):
        lake.optimize_zorder("t", ["id", "id", "id", "id"], bits=16)


def test_zorder_skewed_column_still_spreads(spark, tmp_path):
    """Equi-depth bucketing (approxQuantile), not equi-width: a
    heavily skewed column must still spread across z buckets instead
    of collapsing into one."""
    lake = Lake(spark, str(tmp_path))
    df = (
        spark.range(N)
        # 90% of mass in [0, 100), tail up to DOMAIN
        .withColumn(
            "x",
            F.when(
                F.pmod(F.hash("id"), F.lit(10)) < 9,
                F.pmod(F.hash(F.col("id") + 1), F.lit(100)),
            ).otherwise(F.pmod(F.hash(F.col("id") + 2), F.lit(DOMAIN))),
        )
        .withColumn("y", F.pmod(F.hash(F.col("id") * 3 + 7), F.lit(DOMAIN)))
        .repartition(16)
    )
    df.write.mode("overwrite").parquet(lake.path("t"))
    lake.optimize_zorder("t", ["x", "y"], bits=6, n_files=16)
    # the dense region [0, 100) must not all land in one row group:
    # count row groups whose x-range intersects it
    hit = 0
    for f in glob.glob(os.path.join(lake.path("t"), "*.parquet")):
        pf = pq.ParquetFile(f)
        ci = pf.schema_arrow.get_field_index("x")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(ci).statistics
            if st.min < 100:
                hit += 1
    assert hit >= 4, hit
    # and y stays bounded even with x skewed
    assert _mean(_extents(lake.path("t"), "y")) < 0.5
