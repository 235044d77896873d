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
    df = spark.range(10).withColumn("a", F.array(F.col("id")))
    df.write.mode("overwrite").parquet(lake.path("t"))
    with pytest.raises(ValueError, match="supported: numeric"):
        lake.optimize_zorder("t", ["a"])
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


# ---------------------------------------------------------------------------
# r12 additions: partitioned tables, non-numeric keys, crash-safe swap
# (VERDICT r11 items 3-5)
# ---------------------------------------------------------------------------

import datetime as dt

from pyspark.sql import types as T
from fxa_activity_metrics_spark.sources.lake import _hidden_sibling, _swap_dir


def _mk_activity(spark, lakedir: str, n_days: int = 3, per_day: int = 8_000):
    """A day-partitioned activity-like table: the reference's
    SORTKEY/DISTKEY pair (timestamp, uid) as real TIMESTAMP/STRING
    columns (import_events.py:62, import_activity_events.py:8)."""
    lake = Lake(spark, lakedir)
    df = (
        spark.range(n_days * per_day)
        .withColumn("day", F.date_add(F.lit("2021-03-01"),
                                      (F.col("id") % n_days).cast("int")))
        .withColumn(
            "timestamp",
            (F.unix_timestamp(F.col("day").cast("timestamp"))
             + F.pmod(F.hash(F.col("id") * 5 + 3), F.lit(86_400))
             ).cast("timestamp"),
        )
        .withColumn("uid", F.md5((F.col("id") % 500).cast("string")))
        .withColumn("v", (F.col("id") % 997).cast("double"))
        .repartition(16)
    )
    lake.write_days("t", df)
    return lake


def test_zorder_partitioned_preserves_day_layout(spark, tmp_path):
    """The r11 hazard: z-ordering a day-partitioned table must NOT
    flatten the day= directory layout — expire/compact/write_days all
    manipulate those dirs. Per-partition rewrite keeps them."""
    lake = _mk_activity(spark, str(tmp_path))
    before_days = lake.days("t")
    assert len(before_days) == 3
    total = lake.read("t")
    before_rows = total.count()
    before_sum = total.agg(F.sum("v")).collect()[0][0]

    lake.optimize_zorder("t", ["timestamp", "uid"], bits=6, n_files=8)

    # layout preserved: same day= dirs, days() still resolves
    assert lake.days("t") == before_days
    for day in before_days:
        assert os.path.isdir(
            os.path.join(lake.path("t"), f"day={day.isoformat()}"))
    after = lake.read("t")
    assert after.count() == before_rows
    assert abs(after.agg(F.sum("v")).collect()[0][0] - before_sum) < 1e-6
    # and the downstream maintenance ops still work on the layout
    lake.drop_part("t", "day", before_days[0])
    assert lake.days("t") == before_days[1:]


def test_zorder_partition_column_clash_raises(spark, tmp_path):
    lake = _mk_activity(spark, str(tmp_path))
    with pytest.raises(ValueError, match="partition columns"):
        lake.optimize_zorder("t", ["day", "uid"])


def test_zorder_string_key_keeps_stats_selective(spark, tmp_path):
    """String clustering must be ORDER-PRESERVING (rank on the
    leading bytes), not hash-based: the footer min/max on the original
    string column stays narrow per row group, so uid-equality scans
    prune. Verified straight from the parquet footers."""
    lake = Lake(spark, str(tmp_path))
    n = 40_000
    df = (
        spark.range(n)
        .withColumn("uid", F.md5((F.col("id") % 2_000).cast("string")))
        .withColumn("x", F.pmod(F.hash(F.col("id") * 2 + 1), F.lit(DOMAIN)))
        .repartition(16)
    )
    df.write.mode("overwrite").parquet(lake.path("t"))

    def uid_extent(path: str) -> float:
        """mean per-row-group uid range, as a fraction of the hex
        domain, via the 7-char prefix as a base-16 integer."""
        vals = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            pf = pq.ParquetFile(f)
            ci = pf.schema_arrow.get_field_index("uid")
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(ci).statistics
                lo = int(st.min[:7], 16)
                hi = int(st.max[:7], 16)
                vals.append((hi - lo) / 16**7)
        return sum(vals) / len(vals)

    assert uid_extent(lake.path("t")) > 0.9  # shuffled: spans the domain
    lake.optimize_zorder("t", ["uid", "x"], bits=6, n_files=16)
    after = uid_extent(lake.path("t"))
    assert after < 0.35, after
    # content preserved
    got = spark.read.parquet(lake.path("t"))
    assert got.count() == n
    assert got.select("uid").distinct().count() == 2_000


def test_zorder_string_surrogate_is_byte_order_preserving(spark):
    """The string surrogate must rank by BYTE order for variable-length
    and non-ASCII keys: without zero-right-padding 'z' (one byte 0x7A)
    would rank below 'abc' (0x616263), and a character-based 7-char
    slice of a non-ASCII key can exceed 7 BYTES and overflow conv's
    64-bit range, saturating those rows into one bucket (the silent
    zone-map-killer class). Pinned directly against Python byte order."""
    keys = [
        "", "a", "z", "abc", "abcdefgh", "abd", "zz",
        "münchen", "éclair", "中文键",
        "\U0001f600emoji", "zzzzzzzz", "a" * 20,
    ]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    sur = Lake._zorder_surrogate("k", T.StringType())
    got = {r["k"]: r["s"] for r in df.select("k", sur.alias("s")).collect()}
    # no saturation/NULL: every key maps to a finite surrogate
    assert all(got[k] is not None for k in keys)
    assert all(got[k] < float(1 << 56) for k in keys)
    # byte order preserved: for every pair, surrogate order must agree
    # with UTF-8 byte order unless one 7-byte prefix is a prefix of the
    # other (those tie into one bucket by design)
    for a in keys:
        for b in keys:
            pa, pb = a.encode()[:7], b.encode()[:7]
            if pa == pb or pa == pb[: len(pa)] or pb == pa[: len(pb)]:
                continue
            assert (got[a] < got[b]) == (pa < pb), (a, b, got[a], got[b])


def test_zorder_all_null_column_skips_dimension(spark, tmp_path):
    """An entirely-NULL clustering column in one directory (reachable
    since per-partition rewrites scan single days) must not blow up or
    silently degrade the OTHER dimensions: the NULL dimension is
    skipped with a warning and the non-NULL key still clusters."""
    lake = Lake(spark, str(tmp_path))
    n = 20_000
    df = (
        spark.range(n)
        .withColumn("x", F.pmod(F.hash(F.col("id") * 2 + 1), F.lit(DOMAIN)))
        .withColumn("dead", F.lit(None).cast("double"))
        .repartition(8)
    )
    df.write.mode("overwrite").parquet(lake.path("t"))
    with pytest.warns(UserWarning, match="entirely NULL"):
        lake.optimize_zorder("t", ["x", "dead"], bits=6, n_files=16)
    after = spark.read.parquet(lake.path("t"))
    assert after.count() == n
    # x still clusters despite the dead dimension
    assert _mean(_extents(lake.path("t"), "x")) < 0.35


def test_zorder_date_and_timestamp_keys(spark, tmp_path):
    """DATE ranks on epoch day, TIMESTAMP on epoch seconds — both
    order-preserving, so the reference's SORTKEY columns cluster."""
    lake = Lake(spark, str(tmp_path))
    n = 20_000
    df = (
        spark.range(n)
        .withColumn("d", F.date_add(F.lit("2021-01-01"),
                                    F.pmod(F.hash("id"), F.lit(365)).cast("int")))
        .withColumn(
            "ts",
            (F.lit(1_600_000_000)
             + F.pmod(F.hash(F.col("id") + 9), F.lit(10_000_000))
             ).cast("timestamp"),
        )
        .repartition(16)
    )
    df.write.mode("overwrite").parquet(lake.path("t"))
    before = spark.read.parquet(lake.path("t"))
    want = before.agg(F.min("d"), F.max("d"), F.min("ts"), F.max("ts"),
                      F.count("*")).collect()[0]
    lake.optimize_zorder("t", ["d", "ts"], bits=6, n_files=16)
    after = spark.read.parquet(lake.path("t"))
    assert after.agg(F.min("d"), F.max("d"), F.min("ts"), F.max("ts"),
                     F.count("*")).collect()[0] == want

    # per-row-group date extents collapse (epoch-day fraction of 365)
    vals = []
    for f in glob.glob(os.path.join(lake.path("t"), "*.parquet")):
        pf = pq.ParquetFile(f)
        ci = pf.schema_arrow.get_field_index("d")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(ci).statistics
            vals.append((st.max - st.min).days / 365)
    assert sum(vals) / len(vals) < 0.35


def test_swap_dir_promotes_and_cleans(tmp_path):
    live = str(tmp_path / "live")
    tmp = str(tmp_path / "tmp")
    os.makedirs(live); os.makedirs(tmp)
    open(os.path.join(live, "old.txt"), "w").write("old")
    open(os.path.join(tmp, "new.txt"), "w").write("new")
    _swap_dir(live, tmp)
    assert os.path.exists(os.path.join(live, "new.txt"))
    assert not os.path.exists(os.path.join(live, "old.txt"))
    assert not os.path.exists(tmp)
    assert not os.path.exists(_hidden_sibling(live, "._old_swap"))
    # works when live doesn't exist yet (first write)
    os.makedirs(tmp)
    open(os.path.join(tmp, "n2.txt"), "w").write("n2")
    live2 = str(tmp_path / "live2")
    _swap_dir(live2, tmp)
    assert os.path.exists(os.path.join(live2, "n2.txt"))


def test_swap_dir_stale_trash_from_prior_crash_is_replaced(tmp_path):
    """A crash AFTER the rotate but before the promote leaves
    ._old_swap holding the previous table; the next swap must clear
    it and still promote."""
    live = str(tmp_path / "live")
    tmp = str(tmp_path / "tmp")
    trash = _hidden_sibling(live, "._old_swap")
    os.makedirs(live); os.makedirs(tmp); os.makedirs(trash)
    open(os.path.join(trash, "stale.txt"), "w").write("stale")
    open(os.path.join(live, "cur.txt"), "w").write("cur")
    open(os.path.join(tmp, "new.txt"), "w").write("new")
    _swap_dir(live, tmp)
    assert os.path.exists(os.path.join(live, "new.txt"))
    assert not os.path.exists(trash)


def test_zorder_ignores_crash_leftover_temp_dirs(spark, tmp_path):
    """A crash can leave hidden .day=X._zorder / .day=X._old_swap
    dirs in the table root; Spark readers skip dot-prefixed paths,
    and the partition detection must not cluster or promote them as
    partitions either."""
    lake = _mk_activity(spark, str(tmp_path), n_days=2, per_day=2_000)
    stale = _hidden_sibling(
        os.path.join(lake.path("t"), "day=2021-03-01"), "._zorder")
    os.makedirs(stale)
    open(os.path.join(stale, "junk.txt"), "w").write("stale")
    # dot-prefixed leftovers are invisible to readers: this scan
    # would die with CANNOT_READ_FILE_FOOTER if the dir were visible
    before = lake.read("t").count()
    lake.optimize_zorder("t", ["timestamp", "uid"], bits=4, n_files=2)
    assert lake.read("t").count() == before
    assert len(lake.days("t")) == 2
    # the rewrite of that partition re-used (and so reclaimed) the
    # stale temp path; the junk was never promoted into the partition
    assert not os.path.exists(os.path.join(stale, "junk.txt"))
    part = os.path.join(lake.path("t"), "day=2021-03-01")
    assert not any("junk" in f for f in os.listdir(part))
