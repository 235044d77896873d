"""Sketch-operator tolerance floors: HLL distinct counts within the
configured rsd of exact, GK percentiles within rank tolerance — the
approximate aggregates carry no SQL oracle, so these tests ARE their
correctness gate (exactness comes from the hash-verified
daily_uniques_exact / value_percentiles_exact counterparts)."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


def test_hll_within_tolerance(spark):
    approx = {
        r["day"]: r["uniques_hll"]
        for r in E.q_daily_uniques_hll(spark, SF).collect()
    }
    exact = {
        r["day"]: r["uniques"]
        for r in E.queries()["daily_uniques_exact"](spark, SF).collect()
    }
    assert approx and set(approx) == set(exact)
    for day, e in exact.items():
        assert e > 0
        rel_err = abs(approx[day] - e) / e
        assert rel_err <= 0.10, f"day {day}: HLL {approx[day]} vs exact {e}"


def test_percentile_sketch_within_tolerance(spark):
    approx = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in E.q_value_percentiles(spark, SF).collect()
    }
    exact = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in E.queries()["value_percentiles_exact"](spark, SF).collect()
    }
    assert approx and set(approx) == set(exact)
    for et, pcts in exact.items():
        for a, e in zip(approx[et], pcts):
            # GK with accuracy 10000 is near-exact at this scale;
            # allow 1% relative slack (values are positive doubles)
            assert abs(a - e) <= max(0.01 * abs(e), 1e-9), (et, a, e)


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from fxa_activity_metrics_spark.operators.rollup import (  # noqa: E402
    cms_build,
    cms_estimate,
    cms_merge,
)


def _keys(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "key string")


def test_cms_never_undercounts(spark):
    counts = {f"k{i}": (i % 7) + 1 for i in range(50)}
    df = _keys(spark, counts)
    cms = cms_build(df, "key", d=4, w=64)  # narrow width forces collisions
    probe = spark.createDataFrame([(k,) for k in counts], "key string")
    est = {r["key"]: r["est"] for r in cms_estimate(cms, probe, "key", d=4, w=64).collect()}
    for k, n in counts.items():
        assert est[k] >= n, (k, est[k], n)


def test_cms_exact_at_ample_width(spark):
    # with w >> distinct keys and 4 independent rows, collisions in
    # every row are overwhelmingly unlikely -> estimates are exact
    counts = {"a": 5, "b": 3, "c": 1}
    cms = cms_build(_keys(spark, counts), "key", d=4, w=1024)
    probe = spark.createDataFrame([("a",), ("b",), ("c",), ("nope",)], "key string")
    est = {r["key"]: r["est"] for r in cms_estimate(cms, probe, "key", d=4, w=1024).collect()}
    assert est == {"a": 5, "b": 3, "c": 1, "nope": 0}


def test_cms_merge_is_lossless(spark):
    c1 = {"a": 3, "b": 2}
    c2 = {"b": 4, "c": 1}
    merged = cms_merge(
        cms_build(_keys(spark, c1), "key", d=4, w=128),
        cms_build(_keys(spark, c2), "key", d=4, w=128),
    )
    both = cms_build(_keys(spark, {"a": 3, "b": 6, "c": 1}), "key", d=4, w=128)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, both.collect()))
    assert a == b


def test_cms_weight_col(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)], "key string, n int")
    cms = cms_build(df, "key", d=4, w=256, weight_col="n")
    probe = spark.createDataFrame([("a",), ("b",)], "key string")
    est = {r["key"]: r["est"] for r in cms_estimate(cms, probe, "key", d=4, w=256).collect()}
    assert est == {"a": 15, "b": 2}


def test_cms_sketch_size_bounded(spark):
    df = _keys(spark, {f"k{i}": 1 for i in range(500)})
    cms = cms_build(df, "key", d=4, w=32)
    assert cms.count() <= 4 * 32


def test_misra_gries_guarantees(spark):
    """Mergeable-MG bounds vs exact counts (Agarwal et al. 2012):
    est never overcounts, undercount ≤ n/(k+1) total, and every
    φ-frequent item (count > n/(k+1)) survives — under BOTH a 16-way
    and a 4-way partitioning (merge-invariance of the guarantee)."""
    from pyspark.sql import functions as F

    from fxa_activity_metrics_spark.operators.dedup import tokens
    from fxa_activity_metrics_spark.operators.rollup import (
        heavy_hitters_exact,
        misra_gries_topk,
    )
    from fxa_activity_metrics_spark.sources.testdata import read_table

    k = 48
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    for parts in (16, 4):
        items = (
            docs.repartition(parts, F.col("doc_id"))
            .sortWithinPartitions("doc_id")
            .select(F.explode(tokens("text")).alias("item"))
        )
        n_total = items.count()
        exact = {
            r["item"]: r["n"]
            for r in items.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        mg = {r["item"]: r["est"] for r in misra_gries_topk(items, "item", k=k).collect()}
        assert 0 < len(mg) <= k
        bound = n_total // (k + 1)
        for item, est in mg.items():
            assert est <= exact[item], (item, est, exact[item])
            assert exact[item] - est <= bound, (item, est, exact[item], bound)
        hh = {r["item"] for r in heavy_hitters_exact(items, "item", k=k).collect()}
        assert hh, "fixture must have φ-frequent items"
        assert hh <= set(mg), f"missing φ-frequent items: {hh - set(mg)}"


# --- KMV bottom-k distinct sketch ---------------------------------------


def _kmv_events(spark):
    from fxa_activity_metrics_spark.sources.testdata import read_table

    return read_table(spark, "/root/testdata/sf0.01", "events")


def test_kmv_merge_equals_direct_sketch(spark):
    """Union-merging per-day sketches must reproduce the bottom-k of
    the whole stream EXACTLY — KMV merge is lossless, not
    approximately so."""
    from fxa_activity_metrics_spark.operators.rollup import (
        kmv_daily_sketches,
        kmv_merge,
    )
    from pyspark.sql import functions as F

    ev = _kmv_events(spark)
    merged = kmv_merge(kmv_daily_sketches(ev, k=64), k=64).first()
    direct = (
        ev.select(F.md5(F.col("user_id").cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(64)
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
        .first()
    )
    assert merged["hs"] == direct["hs"]
    assert merged["n_kept"] == len(direct["hs"])


def test_kmv_estimate_within_tolerance_and_exact_below_k(spark):
    """(k-1)/u_k lands within the ~1/sqrt(k) KMV error band of the
    true distinct count; a sub-k stream is answered EXACTLY."""
    from fxa_activity_metrics_spark.operators.rollup import (
        kmv_daily_sketches,
        kmv_estimate,
        kmv_merge,
    )
    from pyspark.sql import functions as F

    ev = _kmv_events(spark)
    exact = ev.select("user_id").distinct().count()
    est = kmv_estimate(
        kmv_merge(kmv_daily_sketches(ev, k=64), k=64), k=64, key_col="day_key"
    ).first()["est_uniques"]
    assert abs(est - exact) / exact < 0.5  # k=64 -> rsd ~12.5%; 4 sigma
    # sub-k: 10 distinct ids, k=64 -> the sketch IS the value set
    small = ev.filter(F.col("user_id") < 10)
    row = kmv_estimate(kmv_daily_sketches(small, k=64), k=64).first()
    got = (
        small.select(F.to_date("ts").alias("d"), "user_id")
        .filter(F.col("d") == F.lit(str(row["day"])))
        .select("user_id")
        .distinct()
        .count()
    )
    assert row["est_uniques"] == float(got)


def test_kmv_salt_count_does_not_change_sketch(spark):
    """The two-level salted rank is an execution detail: any n_salts
    must yield the identical bottom-k."""
    from fxa_activity_metrics_spark.operators.rollup import kmv_daily_sketches

    ev = _kmv_events(spark)
    a = {
        r["day"]: r["hs"]
        for r in kmv_daily_sketches(ev, k=32, n_salts=4).collect()
    }
    b = {
        r["day"]: r["hs"]
        for r in kmv_daily_sketches(ev, k=32, n_salts=17).collect()
    }
    assert a == b
