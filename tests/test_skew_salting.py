"""J1 uid-skew salting fallback (VERDICT r2 #5): a power user holding
10% of all activity must spread across n_salts shuffle partitions
instead of landing on one straggler task, with row-identical output
to the unsalted join form."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.summaries import (
    multi_device_users_join,
    multi_device_users_join_salted,
)

N_SALTS = 8


@pytest.fixture(scope="module")
def skewed_activity(spark):
    """daily_activity_per_device-shaped frame where one uid owns 10%
    of the rows (a power user on many devices across many days)."""
    base = dt.date(2024, 5, 1)
    rows = []
    # power user: 300 rows = 10% — 30 days × 10 devices
    for d in range(30):
        for dev in range(10):
            rows.append((base + dt.timedelta(days=d), "power-uid", f"pdev{dev}"))
    # 2700 background rows: 900 uids × 3 (day, device) combos
    for u in range(900):
        for j in range(3):
            rows.append(
                (base + dt.timedelta(days=(u + j) % 30), f"uid{u:04d}", f"dev{u}{j}")
            )
    df = spark.createDataFrame(rows, "day date, uid string, device_id string")
    return df.cache()


def test_salted_equals_unsalted(spark, skewed_activity):
    plain = multi_device_users_join(skewed_activity, 7)
    salted = multi_device_users_join_salted(skewed_activity, 7, n_salts=N_SALTS)
    a = {tuple(map(str, r)) for r in plain.collect()}
    b = {tuple(map(str, r)) for r in salted.collect()}
    assert a == b
    assert len(a) > 0


def test_salt_is_a_join_key(spark, skewed_activity):
    """The physical join key must include the salt, so the shuffle
    hash-routes on (uid, salt), not uid alone. Broadcast is disabled:
    on a tiny cached fixture Spark would broadcast the past side (no
    shuffle at all), but the salting fallback exists precisely for the
    regime where both sides are too big to broadcast."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = multi_device_users_join_salted(skewed_activity, 7, n_salts=N_SALTS)
        plan = salted._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the exchange feeding the join partitions on both uid and salt
    assert "hashpartitioning(uid" in plan and "salt" in plan.split(
        "hashpartitioning(uid", 1
    )[1].split(")", 1)[0]


def test_power_uid_spreads_across_salts(spark, skewed_activity):
    """Under (uid, salt) routing the hot key's build rows split into
    N_SALTS groups of ~1/N_SALTS each — the straggler-prevention
    property itself, asserted on the actual salt assignment."""
    present = skewed_activity.select(
        "day", "uid", F.col("device_id").alias("device_now")
    ).withColumn(
        "salt", F.pmod(F.hash(F.col("day"), F.col("device_now")), F.lit(N_SALTS))
    )
    sizes = (
        present.filter(F.col("uid") == "power-uid")
        .groupBy("salt")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in sizes)
    assert total == 300
    assert len(sizes) == N_SALTS, "every salt bucket must receive rows"
    assert max(r["count"] for r in sizes) <= total / N_SALTS * 2, (
        "no salt bucket may dominate — the hot uid must split ~evenly"
    )


def test_partial_salting_equals_unsalted(spark, skewed_activity):
    """hot_min_rows isolates the power uid into the salted branch
    (300 rows vs 3 per background uid); output must still equal the
    plain join exactly."""
    plain = multi_device_users_join(skewed_activity, 7)
    partial = multi_device_users_join_salted(
        skewed_activity, 7, n_salts=N_SALTS, hot_min_rows=100
    )
    a = {tuple(map(str, r)) for r in plain.collect()}
    b = {tuple(map(str, r)) for r in partial.collect()}
    assert a == b


def test_partial_salting_splits_hot_from_cold(spark, skewed_activity):
    """The plan must contain BOTH join shapes: a salted join for the
    hot slice and a plain join for the cold majority, unioned."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = multi_device_users_join_salted(
            skewed_activity, 7, n_salts=N_SALTS, hot_min_rows=100
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Union" in plan
    # salted branch shuffles on (uid, salt); cold branch on uid alone
    assert "hashpartitioning(uid" in plan
    salted_exchanges = [
        seg.split(")", 1)[0]
        for seg in plan.split("hashpartitioning(")[1:]
        if seg.split(")", 1)[0].startswith("uid")
    ]
    assert any("salt" in seg for seg in salted_exchanges)
    assert any("salt" not in seg for seg in salted_exchanges)
