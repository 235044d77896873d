"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/kdb do). Two formulations:

- asof_join (the scale path): union both sides tagged, ONE shuffle
  on (key), sort by (ts, side-order) within the window, and
  forward-fill the latest right-side payload with last(ignorenulls)
  over rows-unbounded-preceding. Cost: one shuffle + one sort —
  never a pair explosion, immune to key skew in the time dimension.
- asof_join_via_join (correctness baseline): equi-join on key with a
  range predicate, keep the max right ts per left row. O(pairs)
  blow-up on dense keys — small inputs only.

Tie semantics: a right row AT the left timestamp matches (<=), and
ties between the two sides at the same instant order the right side
first so it is visible to the left row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fxa_activity_metrics_spark import cacheutil


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
) -> DataFrame:
    """Returns `left.*` + the payload columns of the most recent
    `right` row with right.ts <= left.ts for the same key (NULLs when
    no prior right row exists)."""
    payload = payload or [c for c in right.columns if c not in (key, right_ts)]
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right (0) sorts before left (1) on ties
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*payload).alias("p")).schema["p"].dataType
        ).alias("_p"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("l")).schema["l"].dataType
        ).alias("_l"),
        F.struct(*payload).alias("_p"),
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn("_pf", F.last("_p", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_pf.{c}").alias(c) for c in payload],
    )
    return out


def asof_join_via_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
) -> DataFrame:
    """Join-based baseline: equi-join on key + ts range, rank right
    rows per left row, keep the latest. Must equal asof_join."""
    payload = payload or [c for c in right.columns if c not in (key, right_ts)]
    l = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_lts"),
        F.struct(*left.columns).alias("_l"),
        F.monotonically_increasing_id().alias("_lid"),
    )
    r = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_rts"),
        F.struct(*payload).alias("_p"),
    )
    joined = l.join(r, on=[l["_k"] == r["_k"], r["_rts"] <= l["_lts"]], how="left").drop(
        r["_k"]
    )
    w = Window.partitionBy("_lid").orderBy(F.col("_rts").desc_nulls_last())
    best = joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return best.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_p.{c}").alias(c) for c in payload],
    )


def locf_fill(
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Last-observation-carried-forward gap fill: densify each
    entity's series onto the full observed-day calendar and carry
    the most recent per-day value forward across the gap days — the
    time-series regularization an as-of join family needs before
    windowed models (asof_join answers point probes; this
    materializes the whole regular grid).

    Per-day observation = MAX(value) over the entity's day (a
    deterministic pick; "last by timestamp" would tie-break
    ambiguously). The grid is entities × observed days — linear in
    the OUTPUT, built from a broadcast crossJoin of the day list
    (calendar-bounded) against the entity list; the fill itself is
    one shuffle on the entity key + a running last(ignorenulls)
    window per entity. Values pass through untouched (no float
    arithmetic), so the fill replays exactly.

    Output: (uid, day, day_value, filled_value, observed) — rows
    before an entity's first observation keep filled_value NULL.
    """
    obs = (
        events.select(
            F.col(id_col).alias("uid"),
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(value_col).alias("v"),
        )
        .groupBy("uid", "day")
        .agg(F.max("v").alias("day_value"))
        .persist()  # grid + join both read it; don't re-scan events
    )
    obs = cacheutil.track(obs)
    days = obs.select("day").distinct()
    ids = obs.select("uid").distinct()
    grid = ids.crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("uid")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["uid", "day"], "left")
        .select(
            "uid",
            "day",
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("day_value").isNotNull().alias("observed"),
        )
    )
