"""Mergeable-sketch rollups: answer range distinct-count queries
from tiny persisted per-day sketches instead of rescanning events.

The 100 TB pattern: the events table is append-only and huge; "how
many unique users between day A and day B" rescans the whole range
every time. Instead, persist ONE DataSketches-HLL sketch row per day
(a few KB each — `hll_sketch_agg`, map-side combinable, one shuffle
on day at build time), then any range query is a partition-pruned
read of |range| sketch rows union-merged with `hll_union_agg` —
milliseconds of driver-side work against bytes of input, with the
same ±rsd estimate quality as sketching the raw range directly
(HLL unions are lossless at equal lg_k).

Incremental by construction: each arriving day appends/replaces only
its own sketch row through the idempotent day sink (S5), so history
is never rescanned — the lake's incremental contract applied to
aggregate state. Exactness contract: estimates, not counts; the
exact twin (`daily_uniques_exact`-style COUNT DISTINCT over the
range) is the correctness baseline in tests, with the sketch path
asserted within tolerance and merge-order invariant.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.sources.lake import Lake

SKETCH_TABLE = "daily_uid_sketches"


def build_daily_sketches(
    lake: Lake,
    events: DataFrame,
    table: str = SKETCH_TABLE,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 12,
) -> None:
    """Aggregate one HLL sketch per day from raw events and land it
    in a day-partitioned table (idempotent per-day overwrite — a
    late-arriving re-import of a day replaces exactly that day's
    sketch row). Pass only the NEW days' events for incremental
    maintenance; untouched days keep their files byte-identical."""
    sk = events.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.hll_sketch_agg(F.col(id_col).cast("string"), F.lit(lg_k)).alias(
            "uid_sketch"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    lake.write_days(table, sk, sort_cols=[])


def range_uniques(
    lake: Lake,
    day_from: dt.date | str,
    day_until: dt.date | str,
    table: str = SKETCH_TABLE,
) -> DataFrame:
    """Distinct-user estimate for [day_from, day_until]: a
    partition-pruned read of the range's sketch rows, union-merged.
    Input bytes ~ KB per day in range; the events table is never
    touched. Output: (day_from, day_until, n_days, uniques_est)."""
    sk = lake.read_days(table, day_from, day_until)
    return sk.agg(
        F.lit(str(day_from)).alias("day_from"),
        F.lit(str(day_until)).alias("day_until"),
        F.count(F.lit(1)).alias("n_days"),
        # an unpopulated range estimates 0, not NULL (hll_union_agg
        # over zero rows is NULL; don't let it poison downstream math)
        F.coalesce(
            F.hll_sketch_estimate(F.hll_union_agg("uid_sketch")),
            F.lit(0).cast("long"),
        ).alias("uniques_est"),
    )


def range_uniques_exact(
    events: DataFrame, day_from: dt.date | str, day_until: dt.date | str,
    id_col: str = "user_id", ts_col: str = "ts",
) -> DataFrame:
    """The exact twin: COUNT DISTINCT over the raw range — what the
    sketch path's estimate is asserted against in tests (and what
    you pay a full range rescan for)."""
    day = F.to_date(F.col(ts_col))
    return (
        events.where(
            (day >= F.lit(str(day_from)).cast("date"))
            & (day <= F.lit(str(day_until)).cast("date"))
        )
        .agg(F.countDistinct(F.col(id_col)).alias("uniques"))
    )
