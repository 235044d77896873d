"""Daily summaries: device activity + multi-device users.

Reference: calculate_daily_summary.py.

`daily_activity_per_device` (:54-65) — DISTINCT projection of
(day, uid, device_id, service, ua_*) from activity events with a
non-empty device_id.

`daily_multi_device_users` (:92-105) — the reference's crown-jewel
query: users seen on a second device within the previous 7 days.
Implemented BOTH ways (SURVEY §2.5); tests assert equality:

- join form: self equi-join on uid with theta residuals (device !=
  device, day in [day-7, day]) + DISTINCT — Spark plans a sort-merge
  or shuffled-hash join on the uid equi-key, AQE handles power-user
  skew;
- window form: per-uid 7-day sliding `rangeBetween` collecting the
  trailing device set — ONE shuffle on uid and no join, the preferred
  plan at 100 TB where the self-join would shuffle the table twice
  and explode on skewed uids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fxa_activity_metrics_spark import cacheutil

_SECONDS_PER_DAY = 86400


def daily_activity_per_device(
    events: DataFrame,
    device_col: str = "device_id",
    user_col: str = "uid",
    day_col: str = "day",
    extra_cols: tuple[str, ...] = ("service", "ua_browser", "ua_version", "ua_os"),
) -> DataFrame:
    """DISTINCT (day, uid, device_id, extras) for rows with a device.

    Empty string — not NULL — marks a missing device
    (calculate_daily_summary.py:61); the filter preserves that
    semantic exactly (SURVEY §2.2 P4).
    """
    return (
        events.filter(F.col(device_col) != "")
        .select(day_col, user_col, device_col, *extra_cols)
        .distinct()
    )


def multi_device_users_join(
    activity: DataFrame,
    lookback_days: int = 7,
    day_col: str = "day",
    user_col: str = "uid",
    device_col: str = "device_id",
) -> DataFrame:
    """Join formulation (calculate_daily_summary.py:92-105).

    present INNER JOIN past ON present.uid = past.uid
      AND present.device_id != past.device_id
      AND past.day BETWEEN present.day - lookback AND present.day
    then SELECT DISTINCT (day, uid, device_now, device_prev).

    The equi-key (uid) drives the shuffle; the day-range and device
    inequality stay residual predicates evaluated inside the join, so
    no cross product materializes.
    """
    present = activity.select(
        F.col(day_col).alias("day"),
        F.col(user_col).alias("uid"),
        F.col(device_col).alias("device_now"),
    )
    past = activity.select(
        F.col(day_col).alias("p_day"),
        F.col(user_col).alias("p_uid"),
        F.col(device_col).alias("device_prev"),
    )
    joined = present.join(
        past,
        on=[
            present["uid"] == past["p_uid"],
            present["device_now"] != past["device_prev"],
            past["p_day"] <= present["day"],
            past["p_day"] >= F.date_sub(present["day"], lookback_days),
        ],
        how="inner",
    )
    return joined.select("day", "uid", "device_now", "device_prev").distinct()


def multi_device_users_join_salted(
    activity: DataFrame,
    lookback_days: int = 7,
    n_salts: int = 8,
    hot_min_rows: int | None = None,
    day_col: str = "day",
    user_col: str = "uid",
    device_col: str = "device_id",
) -> DataFrame:
    """Join formulation with explicit key salting — the documented
    fallback for power-user uid skew (SURVEY §4) when AQE's runtime
    skew-split isn't available or a single uid still overflows one
    shuffle partition at 100 TB.

    The present side carries a deterministic salt
    ``pmod(hash(day, device), n_salts)``; the past side is replicated
    once per salt value via an exploded sequence (a ``lookback×n_salts``
    row multiplier on the SMALLER deduped projection, not the raw
    table). The join key becomes (uid, salt), so one hot uid's rows
    spread across ``n_salts`` shuffle partitions instead of one
    straggler task. Row-identical to ``multi_device_users_join`` —
    salting only re-routes the shuffle.

    ``hot_min_rows`` switches on PARTIAL salting — the production
    shape: uids with at least that many activity rows are detected
    with one aggregation, the hot slice joins salted, the cold
    majority joins plain, and only the hot slice pays the n_salts
    replication. The hot-key frame is bounded by
    total_rows / hot_min_rows; the semi/anti splits carry NO
    broadcast hint — at a genuinely-skew threshold the frame is tiny
    and AQE broadcasts it from runtime stats, while a mis-set
    threshold that matches most keys degrades to a shuffled semi-join
    instead of forcing an unbounded broadcast through the driver.
    ``None`` salts everything.
    """
    present = activity.select(
        F.col(day_col).alias("day"),
        F.col(user_col).alias("uid"),
        F.col(device_col).alias("device_now"),
    )
    past = activity.select(
        F.col(day_col).alias("p_day"),
        F.col(user_col).alias("p_uid"),
        F.col(device_col).alias("device_prev"),
    )

    def _join(pres: DataFrame, pst: DataFrame, salted: bool) -> DataFrame:
        conds = [
            pres["uid"] == pst["p_uid"],
            pres["device_now"] != pst["device_prev"],
            pst["p_day"] <= pres["day"],
            pst["p_day"] >= F.date_sub(pres["day"], lookback_days),
        ]
        if salted:
            pres = pres.withColumn(
                "salt",
                F.pmod(F.hash(F.col("day"), F.col("device_now")), F.lit(n_salts)),
            )
            pst = pst.withColumn(
                "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
            )
            conds = [
                pres["uid"] == pst["p_uid"],
                pres["salt"] == pst["salt"],
                pres["device_now"] != pst["device_prev"],
                pst["p_day"] <= pres["day"],
                pst["p_day"] >= F.date_sub(pres["day"], lookback_days),
            ]
        return pres.join(pst, on=conds, how="inner").select(
            "day", "uid", "device_now", "device_prev"
        )

    if hot_min_rows is None:
        return _join(present, past, salted=True).distinct()

    hot = (
        activity.groupBy(F.col(user_col).alias("_hot_uid"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= hot_min_rows)
        .select("_hot_uid")
    )
    pres_hot = present.join(hot, present["uid"] == hot["_hot_uid"], "left_semi")
    pres_cold = present.join(hot, present["uid"] == hot["_hot_uid"], "left_anti")
    past_hot = past.join(hot, past["p_uid"] == hot["_hot_uid"], "left_semi")
    past_cold = past.join(hot, past["p_uid"] == hot["_hot_uid"], "left_anti")
    return (
        _join(pres_hot, past_hot, salted=True)
        .unionByName(_join(pres_cold, past_cold, salted=False))
        .distinct()
    )


def gap_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "uid",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Gap-based sessionization via F.session_window (SURVEY §2.9):
    events of one user belong to the same session while consecutive
    gaps are strictly under ``gap``; a gap >= ``gap`` starts a new
    session (Spark's session end is exclusive). One shuffle on the
    user key; state-free in batch, watermark-evictable in streaming.

    Output: (user, session_start, session_end, n_events) where
    start/end are the first/last actual event timestamps.
    """
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(user_col, "session_start", "session_end", "n_events")
    )


def multi_device_users_grouped(
    activity: DataFrame,
    lookback_days: int = 7,
    day_col: str = "day",
    user_col: str = "uid",
    device_col: str = "device_id",
) -> DataFrame:
    """Aggregate formulation of J1 — identical rows to the join form
    (calculate_daily_summary.py:92-105) with ONE exchange.

    groupBy(uid) collects the distinct (day, device) pairs
    (collect_set partially aggregates map-side, so the exchange
    carries deduped pairs only); the 7-day-lookback × device-
    inequality expansion then runs IN-GROUP as array expressions,
    deduped per present (day, device) before exploding. The expanded
    pair set never crosses the wire, and no post-join distinct pass
    is needed — vs 3 exchanges for the join form (pre-distinct, join,
    post-distinct). Per-uid state is bounded by distinct (day,
    device) pairs inside the retention window; a pathological uid
    degrades to the same O(k²) a join-side expansion would.

    Measured at sf0.1 on local[32]: par with the join form — the
    in-group expansion is interpreted HOF eval while the join's
    expansion is codegen'd, which cancels the exchange savings when
    shuffles are in-memory. The formulation exists for the
    network-bound regime, where two fewer exchanges over the widest
    intermediates dominate.

    HOF audit: inner lambdas reference only bound lambda vars (`i`,
    `j`) and the plain `items` attribute — both cheap to re-read per
    element (no re-evaluated subexpression).
    """
    g = (
        activity.select(
            F.col(day_col).alias("day"),
            F.col(user_col).alias("uid"),
            F.col(device_col).alias("device"),
        )
        .groupBy("uid")
        .agg(F.collect_set(F.struct(F.col("day"), F.col("device"))).alias("items"))
    )
    items = F.col("items")
    per_present = F.transform(
        items,
        lambda i: F.struct(
            i["day"].alias("day"),
            i["device"].alias("device_now"),
            F.array_distinct(
                F.transform(
                    F.filter(
                        items,
                        lambda j: (j["device"] != i["device"])
                        & (j["day"] <= i["day"])
                        & (j["day"] >= F.date_sub(i["day"], lookback_days)),
                    ),
                    lambda j: j["device"],
                )
            ).alias("prevs"),
        ),
    )
    exploded = g.select("uid", F.explode(per_present).alias("p"))
    return exploded.select(
        F.col("p.day").alias("day"),
        "uid",
        F.col("p.device_now").alias("device_now"),
        F.explode(F.col("p.prevs")).alias("device_prev"),
    )


def multi_device_users_window(
    activity: DataFrame,
    lookback_days: int = 7,
    day_col: str = "day",
    user_col: str = "uid",
    device_col: str = "device_id",
) -> DataFrame:
    """Window formulation — identical rows to the join form.

    One shuffle on uid; per (uid, day) the trailing `lookback_days`
    window contributes `collect_set(device)`, and exploding that set
    minus the current device yields (device_now, device_prev) pairs.
    Scale rationale: avoids the second shuffle + join-row explosion of
    the self-join; the per-uid state is bounded by devices-per-user.
    """
    daily = (
        activity.select(
            F.col(day_col).alias("day"),
            F.col(user_col).alias("uid"),
            F.col(device_col).alias("device"),
        )
        .distinct()
    )
    w = (
        Window.partitionBy("uid")
        .orderBy(F.unix_timestamp(F.col("day").cast("timestamp")))
        .rangeBetween(-lookback_days * _SECONDS_PER_DAY, 0)
    )
    with_window = daily.withColumn("trailing_devices", F.collect_set("device").over(w))
    pairs = with_window.select(
        "day",
        "uid",
        F.col("device").alias("device_now"),
        F.explode("trailing_devices").alias("device_prev"),
    ).filter(F.col("device_now") != F.col("device_prev"))
    return pairs.distinct()


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Retention triangle: users grouped into cohorts by first-seen
    day, counted at each later day offset — the classic activity-
    metrics rollup downstream of the reference's daily summaries
    (calculate_daily_summary.py computes the per-day inputs; this is
    the cross-day readout a dashboard derives from them).

    Plan shape (100 TB): the events relation is shuffled ONCE. Each
    user's distinct active days collapse to a sorted array in a
    single user_id groupBy (per-user state is bounded by the
    observation window, e.g. <= 90 days); the cohort day is the
    array head and every offset is derived by exploding the same
    array — no self-join, no second shuffle of the events table,
    unlike the naive cohort-join formulation (events JOIN first_seen
    ON user_id) which shuffles twice and carries the skew of power
    users into a join. Everything downstream of the groupBy operates
    on one row per (cohort_day, day_offset) — days^2/2 rows no
    matter the corpus size.

    Output: (cohort_day, day_offset, n_active, n_cohort, rate_ppm)
    where n_cohort is the cohort's size (its offset-0 count) and
    rate_ppm = n_active * 1_000_000 div n_cohort — integer
    parts-per-million so the ratio is cross-engine exact (no float
    rounding at the oracle boundary).
    """
    days = (
        events.select(
            F.col(user_col).alias("uid"),
            F.to_date(ts_col).alias("d"),
        )
        .groupBy("uid")
        .agg(F.sort_array(F.collect_set("d")).alias("days"))
    )
    per_user = days.select(
        F.element_at("days", 1).alias("cohort_day"),
        F.explode("days").alias("d"),
    ).select(
        "cohort_day", F.datediff("d", "cohort_day").alias("day_offset")
    )
    counts = per_user.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    # n_cohort is the cohort's offset-0 count. A window over the
    # ALREADY-AGGREGATED counts (one row per cohort x offset — tiny
    # at any corpus size) reads it without the naive alternative's
    # second events scan + join: a filter(offset=0) sizes subtree is
    # not exchange-reusable (the pushed filter changes the subtree),
    # so it would recompute the whole uid shuffle.
    wc = Window.partitionBy("cohort_day")
    return counts.select(
        "cohort_day",
        "day_offset",
        "n_active",
        F.max(F.when(F.col("day_offset") == 0, F.col("n_active")))
        .over(wc)
        .alias("n_cohort"),
    ).select(
        "cohort_day",
        "day_offset",
        "n_active",
        "n_cohort",
        F.expr("n_active * 1000000L div n_cohort").alias("rate_ppm"),
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    max_step_gap_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: how many users progressed through
    `steps` in order, each step strictly later than the one before
    (and, with `max_step_gap_seconds`, within that many seconds of
    it — the conversion-window funnel).

    Semantics (greedy earliest-chain): step 1 anchors at the user's
    MIN step-1 timestamp, step i+1 at the min step-(i+1) timestamp
    STRICTLY after the anchored step-i time. A single left fold over
    the user's time-sorted events computes exactly that chain — at
    each event, advance iff it names the next pending step and lies
    strictly after the last anchor (the fold meets each candidate in
    ascending order, so the first qualifying event IS the min). The
    SQL oracle states the same thing as n chained conditional-min
    aggregations — textbook, but n passes over the data; the fold is
    the one-pass form. NOTE these are greedy-anchor semantics in
    both forms: with a conversion window, a later step-1 event that
    WOULD have admitted the chain does not resurrect a funnel whose
    earliest anchor timed out (the standard product-analytics
    reading, and the only one a chained-min oracle can state).

    Plan shape (100 TB): events are pre-filtered to the step types
    (predicate reaches the scan), then ONE shuffle on user_id
    collects each user's (ts, event_id, type) triples — per-user
    state bounded by that user's step-type events. The fold and the
    step explode are array expressions inside codegen; the final
    rollup is a map-side-combined groupBy over <= len(steps) keys.
    Ties are broken by the unique event id, so the sort — and the
    whole result — is deterministic in both engines.

    Output: (step, step_name, n_users), step 1-based; a user reaching
    step i counts toward every step <= i.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    step_arr = F.array(*[F.lit(s) for s in steps])
    evs = (
        events.filter(F.col(type_col).isin(steps))
        .select(
            F.col(user_col).alias("uid"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("eid"),
                F.col(type_col).alias("et"),
            ).alias("e"),
        )
        .groupBy("uid")
        .agg(F.sort_array(F.collect_list("e")).alias("evs"))
    )
    seed = F.struct(
        F.lit(0).alias("step"),
        F.lit(None).cast("timestamp").alias("last"),
    )
    in_gap = (
        (lambda acc, e: F.lit(True))
        if max_step_gap_seconds is None
        else (
            lambda acc, e: e["ts"]
            <= acc["last"] + F.expr(f"INTERVAL {int(max_step_gap_seconds)} SECONDS")
        )
    )
    reached = F.aggregate(
        F.col("evs"),
        seed,
        lambda acc, e: F.when(
            (acc["step"] < len(steps))
            & (e["et"] == F.element_at(step_arr, acc["step"] + 1))
            & (acc["last"].isNull() | ((e["ts"] > acc["last"]) & in_gap(acc, e))),
            F.struct(
                (acc["step"] + 1).alias("step"), e["ts"].alias("last")
            ),
        ).otherwise(acc),
        lambda acc: acc["step"],
    )
    per_user = evs.select(reached.alias("reached")).filter(F.col("reached") > 0)
    counts = (
        per_user.select(
            F.explode(F.sequence(F.lit(1), F.col("reached"))).alias("step")
        )
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    # every step appears in the report, zero-filled — a funnel whose
    # tail nobody reaches still shows the tail (and matches the
    # oracle's unconditional per-step counts)
    all_steps = events.sparkSession.range(1).select(
        F.posexplode(step_arr).alias("_pos", "step_name")
    ).select((F.col("_pos") + 1).alias("step"), "step_name")
    return all_steps.join(counts, "step", "left").select(
        "step",
        "step_name",
        F.coalesce("n_users", F.lit(0)).alias("n_users"),
    )


def rolling_actives(
    events: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    id_col: str = "user_id",
) -> DataFrame:
    """Rolling active users — DAU, trailing-window actives (WAU at
    the default 7), and the DAU/WAU stickiness ratio per observed
    day. The classic engagement summary one step up from the
    reference's daily_summary family (calculate_daily_summary.py
    computes the per-day facts; this is the trailing-window read).

    Rolling DISTINCT counts don't fold as window aggregates (distinct
    isn't subtractable), so instead of a per-day range self-join the
    plan EXPLODES each (day, uid) fact onto the window_days window
    days it supports (sequence + explode, a bounded ×window_days
    fan-out of narrow rows) and re-distincts — two map-side-
    combinable exchanges, no join, no skew surface: at 100 TB this
    beats the range join by never pairing rows (the J1 lesson from
    multi_device_users_window, applied to counting).

    Output: (day, dau, wau, stickiness_micro) for every day with ≥ 1
    event, stickiness_micro = dau·1e6 div wau (integer; DuckDB's //
    agrees on non-negatives).
    """
    da = (
        events.select(
            F.to_date(F.col(ts_col)).alias("day"), F.col(id_col).alias("uid")
        )
        .distinct()
        # persisted: both the DAU and the window branch read this
        # day-scale fact — without the cache Catalyst scans and
        # re-distincts the event stream twice
        .persist()
    )
    da = cacheutil.track(da)
    dau = da.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        da.select(
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.date_add(F.col("day"), window_days - 1),
                )
            ).alias("wday"),
            "uid",
        )
        .distinct()
        .groupBy("wday")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(wau, dau["day"] == wau["wday"])
        .select(
            "day",
            "dau",
            "wau",
            F.expr("dau * 1000000L div wau").alias("stickiness_micro"),
        )
    )


def daily_spikes(
    events: DataFrame,
    window_days: int = 7,
    factor_pct: int = 103,
    ts_col: str = "ts",
) -> DataFrame:
    """Day-over-trailing-window volume spike detection: flag a day
    whose event count exceeds factor_pct% of the trailing
    window_days-day average — the alerting read over the reference's
    daily import counts (import_counts.py keeps the daily numbers;
    this is the monitor on top).

    The spike gate is integer cross-multiplied
    (n·trail_days·100 > factor_pct·trail_sum — no float average), so
    the flags replay exactly. The window is a RANGE frame over epoch
    days, ordered WITHOUT a partition — deliberate and safe here,
    unlike a corpus-scale global window (the lm_buckets rule):
    the windowed relation is the per-day aggregate, calendar-bounded
    (≤ 365·years rows) after its one exchange. Days with an empty
    trailing window (the first) never flag.

    Output: (day, n_events, trail_sum, trail_days, spike).
    """
    daily = events.groupBy(
        F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-window_days, -1)
    )
    return daily.select(
        "day",
        "n_events",
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).alias("trail_sum"),
        F.count(F.lit(1)).over(w).alias("trail_days"),
        (
            F.col("n_events") * F.count(F.lit(1)).over(w) * 100
            > F.lit(factor_pct) * F.coalesce(F.sum("n_events").over(w), F.lit(0))
        ).alias("spike"),
    )


def scd2_history(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension derivation: collapse each
    key's attribute timeline into validity intervals
    (key, attr, valid_from, valid_to, is_current) — the dimension-
    table read over the reference's event lake (the uid→flow/device
    enrich joins of import_flow_events.py:322-369 consume exactly
    this shape when the attribute drifts over time).

    Gaps-and-islands WITHOUT a groupBy: a row opens an interval iff
    its attribute differs from the key's previous event (lag over
    one key-partitioned window); valid_to is simply the NEXT
    opener's timestamp (lead over the same partitioning). Both
    windows share one Exchange + one Sort — the whole operator is a
    single shuffle on the dimension key, no join, no aggregate, so
    at 100 TB it scales as one pass over the fact stream. Ties on
    ``ts_col`` are ordered by ``tiebreak_col`` (unique), making the
    interval set deterministic and engine-replayable.

    Output: one row per (key, attribute run); ``valid_to`` NULL on
    the key's current interval, ``is_current`` = that predicate,
    ``open_event_id`` = the opener's tiebreak id — kept in the table
    so INCREMENTAL maintenance can replay stored change points in
    the exact batch order even when several openers share one
    timestamp (without it, same-ts openers would reorder
    nondeterministically across increments).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    opens = (
        events.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev")))
    )
    return opens.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        F.col(tiebreak_col).alias("open_event_id"),
    )


def scd2_apply_increment(
    history: DataFrame,
    day_events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Fold one day-drop of events into a stored SCD2 history —
    incremental == batch, bit-exactly, provided drops arrive in day
    order (the lake's ingestion contract, sources/lake.py:50-90).

    Soundness: ``scd2_history`` output rows ARE the change points of
    the timeline (one event per interval open, attribute carried), so
    re-running the collapse over (stored change points ∪ new events)
    reproduces the collapse over the full event history — consecutive
    duplicate attributes from the new day fold into the key's current
    interval exactly as the batch plan would. Keys untouched by the
    drop never re-enter the window: their stored rows pass through a
    broadcast-able anti-join (delta keys are one day's dimension
    churn — small by definition), so the incremental cost is
    O(changed keys' history + day size), not O(full history).
    """
    delta_keys = day_events.select(F.col(key_col)).distinct()
    touched = history.join(F.broadcast(delta_keys), key_col, "semi")
    untouched = history.join(F.broadcast(delta_keys), key_col, "anti")
    replay = touched.select(
        key_col,
        attr_col,
        F.col("valid_from").alias(ts_col),
        # the stored opener id replays change points in the exact
        # batch order — several openers CAN share a timestamp, so a
        # constant sentinel here would reorder them nondeterministically
        F.col("open_event_id").alias(tiebreak_col),
    ).unionByName(day_events.select(key_col, attr_col, ts_col, tiebreak_col))
    return untouched.unionByName(
        scd2_history(replay, key_col, attr_col, ts_col, tiebreak_col)
    )
