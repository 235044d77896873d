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

from pyspark.sql import DataFrame, Window
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


# ---------------------------------------------------------------------------
# Count-Min Sketch: mergeable approximate frequencies, JVM-only
# ---------------------------------------------------------------------------


def _cms_hash(key: F.Column, j: int, w: int) -> F.Column:
    """Row-j CMS hash: md5 of a salted key, first 8 hex chars to a
    32-bit int, mod width. Engine-portable (same digest text in
    DuckDB), so the whole sketch is deterministic and exact-oracle
    checkable — rare for a sketch."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{j}:"), key)), 1, 8), 16, 10
    ).cast("long")
    return h % w


def cms_build(
    df: DataFrame,
    key_col: str = "key",
    d: int = 4,
    w: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min Sketch (Cormode & Muthukrishnan 2005) of key
    frequencies as a d x w relation: (j, bucket, weight) with
    weight = sum of key weights hashing to (j, bucket).

    Why this shape at 100 TB: the sketch is ADDITIVE — sketches of
    two corpus slices merge by (j, bucket) weight-sum, so per-day /
    per-shard sketches fold like the HLL rows above, and the full
    build is one map-side-combining shuffle of d*N hashed rows into
    at most d*w output rows (a few KB). No per-partition imperative
    state (the Misra-Gries alternative needs a Python kernel); every
    expression is inside codegen. Estimates overcount only:
    est(k) >= true(k), with overshoot ~ N/w per row, min'd over d
    rows at query time.
    """
    key = F.col(key_col)
    rows = df.filter(key.isNotNull()).select(
        key.alias("_k"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("_w"),
    )
    probes = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cms_hash(F.col("_k"), j, w).alias("bucket"))
            for j in range(d)
        ]
    )
    return (
        rows.select(F.explode(probes).alias("p"), "_w")
        .groupBy(F.col("p.j").alias("j"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("weight"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS relations built with the same (d, w): union + weight
    re-sum. Lossless — merging per-slice sketches is bit-identical to
    sketching the union (pinned in tests)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("weight").alias("weight"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-estimate each probe key's frequency: min over the d
    (j, bucket) cells the key hashes to; a missing cell reads 0 (no
    key hashing there at all). The sketch side is <= d*w rows, so
    Spark broadcasts it and the probe side never shuffles — estimate
    cost is independent of corpus size. Output: (key, est)."""
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cms_hash(F.col("_k"), j, w).alias("bucket")
            )
            for j in range(d)
        ]
    )
    probe_rows = (
        keys.select(F.col(key_col).alias("_k"))
        .distinct()
        .select("_k", F.explode(probes).alias("p"))
        .select("_k", F.col("p.j").alias("j"), F.col("p.bucket").alias("bucket"))
    )
    return (
        probe_rows.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy(F.col("_k").alias("key"))
        .agg(F.min(F.coalesce(F.col("weight"), F.lit(0))).alias("est"))
    )


def _mg_fold(counters: dict, counts, k: int) -> dict:
    """One mergeable-MG reduce (Agarwal et al. 2012, "Mergeable
    Summaries"): fold a batch of exact (item, count) weights into the
    running summary, then — if more than k items survive — subtract
    the (k+1)-th largest weight from every counter and drop the
    non-positive. At most k items can exceed the (k+1)-th largest
    value, so the result is ≤ k counters with no tie-break needed.
    Each reduce destroys ≥ (k+1)·t total mass for its subtraction t,
    so the cumulative subtraction along any merge path — the
    per-item undercount — is ≤ n_total/(k+1)."""
    for item, c in counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        t = sorted(counters.values(), reverse=True)[k]
        counters = {i: w - t for i, w in counters.items() if w - t > 0}
    return counters


def _mg_chunks(values, chunk: int):
    """Deterministically re-chunk an iterable of pandas Series into
    fixed-size blocks of `chunk` values: block boundaries depend only
    on the value sequence, never on Arrow batch sizing — the property
    that makes the fold replayable (rows [0:B), [B:2B), ... of the
    partition)."""
    import pandas as pd

    buf: list = []
    have = 0
    for s in values:
        buf.append(s)
        have += len(s)
        while have >= chunk:
            cat = pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            yield cat.iloc[:chunk]
            rest = cat.iloc[chunk:]
            buf, have = ([rest], len(rest)) if len(rest) else ([], 0)
    if have:
        yield pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]


def misra_gries_summaries(
    items: DataFrame, item_col: str = "item", k: int = 24, chunk: int = 4096
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries (Misra & Gries
    1982 / the weighted mergeable form of Agarwal et al. 2012): the
    frequent-items complement to the Count-Min Sketch (cms_build):
    CMS answers point queries with overestimates and is all-JVM;
    MG RETURNS the candidate heavy-hitter set itself with
    underestimates, and needs per-partition imperative state, so it
    is the one sketch in this module built as an Arrow kernel
    (mapInPandas — the documented CMS/MG tradeoff, rollup.py:cms_build).

    The kernel is VECTORIZED (round-8, VERDICT r7 #6): each partition
    is re-chunked into deterministic fixed-size blocks of `chunk`
    values, each block counted with Series.value_counts (C-speed),
    and the per-block exact counts folded into the k counters with
    the mergeable reduce (_mg_fold) — a block's exact counts are
    themselves an error-0 MG summary, so the fold preserves
    est ≤ true and true − est ≤ n_partition/(k+1). Block boundaries
    are fixed by the partition's value order alone (not Arrow batch
    sizing), so the whole pass is exactly replayable given a pinned
    partitioning + order.

    Each partition emits ≤ k (item, w) rows regardless of partition
    size — at 100 TB that is P×k rows total into the merge, no
    shuffle of the raw stream at all (contrast wordcount's full
    groupBy shuffle).
    """
    import pandas as pd

    def kernel(batches):
        counters: dict[str, int] = {}
        for block in _mg_chunks((pdf[item_col] for pdf in batches), chunk):
            counters = _mg_fold(counters, block.value_counts(), k)
        yield pd.DataFrame(
            {"item": list(counters.keys()), "w": list(counters.values())}
        )

    return items.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        kernel, "item string, w long"
    )


def misra_gries_topk(
    items: DataFrame, item_col: str = "item", k: int = 24, chunk: int = 4096
) -> DataFrame:
    """Mergeable Misra-Gries heavy hitters (Agarwal et al. 2012,
    "Mergeable Summaries", PODS): per-partition MG summaries, then
    the associative merge — sum matched counters, subtract the
    (k+1)-th largest merged weight, keep the positive (≤ k by
    construction: at most k items exceed the (k+1)-th largest). The
    merged summary obeys the SAME bound as a single-pass MG over the
    concatenated stream: est ≤ true and true − est ≤ n_total/(k+1) —
    pinned against exact counts in tests/test_sketches.py.

    The merge input is ≤ P×k rows (metadata scale) — so the final
    reduce runs ON THE DRIVER from a single collect (ADVICE r7: the
    previous two-branch plan realized the uncached mapInPandas
    lineage twice, which both doubled the kernel cost and, under an
    unpinned input, could subtract one realization's threshold from
    another's weights). One realization, one kernel pass, and the
    driver fold is the same _mg_fold the executors run.

    Output: (item, est) — est is the merged lower-bound weight.
    DETERMINISM: given a fixed partitioning and within-partition
    order of `items` the result is exactly reproducible; callers
    wanting cross-run stability must pin both (the registry entry
    hash-partitions by doc_id and sorts within partitions).
    """
    spark = items.sparkSession
    merged: dict[str, int] = {}
    for r in misra_gries_summaries(
        items, item_col=item_col, k=k, chunk=chunk
    ).collect():
        merged[r["item"]] = merged.get(r["item"], 0) + r["w"]
    final = _mg_fold({}, merged, k)
    out = sorted(final.items(), key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(
        [(i, w) for i, w in out], "item string, est long"
    )


def misra_gries_grouped(
    items: DataFrame,
    group_col: str = "g",
    order_cols: tuple = ("doc_id", "pos"),
    item_col: str = "item",
    k: int = 24,
    chunk: int = 512,
) -> DataFrame:
    """Exactly-replayable mergeable MG (VERDICT r7 #8): the 'partition'
    is an EXPLICIT group key (e.g. pmod(doc_id, P) — computable in
    plain SQL, unlike Spark's Murmur3 exchange hashing), the
    within-group order an explicit column list, and the block size a
    fixed constant — so every source of nondeterminism in
    misra_gries_topk's partition-dependent answer is pinned to
    relational inputs, and a SQL engine can replay the whole fold
    (the DuckDB oracle does, with a recursive CTE over the per-group
    block-count lists; same trick as the greedy-BPE oracle,
    __spark_entry__._bpe_real_sql).

    Shape: groupBy(g).applyInPandas — one shuffle keyed on g; each
    kernel sorts its group by order_cols, re-chunks to fixed blocks,
    value_counts + _mg_fold per block, emits ≤ k rows. The final
    cross-group merge is the same driver-side reduce as
    misra_gries_topk (input bounded at G×k rows).

    Output: (item, est), est ≤ true, true − est ≤ n_total/(k+1).
    """
    import pandas as pd

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        s = pdf.sort_values(list(order_cols), kind="mergesort")[item_col]
        counters: dict[str, int] = {}
        for block in _mg_chunks([s.reset_index(drop=True)], chunk):
            counters = _mg_fold(counters, block.value_counts(), k)
        return pd.DataFrame(
            {"item": list(counters.keys()), "w": list(counters.values())}
        )

    spark = items.sparkSession
    summaries = (
        items.select(
            group_col, *order_cols, F.col(item_col).cast("string").alias(item_col)
        )
        .groupBy(group_col)
        .applyInPandas(kernel, "item string, w long")
    )
    merged: dict[str, int] = {}
    for r in summaries.collect():
        merged[r["item"]] = merged.get(r["item"], 0) + r["w"]
    final = _mg_fold({}, merged, k)
    out = sorted(final.items(), key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(
        [(i, w) for i, w in out], "item string, est long"
    )


def heavy_hitters_exact(
    items: DataFrame, item_col: str = "item", k: int = 24
) -> DataFrame:
    """Exact φ-heavy hitters (count > n/(k+1)) — the correctness twin
    for misra_gries_topk, and itself a two-shuffle plan (wordcount +
    1-row broadcast threshold) that stays viable whenever the full
    groupBy shuffle is affordable."""
    counts = (
        items.select(F.col(item_col).cast("string").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = items.select(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * (k + 1) > F.col("n_total"))
        .select("item", F.col("n").alias("exact_n"))
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k) distinct-count sketch: mergeable AND exactly oracled
# ---------------------------------------------------------------------------


def _kmv_frac(h: F.Column) -> F.Column:
    """md5 hex -> U(0,1): first 15 hex chars (60 bits — BIGINT-exact
    in Spark and DuckDB alike) over 2^60. Both engines round the
    60-bit integer to double identically (IEEE nearest), so the
    estimate is bit-reproducible across engines."""
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint").cast("double")
        / F.lit(float(1 << 60))
    )


def kmv_daily_sketches(
    events: DataFrame,
    k: int = 64,
    id_col: str = "user_id",
    ts_col: str = "ts",
    n_salts: int = 32,
) -> DataFrame:
    """One KMV (bottom-k / k-minimum-values) sketch row per day: the
    k lexicographically-smallest md5 hashes of the day's DISTINCT
    ids, as a sorted array. Beyer et al. 2007 ("On synopses for
    distinct-value estimation"): with u_k = the k-th smallest hash as
    a U(0,1) draw, (k-1)/u_k is an unbiased distinct-count estimate;
    the sketch is MERGEABLE (union the hash sets, re-take the
    bottom k) — same persistence story as the HLL rows above, but
    md5 is deterministic, so unlike HLL the whole sketch AND its
    estimate replay exactly in the DuckDB oracle.

    Distributed bottom-k, no global sort: distinct (day, hash) pairs
    first (one map-side-combinable shuffle), then a SALTED two-level
    rank — bottom-k within (day, salt) prunes each day's candidates
    to ≤ n_salts·k rows in parallel windows, and only that bounded
    set meets the final per-day rank. At 100 TB no executor ever
    sorts a full day's distinct set in one task."""
    keyed = events.select(
        F.to_date(F.col(ts_col)).alias("day"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    )
    return kmv_sketches_by_key(keyed, k=k, key_col="day", n_salts=n_salts)


def kmv_sketches_by_key(
    keyed: DataFrame,
    k: int = 64,
    key_col: str = "day",
    n_salts: int = 32,
) -> DataFrame:
    """Bottom-k per group over pre-hashed rows (key_col, h): the
    generic core of kmv_daily_sketches, reused by the streaming
    maintenance path (where the group key is the drop's file day and
    the hashed values are vocabulary tokens)."""
    distinct_hashes = keyed.select(key_col, "h").distinct()
    salted = distinct_hashes.withColumn(
        "_s", F.pmod(F.xxhash64("h"), F.lit(n_salts))
    )
    w_local = Window.partitionBy(key_col, "_s").orderBy("h")
    w_key = Window.partitionBy(key_col).orderBy("h")
    return (
        salted.withColumn("_rl", F.row_number().over(w_local))
        .filter(F.col("_rl") <= k)
        .withColumn("_r", F.row_number().over(w_key))
        .filter(F.col("_r") <= k)
        .groupBy(key_col)
        .agg(
            F.sort_array(F.collect_list("h")).alias("hs"),
            F.max("_r").alias("n_kept"),
        )
    )


def kmv_estimate(
    sketches: DataFrame, k: int = 64, key_col: str = "day"
) -> DataFrame:
    """Per-sketch distinct estimate: exact n_kept when the day had
    fewer than k distinct ids (the sketch IS the value set), else
    (k-1)/u_k rounded to 4dp. Pure JVM expressions over the sketch
    rows — the raw stream is long gone."""
    u_k = _kmv_frac(F.element_at("hs", k))
    return sketches.select(
        key_col,
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.round(F.lit(float(k - 1)) / u_k, 4))
        .alias("est_uniques"),
    )


def kmv_merge(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Union-merge sketch rows into ONE range sketch: explode the
    (tiny) hash arrays, distinct, bottom-k again. Input is |days|·k
    rows — KB-scale; lossless in the KMV sense (the merged sketch
    equals the sketch of the concatenated streams, pinned exactly in
    tests)."""
    w = Window.orderBy("h")
    return (
        sketches.select(F.explode("hs").alias("h"))
        .distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .agg(
            F.sort_array(F.collect_list("h")).alias("hs"),
            F.max("_r").alias("n_kept"),
        )
        .select(F.lit("ALL").cast("string").alias("day_key"), "hs", "n_kept")
    )


def kmv_set_overlap(
    events: DataFrame,
    k: int = 64,
    id_col: str = "user_id",
    type_col: str = "event_type",
    n_salts: int = 32,
) -> DataFrame:
    """KMV SET-OPERATION estimates between per-type distinct-id
    sketches — the mergeable-sketch story extended from union-only
    (kmv_merge) to intersection/Jaccard (Beyer et al. 2007 §5): for
    each unordered pair of event types, estimate how many distinct
    users the two types share, from k-sized sketches alone.

    The estimator: U = bottom-k of (hs_a ∪ hs_b) is itself a valid
    KMV sketch of A ∪ B, so (k-1)/u_k over U estimates the union; the
    fraction of U's members present in BOTH input sketches is an
    unbiased Jaccard estimate; intersection ≈ J · |A ∪ B|. Everything
    is md5-deterministic — sketches, union slice, and both estimates
    replay bit-for-bit in the DuckDB oracle (the HLL-vs-KMV trade
    documented at kmv_daily_sketches).

    Scale: ONE distinct-hash shuffle over (type, id) builds all
    sketches (the salted bottom-k of kmv_sketches_by_key); the
    pairwise stage touches only |types|²·k array cells — sketch-scale,
    not data-scale. Sub-k unions estimate exactly (the sketch IS the
    value set), same convention as kmv_estimate.

    Output: (type_a, type_b, n_union_kept, n_common, jaccard_micro,
    est_a, est_b, est_union, est_intersection) with type_a < type_b;
    jaccard_micro = n_common·1e6 div n_union_kept (exact BIGINT).
    """
    keyed = events.select(
        F.col(type_col).alias("tk"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    )
    sk = kmv_sketches_by_key(keyed, k=k, key_col="tk", n_salts=n_salts)
    a = sk.select(
        F.col("tk").alias("type_a"),
        F.col("hs").alias("hs_a"),
        F.col("n_kept").alias("n_a"),
    )
    b = sk.select(
        F.col("tk").alias("type_b"),
        F.col("hs").alias("hs_b"),
        F.col("n_kept").alias("n_b"),
    )
    paired = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    return _kmv_pair_estimates(paired, k).select(
        "type_a", "type_b", "n_union_kept", "n_common", "jaccard_micro",
        "est_a", "est_b", "est_union", "est_intersection",
    )


def _kmv_pair_estimates(paired: DataFrame, k: int) -> DataFrame:
    """Append the KMV set-operation estimate columns to a frame of
    sketch PAIRS (hs_a, hs_b, n_a, n_b + any carry-through keys) —
    the shared core of kmv_set_overlap (type pairs) and
    kmv_day_overlap (consecutive-day pairs)."""
    est = lambda n_col, hs_col: (  # noqa: E731 — local estimator expr
        F.when(F.col(n_col) < k, F.col(n_col).cast("double")).otherwise(
            F.round(F.lit(float(k - 1)) / _kmv_frac(F.element_at(hs_col, k)), 4)
        )
    )
    return (
        paired.withColumn(
            "u", F.slice(F.array_sort(F.array_union("hs_a", "hs_b")), 1, k)
        )
        .withColumn("n_union_kept", F.size("u"))
        .withColumn(
            "n_common",
            F.size(F.array_intersect(F.array_intersect("u", "hs_a"), "hs_b")),
        )
        .withColumn(
            "jaccard_micro",
            F.expr("CAST(n_common AS BIGINT) * 1000000 div n_union_kept"),
        )
        .withColumn("est_a", est("n_a", "hs_a"))
        .withColumn("est_b", est("n_b", "hs_b"))
        .withColumn(
            "est_union",
            F.when(
                F.col("n_union_kept") < k, F.col("n_union_kept").cast("double")
            ).otherwise(
                F.round(F.lit(float(k - 1)) / _kmv_frac(F.element_at("u", k)), 4)
            ),
        )
        .withColumn(
            "est_intersection",
            F.round(
                F.col("n_common").cast("double")
                / F.col("n_union_kept").cast("double")
                * F.col("est_union"),
                4,
            ),
        )
    )


def kmv_day_overlap(
    sketches: DataFrame,
    k: int = 64,
    day_col: str = "day",
) -> DataFrame:
    """Day-over-day set overlap from per-day KMV sketches: for every
    pair of CONSECUTIVE days, the estimated distinct-id overlap — the
    returning-users (or shared-vocabulary) readout, answered from
    k-row sketches without touching the raw stream. Input is any
    per-day sketch frame ((day, hs, n_kept) — kmv_daily_sketches or
    the streaming-maintained vocab_kmv table); the pairing join is
    sketch-count-scale.

    Output: (day, next_day, n_union_kept, n_common, jaccard_micro,
    est_a, est_b, est_union, est_intersection) with est_a = day's
    uniques, est_b = next day's, est_intersection = the estimated
    overlap (returning ids).
    """
    a = sketches.select(
        F.col(day_col).alias("day"),
        F.col("hs").alias("hs_a"),
        F.col("n_kept").alias("n_a"),
    )
    b = sketches.select(
        F.col(day_col).alias("next_day"),
        F.col("hs").alias("hs_b"),
        F.col("n_kept").alias("n_b"),
    )
    paired = a.join(
        F.broadcast(b), F.col("next_day") == F.date_add(F.col("day"), 1)
    )
    return _kmv_pair_estimates(paired, k).select(
        "day", "next_day", "n_union_kept", "n_common", "jaccard_micro",
        "est_a", "est_b", "est_union", "est_intersection",
    )
