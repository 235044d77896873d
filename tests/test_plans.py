"""Physical-plan audits: the scale contract, asserted.

Each test pins a property the 100 TB design depends on — filter
pushdown to the parquet scan, column pruning, broadcast of small join
sides, map-side partial aggregation, whole-stage codegen — so a
regression that silently de-optimizes a plan fails CI, not the
cluster."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _formatted(df, spark) -> str:
    """Formatted explain: unlike executedPlan().toString(), scan
    PushedFilters lists are NOT width-truncated here."""
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_pricing_summary_pushdown_and_pruning(spark):
    df = E.queries()["pricing_summary"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, (
        "date filter must reach the parquet scan"
    )
    # column pruning: untouched wide columns never leave the scan
    assert "l_comment" not in plan and "l_shipinstruct" not in plan
    # codegen spans appear once AQE finalizes — execute, then inspect
    # ("*(n)" marks a WholeStageCodegen stage in the plan string)
    df.collect()
    assert "*(1)" in _plan(df)


def test_pricing_summary_partial_aggregation(spark):
    plan = _plan(E.queries()["pricing_summary"](spark, SF))
    # map-side combine: a partial_sum before the exchange, final after
    assert "partial_sum" in plan and "Exchange hashpartitioning(l_returnflag" in plan


def test_nation_revenue_broadcasts_dims(spark):
    plan = _plan(E.queries()["nation_revenue"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, (
        "nation/region (and with AQE typically customer) must broadcast"
    )


def test_order_revenue_join_filters_pushed(spark):
    plan = _plan(E.queries()["order_revenue"](spark, SF))
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan


def test_multi_device_join_is_equi_keyed(spark):
    """J1 must plan as an equi-join on uid with the theta terms as
    residual filters — never a cartesian/BNL join."""
    plan = _plan(E.queries()["multi_device_users_join"](spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_exact_dedup_partial_agg(spark):
    plan = _plan(E.queries()["exact_dedup"](spark, SF))
    assert "partial_min" in plan or "partial_count" in plan, "map-side combine on the digest groupBy"


def test_minhash_no_cartesian(spark):
    plan = _plan(E.queries()["minhash_lsh"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_bruteforce_broadcasts_queries(spark):
    """The query batch broadcasts; the corpus is never shuffled."""
    plan = _plan(E.all_queries()["ann_bruteforce"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_dedup_stays_jvm_side(spark):
    """No Python eval in the dedup/text hot paths — everything is
    built-in expressions (SURVEY §2.10: zero UDFs for parity ops)."""
    for name in ["minhash_lsh", "simhash", "text_quality", "fingerprint", "exact_dedup"]:
        plan = _plan(E.queries()[name](spark, SF))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_scan_day_filter_constant_folded(spark):
    """Retention cutoffs fold to literals before reaching the scan."""
    opt = _optimized(E.queries()["scalar_functions"](spark, SF))
    assert "add_months" not in opt.lower() or "retention_cutoff" in opt


def test_no_pushdown_duplicated_folds(spark):
    """Inferred isnotnull constraints on computed join/filter inputs
    must NOT be pushed to the scan with the computing expression
    substituted in — that evaluates the bucket/cell/norm fold twice
    per row. Guarded by non-nullable (coalesce-wrapped) outputs in
    bucket_ids / norm / ivf cell assignment."""
    qall = E.all_queries()
    for name in [
        "ann_bruteforce", "ann_lsh", "ann_ivf",
        "embedding_neardup", "embedding_neardup_lsh",
        "minhash_lsh", "jaccard_dedup", "simhash",
    ]:
        opt = _optimized(qall[name](spark, SF))
        for line in opt.split("\n"):
            if "Filter" in line:
                assert "aggregate(" not in line and "array_sort(" not in line, (
                    f"{name}: expression-substituted filter:\n{line[:300]}"
                )


def test_decontam_broadcasts_probe(spark):
    """The benchmark/probe gram set must broadcast so the corpus side
    never shuffles (the scale contract of decontamination)."""
    plan = _plan(E.queries()["ngram_decontam"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(gh" not in plan, (
        "corpus grams must not shuffle on the digest key"
    )


def test_pii_scrub_is_shuffle_free_projection(spark):
    """pii_scrub is a per-row JVM projection: no exchange beyond the
    parallelism-floor repartition of the single-file test input, and
    no Python eval (regexp stays codegen-side)."""
    plan = _plan(E.queries()["pii_scrub"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan, (
        "pii_scrub must not hash-shuffle"
    )


def test_pack_sequences_single_block_shuffle(spark):
    """Sequence packing shuffles exactly once, on the block key, and
    the next-fit fold runs entirely in the JVM (r14: the former
    applyInPandas block loop cost ~2x the stage in per-block pandas
    framing + the row-at-a-time Python loop — guide §4)."""
    plan = _plan(E.queries()["pack_sequences"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    for node in ("FlatMapGroupsInPandas", "FlatMapGroupsInArrow",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, f"Python boundary reintroduced: {node}"
    assert "collect_list" in plan  # the per-block fold input


def test_semantic_dedup_single_cell_keyed_exchange(spark):
    """SemDeDup's within-cell pairwise stage must key on the cell —
    ONE corpus-scale exchange hash-partitioned on cell feeding the
    per-cell Arrow kernel (r14: GEMM prefilter + exact-fold verify
    replaced the a×b pair join, which shuffled `assigned` on cell
    TWICE), never a cartesian: the O(sum |cell|^2) cost model depends
    on it (VERDICT r7 #3 pin)."""
    plan = _plan(E.queries()["semantic_dedup"](spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the pair stage is CELL-KEYED: exactly one hash exchange on cell
    # routes vectors into the per-cell kernel
    assert plan.count("Exchange hashpartitioning(cell") == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan


def test_heavy_hitters_merge_input_is_summary_scale(spark):
    """The mergeable-MG pipeline never shuffles the raw token stream:
    the only exchange below the kernel is the pinned doc_id
    repartition; the merge input is the <= P*k-row kernel output,
    folded on the driver (VERDICT r7 #3 pin). The registry entry
    returns a LocalTableScan of <= k merged rows."""
    from fxa_activity_metrics_spark.operators.dedup import tokens
    from fxa_activity_metrics_spark.operators.rollup import misra_gries_summaries
    from fxa_activity_metrics_spark.sources.testdata import read_table
    from pyspark.sql import functions as F

    docs = (
        read_table(spark, SF, "documents")
        .repartition(16, F.col("doc_id"))
        .sortWithinPartitions("doc_id")
    )
    items = docs.select(F.explode(tokens("text")).alias("item"))
    summaries = misra_gries_summaries(items, "item", k=48)
    plan = _plan(summaries)
    # the raw exploded stream feeds mapInPandas directly: no exchange
    # between the explode and the kernel beyond the pinned repartition
    assert plan.count("Exchange") == 1, plan
    assert "MapInPandas" in plan
    assert summaries.count() <= 16 * 48

    out = E.q_heavy_hitters(spark, SF)
    # final merge folded on the driver: the result is a local relation
    # (createDataFrame -> ExistingRDD/LocalTableScan), not a plan over
    # the stream
    out_plan = _plan(out)
    assert "ExistingRDD" in out_plan or "LocalTableScan" in out_plan
    assert out.count() <= 48


def test_waiting_suppliers_single_fact_shuffle_key(spark):
    """Q21's EXISTS/NOT-EXISTS rewrite reuses ONE shuffle key
    (l_orderkey) for the per-order aggregate and the join-back;
    supplier/nation stay broadcast."""
    plan = _plan(E.queries()["waiting_suppliers"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_forecast_revenue_change_pure_scan_agg(spark):
    """Q6 is the scan-path proof: all three predicates reach the
    parquet scan and the only exchange is the final 1-row agg."""
    plan = _formatted(E.queries()["forecast_revenue_change"](spark, SF), spark)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    assert "partial_sum" in plan
    assert "Join" not in plan


def test_local_supplier_volume_compound_broadcast_key(spark):
    """Q5's local predicate (c_nationkey = s_nationkey) must ride the
    supplier broadcast join as an equi-key, never a post-join filter
    or a nested-loop."""
    plan = _plan(E.queries()["local_supplier_volume"](spark, SF))
    assert "BroadcastHashJoin [l_suppkey" in plan and "c_nationkey" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_national_market_share_single_fact_pass(spark):
    """Q8's share ratio is ONE aggregation pass: the lineitem scan
    appears once, with numerator and denominator as conditional
    partial sums."""
    plan = _plan(E.queries()["national_market_share"](spark, SF))
    assert plan.count("lineitem.parquet") == 1
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_product_type_profit_name_prefix_pushed(spark):
    """Q9's LIKE 'green%' prunes part at the scan (StringStartsWith),
    and both dims broadcast — no fact-fact join at all."""
    plan = _plan(E.queries()["product_type_profit"](spark, SF))
    assert "StringStartsWith(p_name,red)" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_returned_item_revenue_dims_join_after_limit(spark):
    """Q10's customer/nation dims must join the 20-row top-k result,
    not the fact: the plan takes the ordered limit BELOW the
    broadcast joins."""
    plan = _plan(E.queries()["returned_item_revenue"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # the limit feeds the joins: TakeOrdered appears deeper (later in
    # the tree dump) than the broadcast joins that consume it
    assert plan.index("TakeOrderedAndProject") < plan.index("customer.parquet")


def test_important_stock_total_reuses_aggregate(spark):
    """Q11's global scalar must derive from the per-part aggregate
    (ReuseExchange / reused subtree), never a second lineitem scan;
    the scalar joins as a 1-row broadcast."""
    plan = _plan(E.queries()["important_stock"](spark, SF))
    assert plan.count("lineitem.parquet") <= 2  # once + possible reuse dump
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar join
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_late_shipment_priority_residual_on_equi_join(spark):
    """Q12's late predicate references both sides, so it must ride the
    orderkey equi-join as a residual — never force a nested-loop."""
    plan = _plan(E.queries()["late_shipment_priority"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_dominant_part_suppliers_no_second_fact_scan(spark):
    """Q20's per-part totals re-aggregate the (part, supplier) frame;
    the branded fact scan must not run twice uncached (ReuseExchange
    serves the second reader) and the name prefix pushes down."""
    df = E.queries()["dominant_part_suppliers"](spark, SF)
    plan = _plan(df)
    assert "StringStartsWith(p_name,small)" in plan
    assert "CartesianProduct" not in plan
    df.collect()
    assert "ReusedExchange" in _plan(df) or plan.count("lineitem.parquet") == 1


def test_bloom_decontam_gate_is_scan_side_expression(spark):
    """Forced-bloom mode (fallback_grams=0): the bloom gate must be a
    pure expression (bitset literal + shiftrightunsigned) filtering
    the corpus BEFORE the only join — the exact-confirm broadcast. No
    shuffle join anywhere."""
    from fxa_activity_metrics_spark.operators import dedup
    import __spark_entry__ as E2

    docs = E2._docs(spark, SF)
    df = dedup.bloom_decontaminate(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        n=4,
        fallback_grams=0,
    )
    plan = _plan(df)
    assert "shiftrightunsigned" in plan
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_decontam_registry_fallback_is_single_broadcast_join(spark):
    """At every committed scale factor the probe set is far below the
    2^20-gram crossover, so the REGISTRY query must take the fallback:
    one broadcast digest join, zero bitset expressions, zero shuffle
    joins — within noise of the exact twin ngram_decontam."""
    plan = _plan(E.queries()["bloom_decontam"](spark, SF))
    assert "shiftrightunsigned" not in plan, "bitset gate should be skipped"
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_daily_spikes_range_window_on_aggregate(spark):
    """The trailing gate is a calendar-bounded RANGE frame over the
    per-day AGGREGATE (day-scale rows), never over raw events — the
    single-partition window is safe because its input is one row per
    day. Scan prunes to the timestamp column only."""
    df = E.queries()["daily_spikes"](spark, SF)
    plan = _formatted(df, spark)
    assert "specifiedwindowframe(RangeFrame, -7, -1)" in plan
    assert "ReadSchema: struct<ts:timestamp_ntz>" in plan, "column pruning lost"
    # window input is the post-aggregate: the Window sits above the
    # final HashAggregate, and no join exists anywhere
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_locf_fill_single_entity_exchange_no_cartesian(spark):
    """The uid x observed-days grid builds from ONE broadcast nested
    loop (day list is calendar-scale, explicitly broadcast); the
    observation join is a broadcast hash join; the carry-forward
    window is entity-partitioned (never a bare global window)."""
    df = E.queries()["locf_fill"](spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "windowspecdefinition(uid#" in plan, "LOCF window must partition by uid"


def test_pricing_rollup_single_expand_single_exchange(spark):
    """The ROLLUP lattice is ONE Expand + one hash-aggregate pass —
    never one aggregation job per grouping set."""
    df = E.queries()["pricing_rollup"](spark, SF)
    plan = _formatted(df, spark)
    assert plan.count("(2) Expand") + plan.count("Expand (") >= 1
    assert plan.count("+- Expand") == 1, "exactly one Expand node"
    # one shuffle: the grouping-set-keyed aggregate exchange
    assert plan.count("+- Exchange") == 1
    assert "partial_count" in plan, "map-side partial aggregation lost"


def test_event_type_pivot_no_distinct_values_prepass(spark):
    """Fixed-list pivot: the value list is compiled into pivotfirst
    literals, so CONSTRUCTING the frame runs zero Spark jobs (a
    values-less pivot runs an eager distinct job per call — the
    anti-pattern this pins out)."""
    from pyspark.sql import functions as F

    sc = spark.sparkContext
    # isolate the pivot step: each parquet read runs one schema job
    # that is not the pivot's doing, so build the base frame first
    base = E._t(spark, SF, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    all_before = len(sc.statusTracker().getJobIdsForGroup())
    base.groupBy("day").pivot(
        "event_type", ["click", "error", "purchase", "signup", "view"]
    ).count()
    all_after = len(sc.statusTracker().getJobIdsForGroup())
    assert all_after == all_before, "fixed-list pivot ran an eager job"
    df = E.queries()["event_type_pivot"](spark, SF)
    plan = _plan(df)
    assert "pivotfirst(event_type" in plan
    assert "click, error, purchase, signup, view" in plan, "fixed value list"
    assert "Join" not in plan


def test_hard_negatives_broadcasts_queries_no_smj(spark):
    """The label-exclusion predicate lives INSIDE the broadcast join
    condition: the corpus never shuffles, same-label pairs never
    materialize, and there is no sort-merge fallback."""
    df = E.queries()["hard_negatives"](spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # scale contract: exactly one exchange family — the per-query
    # top-k window; the scoring join itself is exchange-free
    assert "CartesianProduct" not in plan


def test_text_ann_sparse_dot_is_one_bucket_join(spark):
    """The sparse dot product joins on the bucket index with the
    (bounded) query side broadcast — the corpus vector rows never
    sort-merge, never cartesian."""
    df = E.queries()["text_ann"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the per-(query, neighbor) dot aggregates with map-side partials
    assert plan.count("HashAggregate") >= 2


def test_cluster_keepers_window_is_cluster_partitioned(spark):
    """The keeper window partitions on cluster_id (node-scale), and
    the weight join is a broadcast/shuffle equi-join — never a
    cartesian."""
    df = E.queries()["cluster_keepers"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" in plan and "cluster_id" in plan


def test_kmv_overlap_pair_stage_is_sketch_scale(spark):
    """The pairwise estimator joins sketch rows (|types| each side)
    with the small side broadcast — no shuffle join of sketch
    frames, no cartesian over raw events."""
    df = E.queries()["kmv_overlap"](spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
