"""Physical-plan assertions: the optimizations SURVEY.md §4 marks as
"free from Catalyst — verify via explain" are actually in the plans."""

from __future__ import annotations

from mapreduce_server_spark import REGISTRY
from mapreduce_server_spark.plans import plan_string

from .conftest import SF001


def _plan(spark, key: str, mode: str = "formatted") -> str:
    return plan_string(REGISTRY[key].fn(spark, SF001), mode)


def test_scan_project_pushdown_and_pruning(spark):
    p = _plan(spark, "scan_project")
    assert "PushedFilters" in p and "GreaterThanOrEqual(l_shipdate" in p
    # pruned read: only the 3 referenced columns reach the scan
    assert "l_orderkey" in p.split("ReadSchema")[1][:200]
    assert "l_tax" not in p


def test_q1_two_phase_aggregation(spark):
    p = _plan(spark, "q1_pricing_summary")
    assert p.count("HashAggregate") >= 2  # partial + final (MR combiner, free)
    assert "PushedFilters" in p and "LessThanOrEqual(l_shipdate" in p


def test_join_broadcast_is_broadcast(spark):
    p = _plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in p
    assert "BroadcastExchange" in p


def test_topk_plans_take_ordered(spark):
    p = _plan(spark, "topk_global")
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p  # top-k never shuffles the table


def test_knn_bruteforce_no_shuffle(spark):
    p = _plan(spark, "knn_bruteforce")
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p


def test_wordcount_partial_aggregation(spark):
    p = _plan(spark, "text_wordcount")
    assert p.count("HashAggregate") >= 2


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in _plan(spark, "join_semi")
    assert "LeftAnti" in _plan(spark, "join_anti")


def test_bucketed_join_no_shuffle(spark):
    REGISTRY["join_bucketed"].fn(spark, SF001).collect()  # materialize tables
    p = _plan(spark, "join_bucketed")
    # bucketed layout: scans report Bucketed: true and NOTHING in the plan
    # shuffles — the join uses the layout (or broadcasts the small side)
    # and the groupBy(custkey) aggregation rides the same bucketing
    assert "Bucketed: true" in p
    assert "Exchange hashpartitioning" not in p


def test_salted_agg_two_stage(spark):
    p = _plan(spark, "agg_salted")
    # stage-1 on (key, salt), stage-2 on key → at least 3 HashAggregates
    assert p.count("HashAggregate") >= 3


def test_shared_scan_cache_reuse(spark):
    """Recurring-workload pattern (shared execution of recurring
    workloads, VLDB'15): cache a shared intermediate once; subsequent
    queries read the in-memory columnar form instead of rescanning."""
    from mapreduce_server_spark.sources.loader import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF001, "lineitem").filter(F.col("l_quantity") > 25)
    li.cache()
    try:
        li.count()  # materialize
        q1 = li.groupBy("l_returnflag").count()
        q2 = li.agg(F.sum("l_quantity"))
        assert "InMemoryTableScan" in plan_string(q1, "simple")
        assert "InMemoryTableScan" in plan_string(q2, "simple")
        assert q1.count() == 3
    finally:
        li.unpersist()


def test_tpch_suite_broadcasts_dimensions(spark):
    """The new TPC-H shapes keep dimension chains broadcast: the only
    sort-merge/shuffled joins allowed are fact-fact (lineitem-orders)."""
    for key in ("q5_local_volume", "q7_volume_shipping", "q9_product_profit"):
        p = _plan(spark, key)
        assert "BroadcastHashJoin" in p, key
    # q19: part broadcast, zero Exchange before the final 1-row agg
    p = _plan(spark, "q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in p


def test_q4_semi_join_shape(spark):
    p = _plan(spark, "q4_priority_exists")
    assert "LeftSemi" in p
    assert "PushedFilters" in p and "o_orderdate" in p.split("PushedFilters")[1][:400]


def test_q6_all_predicates_pushed(spark):
    p = _plan(spark, "q6_forecast_revenue")
    pushed = p.split("PushedFilters")[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, col
    assert p.count("HashAggregate") >= 2


def test_q16_not_in_is_anti_join(spark):
    p = _plan(spark, "q16_supplier_counts")
    assert "LeftAnti" in p


def test_q21_single_pass_flags(spark):
    """The window form computes both per-order flags on one orderkey
    partitioning: lineitem⋈orders must appear ONCE (the self-join form
    duplicates the whole subtree), and exchanges stay bounded at
    join(2) + (ok,sk) agg + ok window + s_name agg + supplier
    broadcast = 6."""
    import re

    # fresh plan (module fn, not the registry's memoized one): a prior
    # collect() finalizes AQE and explain() then prints final + initial
    # trees, double-counting nodes
    from mapreduce_server_spark.operators.tpch_suite import q21_waiting_suppliers

    p = plan_string(q21_waiting_suppliers(spark, SF001), "formatted")
    assert p.count("lineitem.parquet") == 1
    n_exchanges = len(re.findall(r"\(\d+\) (?:Broadcast)?Exchange", p))
    assert n_exchanges <= 6, p


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling, observed end-to-end: a deliberately skewed
    key (99% of lineitem on one key) through a forced sort-merge join
    must show skew=true splits in the finalized adaptive plan once the
    skew thresholds are scaled down to fixture size.

    Two preconditions discovered empirically (both scale lessons):
    - OptimizeSkewedJoin matches SMJ(Sort(ShuffleStage), Sort(ShuffleStage))
      only — an aggregate (or any operator) atop either shuffle blocks the
      split, so the probe side must be a bare shuffled relation.
    - Splitting reads *subsets of map outputs*, so the skewed side needs
      >1 mapper; a single small parquet file scans as one map task and its
      skewed partition cannot be split. repartition(16) provides mappers.
    """
    from pyspark.sql import functions as F

    from mapreduce_server_spark.sources.loader import load_table

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF001, "lineitem").repartition(16)
        skewed = li.withColumn(
            "k",
            F.when(F.col("l_orderkey") % 100 < 99, F.lit(0)).otherwise(
                F.col("l_orderkey")
            ),
        ).select("k", "l_quantity")
        right = spark.range(0, 200000).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        )
        joined = skewed.join(right, "k").select("k", "l_quantity", "v")
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert len(rows) == skewed.count()  # unique-key right side: no fan-out
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Spark's runtime bloom-filter join pruning (the 100 TB shuffle
    saver): with a selective dimension filter, the optimizer injects
    bloom_filter_agg on the build side and might_contain on the fact
    scan, so fact rows that cannot join are dropped BEFORE the shuffle.
    Fixture scans are below the default 10 GB application-side threshold,
    so the thresholds are scaled to fixture size — at real scale the
    defaults fire on their own. Results must equal the unfiltered-plan
    join exactly (a bloom false positive only wastes a probe, never
    changes the join output)."""
    from pyspark.sql import functions as F

    from mapreduce_server_spark.sources.loader import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF001, "lineitem")
        s = load_table(spark, SF001, "supplier").filter(F.col("s_acctbal") > 9000)
        j = (
            li.join(s, li.l_suppkey == s.s_suppkey)
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan
        got = {(r.s_nationkey, r.n) for r in j.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    li = load_table(spark, SF001, "lineitem")
    s = load_table(spark, SF001, "supplier").filter(F.col("s_acctbal") > 9000)
    ref = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got == {(r.s_nationkey, r.n) for r in ref.collect()}


def test_join_strategy_hints_select_physical_operators(spark):
    """The hint surface maps to physical strategies: broadcast →
    BroadcastHashJoin, merge → SortMergeJoin, shuffle_hash →
    ShuffledHashJoin — the per-query escape hatch when statistics (or
    AQE) pick wrong at scale. Results are strategy-invariant; only the
    operator changes."""
    from mapreduce_server_spark.plans import plan_string
    from mapreduce_server_spark.sources.loader import Tables

    t = Tables(spark, SF001)
    o, c = t.orders, t.customer
    cond = o.o_custkey == c.c_custkey

    def planned(hinted):
        return plan_string(o.join(hinted, cond).select("o_orderkey"), "simple")

    assert "BroadcastHashJoin" in planned(c.hint("broadcast"))
    assert "SortMergeJoin" in planned(c.hint("merge"))
    assert "ShuffledHashJoin" in planned(c.hint("shuffle_hash"))


def test_lateral_decorrelates_to_window_topk(spark):
    """The LATERAL top-2-per-customer subquery must decorrelate: no
    nested-loop execution of the inner query per outer row — the plan is
    the same window/filter shape win_rownum_topk builds by hand."""
    plan = _plan(spark, "join_lateral", "simple")
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_map_in_arrow_is_shuffle_free_python(spark):
    """The Arrow UDF rung is a narrow map: Python eval node present,
    zero exchanges — the corpus never moves."""
    p = _plan(spark, "udf_map_in_arrow")
    assert "PythonMapInArrow" in p or "MapInArrow" in p
    assert "Exchange" not in p


def test_stratified_sample_fact_not_shuffled(spark):
    """Only the tiny per-stratum count dim shuffles; the fact table gets
    a broadcast join + narrow filter (1 exchange total, on the counts)."""
    p = _plan(spark, "sample_stratified")
    assert "BroadcastHashJoin" in p
    assert p.count("Exchange hashpartitioning") <= 1


def test_mad_outliers_broadcasts_stats(spark):
    """The 5-row median/MAD stats dim must broadcast back onto the
    events scan — never a shuffle join of the fact table."""
    p = _plan(spark, "ts_mad_outliers")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_interpolate_windows_share_one_exchange(spark):
    """Both window passes (ascending prev + descending next) key on
    user_id — one hash exchange feeds two sorts; and no O(n²)
    unbounded-following frame survives in the plan."""
    p = _plan(spark, "ts_interpolate")
    assert "unboundedfollowing$()" not in p.lower().replace(" ", "")
    assert p.count("Exchange hashpartitioning") <= 2  # hourly agg + window


def test_global_window_topk_never_single_partition_sorts(spark):
    """Fence for the load-bearing limit-through-window rewrite (round-8
    verdict item 3): sort_global / sort_multi read as a GLOBAL window
    (`row_number() OVER (ORDER BY …) ≤ 1000` with no PARTITION BY) —
    naively a single-partition sort of the whole table, the classic
    scale-killer. Catalyst's LimitPushDownThroughWindow /
    InferWindowGroupLimit rewrites it into a distributed top-k
    (per-partition heaps + driver merge): the physical plan must show
    TakeOrderedAndProject (or a WindowGroupLimit) BELOW the window and
    ZERO exchanges. A Spark upgrade or an innocent edit (extra window
    function, rank frame the rewrite can't handle) would silently
    reintroduce the 1-partition sort — this test makes that loud."""
    for key in ("sort_global", "sort_multi"):
        p = _plan(spark, key)
        assert "TakeOrderedAndProject" in p or "WindowGroupLimit" in p, (
            key,
            p,
        )
        assert "Exchange" not in p, (key, p)
        # the full-table global Sort must NOT survive as a plan node
        # (TakeOrderedAndProject subsumes ordering; a standalone Sort
        # means the rewrite did not fire)
        import re

        assert re.search(r"\bSort \(\d+\)", p) is None, (key, p)


def test_triangles_ordered_caches_shared_subtrees(spark):
    """The multiply-referenced edge/oriented frames must come from the
    cache (InMemoryTableScan), not re-derived lineage."""
    p = _plan(spark, "graph_triangles_ordered")
    assert "InMemoryTableScan" in p


def test_rank_rrf_semantic_list_never_window_sorts_the_corpus(spark):
    """rank_rrf's semantic top-20 is `row_number() <= 20` over the
    whole embeddings corpus — load-bearing on Catalyst capping the
    window's INPUT, exactly like the sort_global fence. Here the
    rewrite that fires is LimitPushDownThroughWindow: a distributed
    TakeOrderedAndProject(limit=20) sits BELOW the rank window, so the
    unpartitioned window only ever sees 20 rows (WindowGroupLimit is
    the other acceptable spelling). Without either, the full corpus
    moves to one partition for the rank sort."""
    p = _plan(spark, "rank_rrf", mode="simple")
    assert (
        "TakeOrderedAndProject(limit=20" in p or "WindowGroupLimit" in p
    ), p


def test_knn_filter_is_shuffle_free_scan(spark):
    """Filtered IVF probe over the MATERIALIZED cell-partitioned index
    (round-10: _ivf_index, written once per session): ZERO exchanges,
    TakeOrderedAndProject, the probed cells as a PARTITION filter (the
    8 non-probed cell directories are never opened — file-listing-level
    pruning, the real 100 TB win), and the label predicate pushed to
    parquet row groups. Losing any of these silently reverts filtered
    ANN to a full-corpus scan."""
    p = _plan(spark, "knn_filter")
    assert "Exchange" not in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "PushedFilters: [" in p and "label" in p.split("PushedFilters")[1][:200], p
    assert (
        "PartitionFilters" in p
        and "cluster" in p.split("PartitionFilters")[1][:120]
    ), p
