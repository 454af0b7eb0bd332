"""Physical-plan assertions: the scale posture, checked mechanically.

These tests pin the *plan shapes* that make the engine viable at 100 TB
— a regression that silently turns a broadcast join into a shuffle, or
un-pushes a scan filter, fails here long before any fixture-scale
latency would notice.
"""

from __future__ import annotations

import pytest

from noaa_etl_spark.plans import formatted_plan
from noaa_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    """Full formatted physical plan (explain('formatted') — untruncated
    PushedFilters/ReadSchema, unlike plan.toString())."""
    return formatted_plan(QUERIES[name](spark, SF_DIR))


def test_join3_broadcasts_dim_and_heaps_topk(spark):
    plan = plan_of(spark, "q_join3_topk")
    assert "BroadcastHashJoin" in plan, "customer dim must broadcast"
    assert "TakeOrderedAndProject" in plan, "orderBy+limit must fuse into per-partition heaps"
    assert "CartesianProduct" not in plan


def test_join5_broadcasts_all_dims(spark):
    plan = plan_of(spark, "q_join5_region")
    # customer, supplier, nation, region all broadcast; the only
    # shuffled join is lineitem⋈orders.
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q_filter_predicates")
    assert "PushedFilters: [" in plan
    # The between/isin predicates are pushable; make sure at least one
    # made it into the parquet scan rather than a post-scan Filter only.
    assert "GreaterThanOrEqual(o_totalprice" in plan or "In(o_orderstatus" in plan


def test_column_pruning(spark):
    plan = plan_of(spark, "q_topk_global")
    # Scan must read only the two projected columns.
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan


def test_pricing_summary_partial_agg(spark):
    plan = plan_of(spark, "q_pricing_summary")
    # Spark plans partial (map-side) + final aggregation: two
    # HashAggregate nodes around the single exchange.
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_semi_anti_join_physical(spark):
    semi = plan_of(spark, "q_join_semi")
    anti = plan_of(spark, "q_join_anti")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_no_cartesian_in_relational_suite(spark):
    # Every relational/window/temporal query must avoid cartesian
    # products; only the brute-force knn pair space and the tiny
    # bounds/range joins may use nested-loop joins (bounded side).
    for name in [
        "q_pricing_summary",
        "q_join3_topk",
        "q_join5_region",
        "q_window_rank",
        "q_sessionize",
        "q_dedup_keyed",
        "q_interval_join",
        "q_tfidf",
    ]:
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_interval_join_is_equi_on_bucket(spark):
    # The banded interval join must hash-join on the day bucket, not
    # nested-loop over raw ranges.
    plan = plan_of(spark, "q_interval_join")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_dedup_exact_is_partial_aggregable(spark):
    plan = plan_of(spark, "q_dedup_exact")
    assert plan.count("HashAggregate") >= 2, "groupBy dedup must map-side combine"


def test_window_partitions_by_key(spark):
    plan = plan_of(spark, "q_window_rank")
    assert "Window" in plan
    assert "hashpartitioning(o_custkey" in plan, "window must shuffle by the partition key"


def test_aqe_coalesces_at_runtime(spark):
    """After execution, AQE's final plan must show coalesced shuffle
    reads — the runtime right-sizing that keeps partition counts sane
    when static sizing guesses wrong (the 100 TB default posture)."""
    df = QUERIES["q_pricing_summary"](spark, SF_DIR)
    df.collect()  # materialize so AQE finalizes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan, f"no AQE shuffle read in final plan:\n{plan[:2000]}"


def test_asof_join_single_shuffle(spark):
    # The as-of composition costs one shuffle of (probe ∪ build) on the
    # key plus window sort — no range/cartesian join.
    plan = plan_of(spark, "q_asof_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_semantic_dedup_lsh_plan_has_no_window(spark):
    """The corpus-scale dedup branch threshold-filters LSH candidates
    directly — it must NOT route through the knn top-k ranker, whose
    per-query row_number() window would sort every candidate list only
    for the threshold filter to discard the ranks."""
    plan = plan_of(spark, "q_semantic_dedup_lsh")
    assert "Window" not in plan, f"top-k detour crept back into semantic_dedup:\n{plan}"


def test_runtime_bloom_filter_injection(spark):
    """A selective filter on the build side of a SHUFFLE join must inject
    a runtime bloom filter into the probe-side scan (Spark's row-level
    runtime filtering): probe rows that can't join are dropped before the
    shuffle. The default thresholds target cluster scale (probe scan
    ≥ 10 GB), so they're lowered here to demonstrate the mechanism at
    fixture scale; at 100 TB the defaults fire on their own."""
    from pyspark.sql import functions as F

    from noaa_etl_spark.io import load_table

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = formatted_plan(j)
        assert "bloom_filter_agg" in plan, "no bloom filter built on the filtered side"
        assert j.count() > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_chunk_documents_is_narrow_only(spark):
    """Chunking must stay a pure map pipeline: any Exchange here means a
    per-row expression got re-planned as a wide op and the operator
    stops scaling linearly."""
    plan = plan_of(spark, "q_chunk_documents")
    assert "Exchange" not in plan


def test_pii_scrub_is_narrow_only(spark):
    plan = plan_of(spark, "q_pii_scrub")
    assert "Exchange" not in plan


def test_quantize_int8_is_narrow_only(spark):
    plan = plan_of(spark, "q_quantize_int8")
    assert "Exchange" not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram set must broadcast — a sort-merge join here
    would shuffle the full training corpus on the gram key, exactly the
    plan that dies at 100 TB. Per-doc array_distinct runs before the
    explode, so no distinct-shuffle of train grams exists either."""
    plan = plan_of(spark, "q_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # Shuffles: bench-side distinct + the two per-doc counts (+ final
    # small join input) + the r15 spread_small_scan repartition (a
    # deliberate +1, conditional no-op on multi-split real inputs) —
    # the train gram stream itself never exchanges on the GRAM key.
    # formatted_plan lists each node twice (tree + details), so 6
    # physical Exchanges appear as 12. (r16: the r15 spread landed
    # without this bound moving — the driver's -x pytest run never
    # reached this test; adjusted with the diagnosis recorded.)
    assert plan.count("Exchange") <= 12


def test_tpch_q6_pushes_every_predicate(spark):
    """Q6 is the pure scan shape: its filters must reach the parquet
    scan as PushedFilters, or the 100 TB version reads the whole fact
    table to throw most of it away."""
    plan = plan_of(spark, "q_tpch_q6_forecast")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan


def test_tpch_q18_broadcasts_qualifying_orders(spark):
    """Q18's HAVING-membership must resolve to a broadcast of the tiny
    qualifying-order aggregate, never a shuffled join of lineitem
    against itself."""
    plan = plan_of(spark, "q_tpch_q18_large_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quality_gate_is_narrow_only(spark):
    """The rule gate is array expressions only — an Exchange means a
    rule got re-planned as a wide op and the gate stops being a
    scan-local predicate stage."""
    plan = plan_of(spark, "q_quality_gate")
    assert "Exchange" not in plan


def test_repetition_filter_join_is_co_partitioned(spark):
    """Both repetition branches end hash-partitioned on doc_id, so the
    doc-grain join must add NO shuffle exchange beyond the four
    aggregate shuffles (2 per branch). At fixture scale the optimizer
    broadcasts the smaller branch instead (also fine — no 5th
    shuffle); what must never appear is a join-induced hash
    repartition or a cartesian. formatted_plan lists nodes twice, so
    4 physical shuffles appear as <= 8 'Exchange hash'/'Exchange (n)'
    mentions after stripping Broadcast/Reused prefixes."""
    import re

    plan = plan_of(spark, "q_repetition_filter")
    shuffles = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange", plan))
    assert shuffles <= 8
    assert "CartesianProduct" not in plan


def test_corpus_shuffle_shard_assignment_is_scan_local(spark):
    """Shard assignment (md5 nibble) must be decided in the scan
    projection — the only exchanges are the tiny 8-row report agg and
    its orderBy, never a repartition to COMPUTE placement."""
    plan = plan_of(spark, "q_corpus_shuffle_shard")
    # hash agg exchange + range sort exchange, doubled by formatted_plan
    assert plan.count("Exchange") <= 4
    assert "Window" not in plan


def test_profile_columns_is_single_pass(spark):
    """The profile must read the table ONCE: multi-column distinct
    counts plan as one Expand, and per-column report rows are a stack
    projection of the single aggregate row — never a scan per column
    (4 profiled columns reading 100 TB four times)."""
    plan = plan_of(spark, "q_profile_columns")
    # formatted_plan lists each node twice (tree + details)
    assert plan.count("Scan parquet") <= 2
    assert "Expand" in plan


def test_dq_checks_is_single_pass_with_broadcast_ref(spark):
    """All six rules (row rules + uniqueness + referential) fold into
    one aggregate over one broadcast-joined scan: one lineitem scan,
    one orders scan, broadcast join, no anti-join second pass."""
    plan = plan_of(spark, "q_dq_checks")
    assert plan.count("Scan parquet") <= 4  # lineitem + orders, listed twice
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fuzzy_name_match_never_plans_cartesian(spark):
    """The whole point of q-gram blocking: the candidate join is an
    equi-join on gram — a CartesianProduct or BroadcastNestedLoopJoin
    here means the blocker degenerated into the O(N²) cross join it
    exists to avoid. (The length-band inequality predicates ride the
    equi-join as join filters, not as the join condition.)"""
    plan = plan_of(spark, "q_fuzzy_name_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_feature_store_pit_never_plans_range_join(spark):
    """The PIT join is two (probe ∪ snapshot) windows — a
    CartesianProduct / nested-loop here means the as-of composition
    degenerated into the per-probe range join it exists to avoid; the
    event_type filters must reach the scans."""
    plan = plan_of(spark, "q_feature_store_pit")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # formatted plans mention each node twice (tree + detail section)
    assert plan.count("Window (") == 2
    assert "EqualTo(event_type,purchase)" in plan


def test_resample_interpolate_single_window_partitioning(spark):
    """prev/next neighbours are two frames over ONE user_id
    partitioning — Catalyst must evaluate both in a single sort, so
    exactly one Window spec partitioned by user_id (the grid explode is
    scan-local: no join against a calendar table)."""
    plan = plan_of(spark, "q_resample_interpolate")
    assert plan.count("Window (") <= 2  # backward + forward frames share the sort
    assert "CartesianProduct" not in plan


def test_perplexity_bigrams_are_scan_local(spark):
    """Bigram extraction must be transform(sequence(...)) over the token
    array — a position self-join (Sort/ShuffledHash join keyed on a
    position column) would shuffle the full token stream twice."""
    plan = plan_of(spark, "q_perplexity_filter")
    assert "CartesianProduct" not in plan
    # the vocab scalar rides a broadcast, never a shuffled join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_linear_trend_is_agg_only(spark):
    plan = plan_of(spark, "q_linear_trend")
    assert "Window" not in plan, "trend must come from algebraic sums, not a window"
    assert "Join" not in plan


def test_mode_by_group_is_window_free(spark):
    plan = plan_of(spark, "q_mode_by_group")
    assert "Window" not in plan, "min_by encodes the tie-break; no row_number sort"
    assert "BroadcastHashJoin" in plan, "customer dim must broadcast"


def test_stats_merge_is_agg_only(spark):
    plan = plan_of(spark, "q_incremental_stats_merge")
    assert "Window" not in plan and "Join" not in plan


def test_bm25_is_scan_local_plus_broadcast_stats(spark):
    """Per-term tf must be array HOF math on the token column (no
    explode: corpus tokens never enter a shuffle) and the one-row stats
    frame must ride a broadcast back — the only exchanges belong to the
    global stats aggregate."""
    plan = plan_of(spark, "q_bm25_rank")
    assert "Generate" not in plan, "explode crept into BM25 — tf must be scan-local"
    assert "BroadcastNestedLoopJoin" in plan, "stats row must broadcast"
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_token_budget_single_source_window(spark):
    """One window shuffle on source; token counts are scan-local."""
    plan = plan_of(spark, "q_token_budget_select")
    assert "Window (" in plan
    # one source-window shuffle is the only Exchange in the tree
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "Generate" not in plan and "Join" not in plan


def test_feature_hashing_single_combinable_agg(spark):
    """Hash/sign are scan-local; the only shuffle is the (doc, bucket)
    sum with a map-side partial."""
    plan = plan_of(spark, "q_feature_hashing")
    assert "Join" not in plan and "Window" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_string_agg_broadcasts_dims(spark):
    plan = plan_of(spark, "q_string_agg")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_seasonal_decompose_single_fact_pass(spark):
    """Fact scanned once: daily rollup then a window over the reduced
    relation — no agg + join-back (the double-plan smell)."""
    plan = plan_of(spark, "q_seasonal_decompose")
    assert "Join" not in plan
    assert "Window (" in plan


def test_decayed_sum_windows_share_partitioning(spark):
    """The min-day and running-sum windows share the event_type
    partitioning: one window exchange after the daily agg."""
    plan = plan_of(spark, "q_decayed_sum")
    assert "Join" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 2, tree


def test_skew_diagnose_single_scan(spark):
    """All three key-frequency tables must come from ONE scan (GROUPING
    SETS Expand), not three scans of the fact."""
    plan = plan_of(spark, "q_skew_diagnose")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert "Expand" in plan


def test_distinct_rollup_two_combinable_aggs(spark):
    plan = plan_of(spark, "q_distinct_rollup_exact")
    assert "Join" not in plan and "Window" not in plan


def test_rrf_fusion_heaps_not_global_sorts(spark):
    """Each ranker must reduce to its top-50 via per-partition heaps
    (orderBy+limit) before any rank window runs; the fusion join
    touches <=100 rows. A Window over the unreduced corpus would show
    as an Exchange+Sort ahead of the limit."""
    plan = plan_of(spark, "q_rrf_fusion")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_containment_uses_inverted_index_join(spark):
    """Candidate pairs must come from the shared-shingle equi-join
    (explode + join on gram), never a cross join.

    r16 note: the r15 optimization eagerly localCheckpoints the gram
    frame (4 readers), which TRUNCATES the explode out of the visible
    final plan (the curriculum_order precedent) — so the final plan is
    gated on the equi-join/no-cartesian structure it can still show,
    plus the checkpoint-scan evidence that the pre-computed gram frame
    (not a cross join) feeds the pair join. (The r15 checkpoint landed
    without this pin moving — the driver's -x pytest run never reached
    it; reconciled with the diagnosis recorded.)"""
    plan = plan_of(spark, "q_containment_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)
    assert "ExistingRDD" in plan  # the checkpointed gram/capped frames


def test_cusum_single_fact_pass_shared_windows(spark):
    """Fact scanned once into the daily rollup; the three window passes
    share the event_type partitioning (no agg + join-back)."""
    plan = plan_of(spark, "q_changepoint_cusum")
    assert "Join" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("Exchange") <= 2, tree


def test_ks_drift_windows_run_per_source(spark):
    """CDF windows run on the per-(source, value) reduced relation —
    partitioned by source, never a global single-partition window —
    and the only nested-loop join is the broadcast source replication."""
    plan = plan_of(spark, "q_ks_drift")
    assert "Window (" in plan
    assert "CartesianProduct" not in plan
    # source replication must be the broadcast side
    assert "BroadcastNestedLoopJoin" in plan


def test_winsorize_one_window_exchange(spark):
    """Both percentiles ride one unbounded window on event_type: a
    single exchange, no join-back."""
    plan = plan_of(spark, "q_winsorize")
    assert "Join" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree


def test_cdc_apply_single_fold_agg(spark):
    """The changelog folds in ONE map-side-combinable max_by aggregate
    — no window over the log, no per-op iteration; the apply is a
    single join against the base."""
    plan = plan_of(spark, "q_cdc_apply")
    assert "Window" not in plan
    # max_by is a typed-imperative aggregate → ObjectHashAggregate
    assert plan.count("Aggregate") >= 2, "fold must have a partial agg"
    assert "CartesianProduct" not in plan


def test_entropy_filter_zero_exchange(spark):
    """27 length-replace counts + the entropy chain are a pure
    projection: no explode, no aggregation, no shuffle ON THE TEXT
    KEY. r16: one spread_small_scan repartition sits before the
    projection (the 27 per-char rescans ran on the fixture's single
    scan task — 4.3 s warm vs 2.0 s spread; a no-op on multi-split
    real inputs), so the bound is exactly that one exchange."""
    plan = plan_of(spark, "q_entropy_filter")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 1, tree
    assert "Generate" not in plan and "Join" not in plan


def test_dp_noisy_counts_one_agg(spark):
    """One combinable count per group; noise is scan-local arithmetic
    on the |groups|-row result."""
    plan = plan_of(spark, "q_dp_noisy_counts")
    assert "Join" not in plan and "Window" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree


def test_golden_record_one_shuffle_all_attributes(spark):
    """All attribute survivorship rules ride ONE groupBy (K max_by
    expressions, not K joins); the replica expansion is a broadcast."""
    plan = plan_of(spark, "q_golden_record")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 3-row seq frame


def test_asof_nearest_single_key_exchange(spark):
    """Both direction-carries are windows over the SAME user partition:
    one hash exchange, two in-partition sorts, never a pair join."""
    plan = plan_of(spark, "q_asof_nearest")
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert tree.count("Window") == 2, tree  # backward + forward carry


def test_forecast_holt_folds_on_reduced_relation(spark):
    """The sequential fold runs over the |types|x|days| daily rollup —
    one fact scan, no window, no join."""
    plan = plan_of(spark, "q_forecast_holt")
    assert "Window" not in plan and "Join" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree


def test_gdpr_erasure_no_cartesian_cascade_cached(spark):
    """Cascade = key joins (no cartesian), and the flagged-orders
    frontier feeding both the orders report and the lineitem cascade
    reads the materialized cache, not a re-planned join. (Scan counts
    can't be asserted from formatted text here — explain prints the
    cached subtree's lineage too.)"""
    plan = plan_of(spark, "q_gdpr_erasure")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan


def test_winsorize_approx_no_window(spark):
    """The scale twin must never materialize a type's rows on one
    reducer: cutpoints are a mergeable sketch agg, the clamp a
    broadcast-join projection — zero Window operators."""
    for name in ("q_winsorize_approx", "q_anomaly_mad_approx"):
        plan = plan_of(spark, name)
        assert "Window" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        # the sketch side joins from the cache, not a re-derived agg
        assert "InMemoryTableScan" in plan, name


def test_event_sequence_one_user_exchange(spark):
    """Sequence assembly is one user-keyed exchange: the celebrity-cap
    row_number window partitions on user_id — the same partitioning the
    aggregate needs — so capping adds NO exchange; pattern counts are
    scan-local post-agg expressions (no second pass, no join)."""
    plan = plan_of(spark, "q_event_sequence")
    assert "Window" in plan  # the EVENT_SEQ_CAP rank filter
    assert "Join" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree


def test_pareto_two_phase_no_global_fact_sort(spark):
    """Phase-1 windows partition by bucket (parallel); only the pruned
    survivor set sees the unpartitioned range window."""
    plan = plan_of(spark, "q_pareto_frontier")
    assert "CartesianProduct" not in plan and "Join" not in plan
    # two window stages (bucketed + global-on-survivors)
    assert plan.count("Window") >= 2


def test_ab_test_single_agg_pass(spark):
    """All moments for both arms ride ONE grouped aggregate — no join,
    no second scan, no window."""
    plan = plan_of(spark, "q_ab_test_report")
    assert "Join" not in plan and "Window" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("Exchange") == 1, tree


def test_triangle_count_no_cartesian(spark):
    """Wedge enumeration and closure are equi-joins on node keys; a
    cartesian anywhere means the orientation trick was lost."""
    plan = plan_of(spark, "q_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spatial_radius_join_is_cell_blocked(spark):
    """The radius join must be an equi-join on grid cells with exact
    verification on candidates — never a cross join."""
    plan = plan_of(spark, "q_spatial_radius_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_attribution_single_pass_bucket_join(spark):
    """The lookback join must be a (user, week-bucket) equi-join with
    orphans riding the same pass — one join, no anti-join branch that
    would double-plan the pair subtree."""
    plan = plan_of(spark, "q_attribution_multitouch")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Join") == 1, tree


def test_peak_concurrency_windows_reduced_relation(spark):
    """Raw events collapse to per-boundary-ts counts before the global
    sweep window; no join anywhere."""
    plan = plan_of(spark, "q_peak_concurrency")
    assert "Join" not in plan
    assert "Window (" in plan


def test_proration_windows_share_order_partitioning(spark):
    """All three windows (weight sum, remainder rank, base sum) must
    reuse the join's l_orderkey partitioning — no extra exchanges."""
    plan = plan_of(spark, "q_proration_largest_remainder")
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 3, tree


def test_psi_binned_before_windows(spark):
    """PSI runs on the |sources| x 10 binned relation: the only agg over
    raw documents is the combinable bin count."""
    plan = plan_of(spark, "q_psi_drift")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_benford_single_combinable_agg(spark):
    """First-digit counts are one map-side-combinable agg; the spine
    join and total window run on 9 rows."""
    plan = plan_of(spark, "q_benford_audit")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 3, tree


def test_spatial_nearest_is_agg_argmin(spark):
    """Nearest site = min(struct) agg over cell-blocked candidates —
    no per-customer rank window, no cross join."""
    plan = plan_of(spark, "q_spatial_nearest")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_shortest_path_bfs_no_cross_join(spark):
    """The co-purchase graph build is the triangle co-partitioned
    self-join and BFS rounds are (node, hop) equi-joins — never a
    cartesian, and the promo seed filter is a broadcast semi-join."""
    plan = plan_of(spark, "q_shortest_path_bfs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_market_basket_no_item_cross_join(spark):
    """Pairs come from the order-key self-join (per-group fan-out ≤
    |brands|); marginals and the one-row total broadcast — the only
    nested-loop join allowed is the bounded 1-row total cross."""
    plan = plan_of(spark, "q_market_basket_lift")
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastNestedLoopJoin") <= 1, tree
    # exactly ONE sort-merge join: the pinned big×big pair enumeration
    # (merge, not shuffle_hash — SHJ's non-spillable build aborted the
    # 100× sweep); everything else broadcasts.
    assert tree.count("SortMergeJoin") == 1, tree


def test_acf_runs_on_reduced_daily_relation(spark):
    """Raw orders collapse to |days| rows in ONE combinable agg; the
    lag spine / stats / shifted-self joins all broadcast over that
    reduced relation (no sort-merge anywhere)."""
    plan = plan_of(spark, "q_acf_daily")
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_holt_winters_fold_no_window_no_join(spark):
    """The dense day spine is built in expression-land (map lookup over
    sequence()) — no join-back, no window; just the two combinable aggs
    (daily rollup, per-type fold)."""
    plan = plan_of(spark, "q_holt_winters_seasonal")
    assert "Window" not in plan
    assert "Join" not in plan


def test_bollinger_windows_reduced_daily_relation(spark):
    """Raw events collapse to the |types|x|days| daily rollup before the
    rolling frame; no joins anywhere."""
    plan = plan_of(spark, "q_bollinger_bands")
    assert "Join" not in plan
    assert plan.count("Window (") == 1  # tree node; details repeat the name


def test_running_balance_single_groupby_fold(spark):
    """The clamped fold is one per-user collect + F.aggregate: a single
    exchange (the user groupBy), no window, no join."""
    plan = plan_of(spark, "q_running_balance_floor")
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial+final agg pair


def test_ndcg_rankings_prune_before_window(spark):
    """Both rankings reduce via the two-phase per-partition heap prune
    (mapInPandas) before any window rank; the term-report joins are
    broadcast over <=|terms| rows."""
    plan = plan_of(spark, "q_ndcg_eval")
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_jaccard_neighbors_broadcasts_degrees(spark):
    """Degree lookups broadcast onto the reduced common-neighbor pair
    relation; the wedge self-join is a co-partitioned equi-join, never
    a cartesian."""
    plan = plan_of(spark, "q_jaccard_neighbors")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_ngram_novelty_no_gram_join_back(spark):
    """Per-doc totals come from size() in the scan (never a gram-grain
    join back); the only join is doc-grain per_doc<->novel."""
    plan = plan_of(spark, "q_ngram_novelty")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_curriculum_order_no_global_window(spark):
    """Global positions come from the range-partitioned two-pass scheme
    (mapInPandas + literal offset map) — NEVER a global row_number
    window (one reducer for the whole corpus) and never a join. The
    production path localCheckpoints the indexed frame (its plan
    truncates to a checkpoint scan), so the structural assertions run
    on the materialize=False variant, which keeps the full lazy plan
    visible and computes identical positions."""
    from noaa_etl_spark.io import load_table
    from noaa_etl_spark.operators.order_index import global_sort_index
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    full = global_sort_index(
        docs, [("n_chars", True), ("doc_id", True)], out_col="position",
        materialize=False,
    )
    plan = formatted_plan(full)
    assert "Window" not in plan
    assert "Join" not in plan
    assert "MapInPandas" in plan
    # and the production (checkpointed) query stays Window/Join-free too
    prod = plan_of(spark, "q_curriculum_order")
    assert "Window" not in prod
    assert "Join" not in prod


def test_user_ltv_one_fact_pass(spark):
    """Cohort assignment is a window on the user partitioning (never an
    agg + join-back re-scan); the cumulative window runs over the
    reduced cohort grid; sizes broadcast."""
    plan = plan_of(spark, "q_user_ltv")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the cohort-min window runs ONCE inside the checkpointed per-user
    # partial; the visible plan keeps only the grid-level cumulative
    # window (a second Window here = the duplicated fact pass came back)
    assert plan.count("Window (") == 1


def test_geo_cluster_bounded_adjacency_join(spark):
    """Dense-cell adjacency is a broadcast band-join over the BOUNDED
    cell universe (never a point-level join); the raw-point relation is
    touched once (the cell-count agg)."""
    plan = plan_of(spark, "q_geo_cluster")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_balanced_sample_prunes_before_window(spark):
    """Exact-k per class must route through the map-side heap prune —
    a bare per-class window (few classes = few reducers) is the
    celebrity regression."""
    plan = plan_of(spark, "q_balanced_class_sample")
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_keyword_extraction_high_cardinality_window(spark):
    """The rank window partitions by doc_id (high cardinality — fine);
    the idf join must never be a cartesian."""
    plan = plan_of(spark, "q_keyword_extraction")
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(doc_id" in plan


def test_kmv_distinct_one_fact_exchange_heap_topk(spark):
    """The fact collapses to distinct keys in one exchange; the min-k
    order statistic is TakeOrderedAndProject (per-partition heaps),
    never a global sort or window."""
    plan = plan_of(spark, "q_kmv_distinct")
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_gini_broadcasts_nation_single_rank_window(spark):
    """Orders collapse to customer grain in one combinable agg; nation
    broadcasts; exactly one rank window (per-nation, the honest
    rank-statistic cost)."""
    plan = plan_of(spark, "q_gini_concentration")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Window (") <= 1


def test_theil_sen_pairs_on_reduced_relation(spark):
    """The pairwise slope enumeration is a broadcast range join over the
    checkpointed |days| relation — never a sort-merge of raw orders."""
    plan = plan_of(spark, "q_theil_sen")
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_changepoint_prefix_window_takeordered(spark):
    """Prefix sums ride one ordered window over the reduced calendar
    relation; the argmax is TakeOrdered(1), never a full sort."""
    plan = plan_of(spark, "q_changepoint_detect")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_interval_overlap_is_banded_equi_join(spark):
    """The overlap join must stay a (user, bucket) EQUI-join — a
    nested-loop/cartesian over raw intervals is the quadratic plan the
    oracle deliberately runs and the engine must avoid."""
    plan = plan_of(spark, "q_interval_overlap_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_systematic_sample_no_window(spark):
    """Positions come from the order-index operator (checkpointed); the
    production plan must never re-introduce the global rank window."""
    plan = plan_of(spark, "q_systematic_sample")
    assert "Window" not in plan
    assert "Join" not in plan


def test_kaplan_meier_reduced_relation_fold(spark):
    """The fact collapses to user grain then the lifetime grid; the
    at-risk cumsum and survival fold run on that bounded relation —
    no sort-merge join, no per-user window over raw events."""
    plan = plan_of(spark, "q_kaplan_meier")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semantic_decontaminate_scan_local(spark):
    """The benchmark broadcasts via closure; scoring is one BLAS matmul
    per Arrow batch — ZERO exchanges (the oracle runs the cross join
    the engine must avoid)."""
    plan = plan_of(spark, "q_semantic_decontaminate")
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_blocklist_filter_scan_local(spark):
    """The blocklist rides the plan as an array literal; matching is a
    per-row HOF fold — any Exchange is a regression."""
    plan = plan_of(spark, "q_blocklist_filter")
    assert "Exchange" not in plan


def test_weighted_median_reduces_to_value_grid(spark):
    """Rows collapse to the (flag, cents) value grid BEFORE the rank
    windows — no join anywhere, and the windows sort distinct prices,
    not raw rows (HashAggregate feeds the Window)."""
    plan = plan_of(spark, "q_weighted_median")
    assert "Join" not in plan
    assert plan.index("HashAggregate") < plan.index("Window")


def test_cms_join_estimate_grids_from_one_scan(spark):
    """Both sides' grids come from one checkpointed scan (half is a
    grid group key); the inner product joins KB-sized grids — never a
    sort-merge of anything fact-sized."""
    plan = plan_of(spark, "q_cms_join_estimate")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_degree_distribution_combinable_aggs(spark):
    """Edge build is the bounded within-order self-join; degrees and the
    histogram are combinable aggs; the ccdf windows the |degrees|
    relation — no cartesian anywhere."""
    plan = plan_of(spark, "q_degree_distribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_activity_bitmask_single_user_agg(spark):
    """The mask is ONE map-side-combinable bit_or agg on user_id (8-byte
    state per group); the day base broadcasts — no window, no second
    fact pass."""
    plan = plan_of(spark, "q_activity_bitmask")
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final bit_or
    assert "SortMergeJoin" not in plan


def test_sliding_distinct_banded_equi_join(spark):
    """Exact sliding distinct = last-occurrence identity + the 1h band
    join — one lead window, one EQUI-join on (bucket), one count agg;
    a nested-loop over raw timestamps is the oracle-only plan."""
    plan = plan_of(spark, "q_sliding_distinct")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") >= 1  # the per-user lead


def test_bootstrap_ci_one_pass_combinable(spark):
    """B=32 replicate expansion must stay BEFORE a map-side combinable
    agg (shuffle carries 32 partial rows per partition, never 32x the
    data) — no join, no window, no second fact scan."""
    plan = plan_of(spark, "q_bootstrap_ci")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2


def test_negative_sampling_shard_blocked(spark):
    """The negative self-join must stay a shard EQUI-join (never a
    cross join over the corpus); the rank window partitions by the
    high-cardinality anchor."""
    plan = plan_of(spark, "q_negative_sampling")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ohlc_single_combinable_agg(spark):
    """OHLC = one map-side-combinable agg (min_by/max_by on the
    composite time key) — never a rank window over the raw stream."""
    plan = plan_of(spark, "q_ohlc_candles")
    assert "Window (" not in plan.split("\n\n")[0]
    assert "Join" not in plan
    # struct min_by/max_by keys force SORT-based aggregation; the
    # partial (map-side) agg below the exchange is what matters
    tree = plan.split("\n\n")[0]
    assert tree.count("SortAggregate") + tree.count("HashAggregate") >= 2


def test_rfm_windows_on_reduced_relation(spark):
    """Orders collapse to customer grain BEFORE the three ntile windows
    (HashAggregate feeds the first Window); no join anywhere."""
    plan = plan_of(spark, "q_rfm_segmentation")
    assert "Join" not in plan
    assert plan.index("HashAggregate") < plan.index("Window")


def test_readability_zero_exchange_scan_local(spark):
    """Readability is pure per-row string arithmetic: no exchange, no
    window, no UDF in the plan."""
    plan = plan_of(spark, "q_readability")
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_temperature_mix_broadcasts_rates_no_window(spark):
    """The per-source rate table broadcasts back onto the doc scan; the
    doc-grain side never hits a window or a sort."""
    plan = plan_of(spark, "q_temperature_mix")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_broadcasts_terms_single_docgrain_shuffle(spark):
    """DSIR: the (doc,bucket) count agg is the only doc-grain shuffle;
    the 64-row term table broadcasts; no window anywhere."""
    plan = plan_of(spark, "q_dsir_select")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_rolling_median_window_on_daily_rollup(spark):
    """The trailing-median window runs on the |types|x|days| reduced
    relation: exactly one window, partitioned by type, after one
    combinable daily agg."""
    plan = plan_of(spark, "q_rolling_median")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window (") == 1
    assert "HashAggregate" in plan


def test_skew_join_salted_shuffle_hash_no_broadcast_of_build(spark):
    """The salted join is pinned shuffle-hash (big x big by design);
    the salt must not trick the planner into a cartesian or a sort-merge."""
    plan = plan_of(spark, "q_skew_join_salted")
    assert "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_image_resize_scan_local(spark):
    """Decode+resize is one scan-local Arrow pass: no exchange at all
    (the graded output is already doc-grain)."""
    plan = plan_of(spark, "q_image_resize")
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_mapinarrow_hist_single_merge_exchange(spark):
    """Per-batch Arrow partials then ONE merge shuffle: the user-code
    map-side combine must keep the plan at a single exchange."""
    plan = plan_of(spark, "q_mapinarrow_hist")
    tree = plan.split("\n\n")[0]
    assert "MapInArrow" in plan
    assert tree.count("Exchange") == 1


def test_covariance_single_agg_no_pair_explode_of_data(spark):
    """All 45 moments ride ONE combinable agg over the scan: a single
    exchange (the groupBy(label) shuffle), with the 36-pair explode on
    the aggregate — a Generate above the HashAggregate, never between
    the scan and the agg (a per-pair exploded data relation would
    shuffle 36x the rows)."""
    plan = plan_of(spark, "q_covariance_matrix")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert "Generate" in plan
    # the explode must consume the aggregate, not feed it: in the
    # formatted tree the Generate node appears ABOVE (before) every
    # HashAggregate node.
    gen = tree.index("Generate")
    assert all(gen < i for i in _all_indexes(tree, "HashAggregate"))


def _all_indexes(s: str, needle: str):
    out, i = [], s.find(needle)
    while i != -1:
        out.append(i)
        i = s.find(needle, i + 1)
    return out


def test_mannwhitney_windows_partitioned_by_source(spark):
    """The rank-statistic window mirrors the KS shape: partitioned by
    source over the reduced (source, value) count relation — never a
    global single-partition window."""
    plan = plan_of(spark, "q_mannwhitney_u")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window (") == 1
    # no exchange in the whole plan is a SinglePartition repartition:
    # the rank window hashes on source.
    assert "SinglePartition" not in plan


def test_chi_square_windows_on_bounded_grid(spark):
    """Every window after the grid collapse runs on the checkpointed
    |types|x|bands| relation: the events scan feeds exactly one
    HashAggregate subtree (localCheckpoint breaks the three readers'
    re-plans), and the single-partition marginal window is on the
    bounded grid, not the fact."""
    plan = plan_of(spark, "q_chi_square_independence")
    tree = plan.split("\n\n")[0]
    # the fact scan is behind the checkpoint: no parquet scan of events
    # appears in the final plan at all.
    assert "Scan parquet" not in tree or "events" not in tree
    # positive properties (not just the truncation artifact): the
    # marginal windows DO appear, running above the checkpointed grid
    # scan, and the plan's source is the checkpoint (ExistingRDD).
    assert tree.count("Window") >= 1
    assert "Scan ExistingRDD" in tree
    # the SinglePartition exchanges are exactly the grid-grain total-N
    # marginal (input carries band) and the one-row finalize (agg
    # buffers) — never a fact-grain repartition.
    import re as _re
    singles = [m.start() for m in _re.finditer(r"Arguments: SinglePartition", plan)]
    assert 1 <= len(singles) <= 2, plan
    grid_marginal = [
        i for i in singles if "band" in plan[plan.rfind("Input", 0, i):i]
    ]
    assert grid_marginal, "expected the grid-marginal single-partition window"


def test_geohash_scan_local_zero_exchange(spark):
    """Morton interleave + base32 are pure projection arithmetic: no
    exchange, no UDF, no window — a free column on any pass."""
    plan = plan_of(spark, "q_geohash_encode")
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_srm_single_distinct_agg_no_window(spark):
    """SRM is a count over distinct users: combinable partial-distinct
    aggregates, no window, no join."""
    plan = plan_of(spark, "q_ab_srm_check")
    assert "Window" not in plan
    assert "Join" not in plan


def test_ratio_delta_two_stacked_aggs(spark):
    """Delta method: events collapse to user grain, user grain to arm
    moments — two combinable aggs, no window, no join, and the events
    scan reads only the three needed columns."""
    plan = plan_of(spark, "q_ratio_metric_delta")
    assert "Window" not in plan
    assert "Join" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 3


def test_temporal_split_broadcast_bounds_no_window(spark):
    """The global bounds are a one-row broadcast back onto the scan —
    never a window (a global min/max window would single-partition the
    fact); labeling is a scan-local CASE."""
    plan = plan_of(spark, "q_temporal_split")
    assert "Window" not in plan
    assert "Broadcast" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_record_linkage_blocked_join_no_udf(spark):
    """FS linkage is ONE blocked equi-join of two scan-local
    projections: levenshtein and the md5 corruptions are JVM
    expressions (no Python). The only windows are the two FS_BLOCK_CAP
    occupancy counts, each riding the (nation, suffix) partitioning the
    join shuffles on anyway."""
    plan = plan_of(spark, "q_record_linkage_fs")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert tree.count("Join") == 1


def test_calibration_and_dp_single_agg_shapes(spark):
    """Calibration bins and the DP release are each pure combinable
    aggregates: no joins, no windows, scan-local scoring."""
    for name in ("q_calibration_bins", "q_dp_noise_agg"):
        plan = plan_of(spark, name)
        assert "Window" not in plan, name
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_auc_window_on_bounded_grid(spark):
    """AUC's cumulative rank window runs on the quantized ≤2^20-row
    score grid — exactly one Window, fed by the grid HashAggregate, no
    joins."""
    plan = plan_of(spark, "q_auc_eval")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 1
    assert "Join" not in plan
    # the window's input is the aggregated grid: a HashAggregate sits
    # BELOW the Window in the printed tree (appears after it), and the
    # finalize agg sits above (appears before).
    assert tree.index("HashAggregate") < tree.index("Window")
    assert tree.rindex("HashAggregate") > tree.index("Window")


def test_oov_vocab_broadcast_and_checkpointed_counts(spark):
    """The (source, token) count relation is checkpointed (one
    computation feeding both the vocab reduction and the scoring join),
    the vocab is a TakeOrdered + broadcast, and no window appears."""
    plan = plan_of(spark, "q_oov_rate")
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_mutual_information_windows_on_bounded_grid(spark):
    """MI shares the chi-square posture: the fact scan is behind the
    grid checkpoint, marginal windows run on the bounded relation."""
    plan = plan_of(spark, "q_mutual_information")
    tree = plan.split("\n\n")[0]
    assert "Scan parquet" not in tree or "events" not in tree
    assert "Scan ExistingRDD" in tree
    assert tree.count("Window") >= 1


def test_gains_table_windows_on_ten_row_aggregate(spark):
    """The cumulative/total windows run on the 10-bin aggregate — the
    HashAggregate pair sits BELOW every Window in the tree (fact rows
    never enter a window)."""
    plan = plan_of(spark, "q_gains_table")
    tree = plan.split("\n\n")[0]
    assert "Window" in tree
    import re as _re
    aggs = [m.start() for m in _re.finditer("HashAggregate", tree)]
    wins = [m.start() for m in _re.finditer("Window", tree)]
    assert max(aggs) > max(wins), "a window runs below the bin aggregate"


def test_sorted_neighborhood_banded_join_shape(spark):
    """SNM's w-neighborhood is a BANDED equi-join over order_index
    positions — never a global rank window in the production path, and
    never a cross/theta join: the physical join must be a hash or merge
    join keyed on the block id. (COSTS shows 0 executed exchanges for
    this query because order_index's localCheckpoint truncates the
    audited plan — this structural test is the compensating gate, the
    curriculum_order precedent.)"""
    prod = plan_of(spark, "q_sorted_neighborhood_dedup")
    assert "Window" not in prod
    assert "CartesianProduct" not in prod and "NestedLoop" not in prod
    assert ("SortMergeJoin" in prod) or ("ShuffledHashJoin" in prod) or (
        "BroadcastHashJoin" in prod
    )


def test_line_dedup_no_window_no_join(spark):
    """Global first-occurrence-wins needs NO window and NO join-back:
    the winner of each line group IS the kept instance. Two hash
    aggregations (line grain, doc grain) are the whole plan."""
    prod = plan_of(spark, "q_line_dedup_global")
    assert "Window" not in prod
    assert "Join" not in prod


def test_classification_report_grid_broadcast_no_window(spark):
    """Thresholds broadcast onto the bounded s20 grid — one fact
    collapse, no window, no Python."""
    plan = plan_of(spark, "q_classification_report")
    assert "Window" not in plan
    assert "Broadcast" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cohens_kappa_and_mcnemar_agg_only(spark):
    """Kappa rides the grid; McNemar is ONE scan-local combinable agg —
    no window, no join in either."""
    for name in ("q_cohens_kappa", "q_mcnemar_test"):
        plan = plan_of(spark, name)
        assert "Window" not in plan, name
        assert "Join" not in plan.split("\n\n")[0], name


def test_target_encode_broadcast_back_never_window(spark):
    """LOO encoding enriches via BROADCAST of the 5-row category stats
    and the 1-row global mean — never a window over the 5-value
    category key (celebrity skew by construction)."""
    plan = plan_of(spark, "q_target_encode_loo")
    tree = plan.split("\n\n")[0]
    assert "Window" not in plan
    assert tree.count("BroadcastExchange") >= 2


def test_correlation_battery_bounded_relation(spark):
    """Spearman's rank windows and Kendall's pair join run on the
    reduced day-grain relation, never the fact: exactly one data-sized
    exchange (the day agg) feeds each."""
    plan_s = plan_of(spark, "q_spearman_corr")
    # two rank windows + two tie-count windows on the bounded relation
    assert "Window" in plan_s
    tree_k = plan_of(spark, "q_kendall_tau").split("\n\n")[0]
    assert "Window" not in tree_k


def test_rouge_topk_prune_no_corpus_window(spark):
    """Pair selection is the two-phase grouped top-k: a map-side
    ArrowEval prune precedes the only window, which therefore ranks
    the pruned survivors, not the corpus."""
    plan = plan_of(spark, "q_rouge_eval")
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" in tree
    # WindowGroupLimit nodes contain the substring "Window" — count
    # actual Window operators only.
    assert tree.count("Window (") == 1


def test_jsd_windows_on_bounded_grid(spark):
    """JSD's two total windows ride the ≤10-row band grid (the
    mutual_information posture): the only data-sized exchange is the
    grid agg."""
    plan = plan_of(spark, "q_jsd_drift")
    tree = plan.split("\n\n")[0]
    assert "Window" in plan
    assert tree.count("Exchange") <= 4


def test_log_odds_checkpointed_counts_broadcast_universe(spark):
    """Scoring joins the checkpointed (source, term) counts against the
    broadcast 10-term universe — token text never re-exchanges (the
    checkpoint truncates the explode subtree out of the plan)."""
    plan = plan_of(spark, "q_log_odds_terms")
    assert "Broadcast" in plan
    assert "Generate" not in plan.split("\n\n")[0]  # explode behind the checkpoint


def test_brier_single_agg_no_exchange_fanout(spark):
    """Brier is one scan-local combinable agg — no window, no join."""
    plan = plan_of(spark, "q_brier_score")
    tree = plan.split("\n\n")[0]
    assert "Window" not in plan and "Join" not in tree
    assert tree.count("Exchange") <= 1


def test_mrr_topk_prune_before_window(spark):
    """MRR's only window ranks the map-side-pruned survivors (the
    ndcg/rouge two-phase contract)."""
    plan = plan_of(spark, "q_mrr_eval")
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" in tree
    assert tree.count("Window (") <= 1
