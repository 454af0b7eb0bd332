"""Central registry wiring operators to the driver's graded contract.

Every graded operator lands as a triple (SURVEY.md §3.1):

    @graded("q_name", oracle="SELECT ... AS same_alias ...")
    def q_name(spark, sf_dir) -> DataFrame: ...

- The callable goes into ``queries()`` in ``__spark_entry__.py``.
- The oracle SQL (DuckDB dialect, run over the same parquet views) goes
  into ``oracle_sql()``. ``oracle=None`` ⇒ rows-only check (for ops that
  are genuinely not SQL-expressible: LSH, iterative algorithms).

Column names are part of the graded contract: the driver sorts columns by
name before value-hashing, so every computed column is aliased identically
in both the Spark code and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def graded(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# The driver grades the FIRST 50 registered queries (registration order
# caps at 50). This curated window spans every SURVEY.md §2 family
# (A sources, B filters, C joins, D aggs, E windows, F sort/limit,
# G set ops, H scalars, I LLM-pipeline, J streaming/temporal, K UDFs)
# plus TPC-H / ETL / NOAA representatives — all oracle-paired.
# Rotation history (entries leave the window but stay registered,
# oracle-paired, and covered by tests/test_oracle_parity.py):
# - Round 3 (first pass): 14 r1-r2-green family-redundant entries
#   swapped for never-driver-graded ones: q_agg_stats, q_bool_aggs,
#   q_rollup, q_minmax_by, q_join_left, q_window_first_last,
#   q_stream_tumbling, q_date_functions, q_regexp_extract,
#   q_variant_json, q_jsonl_roundtrip, q_quality_filter,
#   q_udaf_trimmed_mean, q_tpch_q7_volume.
# - Round 3 (second pass): 14 more entries green in BOTH r1 and r2
#   rotated out (q_pricing_summary, q_percentiles, q_filter_predicates,
#   q_join3_topk, q_join5_region, q_asof_join, q_union_all_yearly,
#   q_dedup_keyed, q_window_rank, q_window_rolling_1h, q_sessionize,
#   q_tumbling_window, q_json_extract, q_dedup_exact) for 14
#   never-driver-graded entries (all exact in today's vanilla-session
#   sweep at sf0.01), including the two new round-3 surfaces
#   q_sessionize_bucketed and q_manifest_sink_roundtrip.
# - Round 4: the fixture generator switched events.ts from
#   TIMESTAMP(NANOS) to TIMESTAMP(MICROS, ntz) between rounds, breaking
#   q_sessionize_bucketed / q_stream_interval_join / q_stream_sessionize
#   (unix_micros + watermarks reject TIMESTAMP_NTZ) — fixed in
#   io.normalize_events_ts; those three stayed in the window for driver
#   confirmation (r4: 50/50 green). NOTE: 10 oracle-paired queries
#   added late in round 4 (chunk_dedup, gap_fill, incremental_dedup,
#   referential_audit, fingerprint_md5, the two stream twins, TPC-H
#   Q3/Q6/Q18) landed AFTER that window froze and had never been
#   driver-graded until round 5.
# - Round 5: those 10 enter, plus the 5 new TPC-H completions
#   (Q2/Q9/Q12/Q16/Q21 — the suite now covers all 22 shapes), the 4
#   queries whose plans changed this round (rolling_1h / tfidf /
#   asof_join lost their terminal sorts; q_sample became an
#   oracle-paired hash-gate), and — a first — the 16 rows-only
#   queries that had NEVER had driver signal (the driver records a
#   weaker rows-only check for them; the point is confirming they run
#   clean under the vanilla driver, where worker-side pickling bugs
#   surface). Remaining slots went to one green rep per family plus
#   q_pricing_summary; the other headline bench queries sat out (green
#   r2-r4 and benched every round).
# - Round 6: after r5 every registered query has had driver signal at
#   least once, so the window shifts to RE-confirmation ordered by
#   staleness: the 16 new round-6 queries (zstd roundtrip, mixture
#   epochs, corpus clustering, quality gate + its streaming twin,
#   gopher per-source report, repetition filter, corpus shuffle-shard,
#   column profile, constraint suite, ANN index drift report, fuzzy
#   name match + its q=3 composite-key twin, multiset set-ops,
#   null-ordering top-k, table diff),
#   the 5 queries whose plans/semantics changed this round
#   (shared-signature LSH self-join, IVF cogroup scoring, widened
#   survivor key, Q11 integer-cents threshold), then 13 of the 15
#   queries last graded in r1 (q_date_spine and q_unpivot yielded
#   their slots; H/temporal and reshape stay covered by
#   q_date_functions and the r5-graded pivot queries) and 8 of the 19
#   last graded in r2 (both pre-date two fixture regenerations; the
#   13 r1/r2 entries that yielded slots to new queries rotate back in
#   r7), and 8 r3-graded family/high-value reps so every family
#   carries post-r5-fixture signal.
GRADED_WINDOW: list[str] = [
    # new this round (every new query enters the window the round it
    # lands; the third round-6 session added 15 more — stats skipping,
    # CMS + histogram sketches + the streaming CMS twin, k-anonymity,
    # streaming drift monitor, MAD outliers, weighted sampling,
    # interval merge, funnel, cohort retention, Jaro-Winkler rank,
    # recursive hierarchy, array HOFs, dynamic partition overwrite —
    # displacing stale re-confirmation entries whose families stay
    # covered; displaced list in the r7 notes)
    "q_zstd_roundtrip", "q_mixture_epochs",
    "q_cluster_corpus",  # rows-only: k-means cells
    "q_quality_gate", "q_gopher_quality", "q_repetition_filter",
    "q_corpus_shuffle_shard", "q_stream_quality_gate",
    "q_profile_columns", "q_dq_checks",
    "q_ann_index_update",  # rows-only: engine-trained centroids
    "q_fuzzy_name_match", "q_set_ops_all", "q_sort_null_ordering",
    "q_table_diff", "q_fuzzy_match_q3",
    "q_stats_skipping", "q_cms_frequencies", "q_k_anonymity",
    "q_stream_drift_monitor",  # rows-only: engine-trained centroids
    "q_anomaly_mad", "q_hist_quantiles", "q_weighted_sample",
    "q_interval_merge", "q_funnel", "q_cohort_retention", "q_fuzzy_rank",
    "q_recursive_hierarchy", "q_array_functions", "q_partition_overwrite",
    "q_stream_cms_frequencies",
    # plans/semantics changed this round → fresh signal
    "q_semantic_dedup_lsh",     # rows-only: shared-signature self-join
    "q_doc_similarity",         # rows-only: IVF cogroup-by-cell scoring
    "q_knn_ivf",                # rows-only: numpy-trained centroids
    "q_dedup_survivor_policy",  # widened (quality, -id) key encoding
    "q_tpch_q11_value",         # integer-cents threshold form
    # last graded in ROUND 1 (stalest signal; 9 of 15 — q_date_spine,
    # q_unpivot, q_conditional_case, q_null_handling, q_distinct_rows
    # and q_window_moving_avg yielded to new round-6 queries, back in
    # r7; B stays covered by q_try_cast_qc/q_agg_filtered, E by the
    # running-total/rank/rolling entries)
    # new in the fourth round-6 session (every new query enters the
    # window the round it lands): feature-store PIT join, linear
    # interpolation resample, bigram-LM perplexity filter, BPE merge
    # training (rows-only: iterative argmax loop), mergeable variance
    # state. Displaced: q_join3_topk / q_join5_region (C carried by
    # q_feature_store_pit; both benched every round), q_sessionize
    # (E carried by q_window_rank + q_resample_interpolate),
    # q_incremental_agg (D/etl carried by q_incremental_stats_merge +
    # q_table_diff), q_tpch_q7_volume (tpch carried by q_tpch_q11_value).
    "q_feature_store_pit", "q_resample_interpolate",
    "q_perplexity_filter", "q_bpe_train", "q_incremental_stats_merge",
    "q_stream_stats_merge",  # shares the batch oracle verbatim
    "q_bpe_tokenize",  # rows-only: tokens depend on the trained merges
    "q_linear_trend", "q_stream_feature_pit", "q_mode_by_group",
    # last graded in ROUND 2 (6 of 19 — q_percentiles, q_rollup,
    # q_jsonl_roundtrip (A covered by q_zstd_roundtrip +
    # q_stats_skipping), q_regexp_extract (H covered by
    # q_date_functions),
    # q_join_left, q_window_first_last, q_variant_json, q_bool_aggs,
    # q_tumbling_window, q_quality_filter, q_agg_stats, q_minmax_by,
    # q_union_all_yearly yielded their slots to the 15 new round-6
    # queries; their families stay covered by other window entries and
    # they rotate back in r7)
    "q_date_functions",
    # round-3-graded family/high-value reps (fill to 50; keep every
    # family's rep post-r5-fixture)
    "q_try_cast_qc",      # B filters
    "q_udtf_tokens",      # K UDFs (worker-side pickling coverage)
    "q_ghcn_pipeline",    # NOAA
]

# The deliberate rows-only subset of the window (no oracle by design:
# engine-specific hashes/sketches/ANN, streaming state, custom source).
# test_graded_window_spans_every_family pins window∩rows-only == this.
ROWS_ONLY_WINDOW: set[str] = {
    # round 6: the three rows-only queries whose plans changed this
    # round plus the new clustering report (all 16 pre-existing
    # rows-only queries got their first clean driver signal in r5)
    "q_semantic_dedup_lsh", "q_doc_similarity", "q_knn_ivf",
    "q_cluster_corpus", "q_ann_index_update", "q_stream_drift_monitor",
    # fourth round-6 session: BPE training is a driver-coordinated
    # iterative argmax loop — not SQL-expressible; golden-tested in
    # tests/test_algorithms.py; the encode twin's token sequences
    # depend on that trained table, so it is rows-only for the same
    # reason (golden-tested end-to-end)
    "q_bpe_train",
    "q_bpe_tokenize",
}


def load_all_queries() -> None:
    """Import every query module so registration side effects run, then
    reorder the registry so the driver's graded window (first 50) spans
    every §2 family."""
    # Imports are deferred so `import noaa_etl_spark` stays cheap.
    from noaa_etl_spark.queries import (  # noqa: F401
        relational,
        windows,
        temporal,
        text,
        similarity,
        sources,
        scalars,
        udfs,
        streaming,
        multimodal,
        noaa,
        scale,
        etl,
        subqueries,
        tpch,
        sampling,
        profiling,
    )

    missing = [n for n in GRADED_WINDOW if n not in QUERIES]
    if missing:  # not assert: -O would compile it out and silently
        # shrink/reorder the driver's graded first-50 at runtime
        raise RuntimeError(f"GRADED_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in GRADED_WINDOW}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
