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
    # Round 8: CORRECTNESS_r07 went 50/50 (third consecutive all-green
    # window). Per VERDICT r7 items 1-2: FRONT-load the only 7 queries
    # that have NEVER had driver signal (built late in round 7 after the
    # r7 window was spent on VERDICT-priority re-confirms — four
    # oracle-paired + plan-gated, three rows-only by design: pagerank
    # has no DuckDB recursive-USING-KEY oracle, tokenizer fertility uses
    # the engine-trained merge table, cross-corpus LSH capture is
    # probabilistic), then ALL 38 queries whose last driver grade is
    # round 3 — three fixture regenerations ago, the one failure source
    # local sweeps can't simulate. The 5 remaining slots: family fills
    # (B: q_filter_predicates, F: q_sort_offset, NOAA: q_ghcn_pipeline —
    # the r3 cohort covers every other family) + the 2 highest-value
    # r4-stale entries (q_dedup_exact is headline-benched;
    # q_sessionize_bucketed is the events-encoding-sensitive twin).
    # The r4 cohort (35 remaining) rotates in round 9.
    # --- never driver-graded (7; built round 7) ---
    "q_seasonal_decompose", "q_decayed_sum", "q_skew_diagnose",
    "q_distinct_rollup_exact", "q_pagerank", "q_tokenizer_fertility",
    "q_cross_corpus_dedup",
    # --- last graded ROUND 3 (38) ---
    "q_count_distinct", "q_cube", "q_join_semi", "q_join_anti",
    "q_set_ops", "q_null_safe_join",
    "q_window_lag_lead", "q_pivot_events", "q_dedup_hash", "q_wordcount",
    "q_dedup_ngram_jaccard", "q_knn_cosine",
    "q_semantic_dedup", "q_fixed_width_scan",
    "q_orc_roundtrip", "q_parquet_sink_partitioned",
    "q_manifest_sink_roundtrip", "q_math_haversine",
    "q_date_arithmetic",
    "q_grouping_sets", "q_interval_join",
    "q_scalar_udf_lastresort", "q_pandas_udf_scalar", "q_grouped_zscore",
    "q_stream_dedup", "q_scd2_intervals",
    "q_tpch_q8_share", "q_tpch_q10_returns",
    # --- new round-8 queries (every new query enters the window the
    # round it lands): RRF hybrid retrieval, containment dedup, CUSUM
    # changepoint, KS drift, winsorize, and the decayed-sum streaming
    # twin (shares the batch oracle — fold == recompute exactly).
    # They displaced the two r4-stale fills (q_dedup_exact /
    # q_sessionize_bucketed — headline-benched / equivalence-tested)
    # and four family-redundant r3 entries (q_map_functions,
    # q_hash_functions — H still carried by three entries;
    # q_union_distinct — G carried by q_set_ops; q_correlated_min),
    # all of which rotate with the r4 cohort in round 9. ---
    "q_rrf_fusion", "q_containment_dedup", "q_changepoint_cusum",
    "q_ks_drift", "q_winsorize", "q_stream_decayed_sum",
    # --- second round-8 batch: CDC changelog apply + its streaming
    # twin (shared oracle — unique-seq argmax folds batching-
    # independently), zero-shuffle char-entropy filter, seeded Laplace
    # release mechanism, survivorship golden-record merge. These
    # displaced five more family-redundant r3 entries
    # (q_agg_first_last, q_string_functions, q_token_stats,
    # q_salted_agg, q_time_rollup — D/H/I families still carried),
    # which join the r9 rotation with the r4 cohort. ---
    "q_cdc_apply", "q_stream_cdc_apply", "q_entropy_filter",
    "q_dp_noisy_counts", "q_golden_record",
    # q_event_sequence (MATCH_RECOGNIZE-lite substring pattern mining)
    # displaced q_vector_stats (no family rep lost).
    "q_event_sequence",
    # --- family fills (3) ---
    "q_filter_predicates", "q_sort_offset", "q_ghcn_pipeline",
]

# The deliberate rows-only subset of the window (no oracle by design:
# engine-specific hashes/sketches/ANN, streaming state, custom source).
# test_graded_window_spans_every_family pins window∩rows-only == this.
ROWS_ONLY_WINDOW: set[str] = {
    # Round 8: the three never-graded rows-only round-7 additions
    # (reasons in the window comment above).
    "q_pagerank", "q_tokenizer_fertility", "q_cross_corpus_dedup",
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
