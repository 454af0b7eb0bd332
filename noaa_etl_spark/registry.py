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
#   surface). Remaining slots: one green rep per family + the 6
#   headline bench queries.
GRADED_WINDOW: list[str] = [
    # round-4 late additions, never driver-graded (oracle-paired)
    "q_chunk_dedup", "q_incremental_dedup", "q_referential_audit",
    "q_fingerprint_md5", "q_stream_pii_scrub", "q_stream_chunk_documents",
    "q_gap_fill", "q_tpch_q3_shipping", "q_tpch_q6_forecast",
    "q_tpch_q18_large_volume",
    # round-5 TPC-H completions (suite now spans all 22 shapes)
    "q_tpch_q2_min_cost", "q_tpch_q9_profit", "q_tpch_q12_late_priority",
    "q_tpch_q16_supplier_cnt", "q_tpch_q21_waiting",
    # plans changed this round (terminal sorts dropped / oracle upgrade)
    "q_window_rolling_1h", "q_tfidf", "q_asof_join", "q_sample",
    # rows-only queries getting their FIRST driver signal (err=null is
    # the check: vanilla-driver crashes — pickling, configs — only
    # surface here)
    "q_dedup_minhash_lsh", "q_dedup_simhash", "q_knn_lsh", "q_knn_ivf",
    "q_doc_similarity", "q_semantic_dedup_lsh", "q_fingerprint",
    "q_hll_sketch_union", "q_approx_aggs", "q_stream_stateful",
    "q_stream_heavy_hitters", "q_custom_datasource", "q_embed_docs",
    "q_multimodal_features", "q_lang_id", "q_quality_score",
    # family re-confirmation reps (A sources is carried by
    # q_schema_evolution below)
    "q_dedup_survivor_policy",  # I dedup: new quality-aware survivor
    "q_filter_predicates",    # B filters
    "q_pricing_summary",      # D aggs (headline)
    "q_sort_offset",          # F sort/limit
    "q_dedup_keyed",          # G set ops
    "q_json_extract",         # H scalars (events.ts)
    "q_stream_sessionize",    # J streaming (events.ts NTZ re-confirm)
    "q_udtf_dynamic_schema",  # K UDFs (new this round: analyze-hook UDTF)
    "q_ghcn_daily_wide",      # NOAA
    "q_merge_upsert",         # ETL
    # TPC-H threshold rewrites (plans changed this round → fresh signal;
    # the headline bench queries sit out — they're r2-r4 green and
    # benched every round, and their families stay covered via
    # tfidf/rolling_1h/asof_join)
    "q_tpch_q11_value", "q_tpch_q15_top_supplier", "q_tpch_q17_small_qty",
    # round-5 additions (every new query enters the window the round it
    # lands — the r4 late-addition gap does not repeat)
    "q_train_val_split", "q_schema_evolution",
]

# The deliberate rows-only subset of the window (no oracle by design:
# engine-specific hashes/sketches/ANN, streaming state, custom source).
# test_graded_window_spans_every_family pins window∩rows-only == this.
ROWS_ONLY_WINDOW: set[str] = {
    "q_dedup_minhash_lsh", "q_dedup_simhash", "q_knn_lsh", "q_knn_ivf",
    "q_doc_similarity", "q_semantic_dedup_lsh", "q_fingerprint",
    "q_hll_sketch_union", "q_approx_aggs", "q_stream_stateful",
    "q_stream_heavy_hitters", "q_custom_datasource", "q_embed_docs",
    "q_multimodal_features", "q_lang_id", "q_quality_score",
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
    )

    missing = [n for n in GRADED_WINDOW if n not in QUERIES]
    if missing:  # not assert: -O would compile it out and silently
        # shrink/reorder the driver's graded first-50 at runtime
        raise RuntimeError(f"GRADED_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in GRADED_WINDOW}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
