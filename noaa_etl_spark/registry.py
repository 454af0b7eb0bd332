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
GRADED_WINDOW: list[str] = [
    # D aggregations
    "q_count_distinct", "q_pivot_events", "q_cube", "q_incremental_agg",
    "q_agg_first_last", "q_grouping_sets", "q_salted_agg",
    # B filters / casts
    "q_try_cast_qc",
    # C joins
    "q_join_semi", "q_join_anti", "q_null_safe_join", "q_interval_join",
    # G set ops / dedup-keyed
    "q_set_ops", "q_union_distinct",
    # F sort / limit
    "q_topk_global",
    # E windows / sessionize
    "q_window_lag_lead", "q_sessionize_bucketed",
    # J temporal / streaming
    "q_time_rollup", "q_stream_interval_join", "q_stream_dedup",
    "q_stream_sessionize",
    # H scalar functions
    "q_string_functions", "q_math_haversine", "q_date_arithmetic",
    "q_map_functions", "q_vector_stats", "q_hash_functions",
    # A sources / sinks
    "q_csv_roundtrip", "q_orc_roundtrip", "q_fixed_width_scan",
    "q_parquet_sink_partitioned", "q_manifest_sink_roundtrip",
    # I LLM-data-pipeline
    "q_dedup_hash", "q_wordcount", "q_token_stats",
    "q_tfidf", "q_dedup_ngram_jaccard", "q_knn_cosine", "q_semantic_dedup",
    # K UDF surface
    "q_grouped_zscore", "q_cogroup_merge", "q_udtf_tokens",
    "q_pandas_udf_scalar", "q_scalar_udf_lastresort",
    # subqueries
    "q_correlated_min",
    # ETL / NOAA / TPC-H
    "q_merge_upsert", "q_scd2_intervals", "q_ghcn_pipeline",
    "q_tpch_q8_share", "q_tpch_q10_returns",
]


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
