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
#   io.normalize_events_ts; those three stay in the window for driver
#   confirmation. The remaining 31 never-driver-graded oracle-paired
#   entries all enter (after r4 every oracle-paired query has driver
#   signal at least once); the other 16 slots re-confirm family reps,
#   preferring events.ts-touching queries to validate the NTZ fix
#   (q_sessionize, q_window_rolling_1h, q_tumbling_window,
#   q_stream_tumbling, q_json_extract, q_asof_join).
GRADED_WINDOW: list[str] = [
    # I LLM-data-pipeline (text / multimodal)
    "q_stopword_filter", "q_ngrams", "q_repetition_quality",
    "q_text_norm", "q_multimodal_meta", "q_frame_sample",
    "q_dedup_exact", "q_chunk_documents", "q_decontaminate",
    "q_pii_scrub", "q_quantize_int8",
    # sampling / mixing layer
    "q_stratified_sample", "q_source_mix", "q_group_sample",
    "q_sequence_pack", "q_quality_bins",
    # D aggregations (heavy hitters never graded)
    "q_heavy_hitters", "q_heavy_hitters_mg", "q_pricing_summary",
    # H scalars / arrays / SQL surface
    "q_centroid_by_label", "q_sql_surface", "q_json_extract",
    # K UDF surface
    "q_mapinpandas_vowels", "q_udaf_trimmed_mean",
    # J streaming / temporal (incl. the three r3 fixes)
    "q_stream_sliding", "q_stream_interval_join", "q_stream_sessionize",
    "q_stream_tumbling",
    # E windows / sessionize (events.ts re-confirmation)
    "q_sessionize_bucketed", "q_window_rolling_1h",
    # NOAA
    "q_ghcn_daily_wide",
    # subqueries (never graded)
    "q_scalar_subquery", "q_in_subquery_agg", "q_double_exists",
    "q_lateral_join",
    # TPC-H (never graded)
    "q_tpch_q11_value", "q_tpch_q14_promo", "q_tpch_q17_small_qty",
    "q_tpch_q4_priority", "q_tpch_q13_custdist", "q_tpch_q15_top_supplier",
    "q_tpch_q19_disjunctive", "q_tpch_q20_nested_in",
    "q_tpch_q22_idle_balance",
    # family re-confirmation reps
    "q_csv_roundtrip",        # A sources
    "q_filter_predicates",    # B filters
    "q_asof_join",            # C joins (events.ts)
    "q_sort_offset",          # F sort/limit
    "q_dedup_keyed",          # G set ops
    "q_merge_upsert",         # ETL
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
