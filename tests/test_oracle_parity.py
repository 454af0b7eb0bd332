"""The engine's own t2 gate: every oracle-paired graded query must match
DuckDB at the graded scale factor (sf0.01 by default — the same sf the
driver uses). Rows-only queries get a non-empty/stable-schema smoke.
"""

from __future__ import annotations

import pytest

from noaa_etl_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_parity

ORACLE_NAMES = sorted(n for n in QUERIES if n in ORACLES)
ROWS_ONLY_NAMES = sorted(n for n in QUERIES if n not in ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_emits_no_wide_types(duck, name):
    """The driver's value hash is dtype-sensitive: DuckDB HUGEINT
    (sum(int)/count_if) and DECIMAL (decimal-literal arithmetic) hash
    differently from Spark's BIGINT/DOUBLE even on identical values
    (round-1 verdict, 16 queries). Make the class unrepresentable."""
    rel = duck.sql(ORACLES[name])
    wide = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t) or "DECIMAL" in str(t)
    ]
    assert not wide, f"oracle emits wide types (CAST them): {wide}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    spark_df = QUERIES[name](spark, SF_DIR)
    duck_rel = duck.sql(ORACLES[name])
    assert_parity(spark_df, duck_rel)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_smoke(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_graded_window_spans_every_family():
    """The driver grades only the FIRST 50 registered queries. Guard the
    curated window: exactly 50, all oracle-paired, first-50 in
    registration order, and every §2 family represented."""
    from noaa_etl_spark.registry import GRADED_WINDOW

    assert len(GRADED_WINDOW) == 50
    assert list(QUERIES)[:50] == GRADED_WINDOW
    assert all(n in ORACLES for n in GRADED_WINDOW)
    reps = {
        "A_sources": "q_csv_roundtrip",
        "B_filters": "q_filter_predicates",
        "C_joins": "q_join3_topk",
        "D_aggs": "q_pricing_summary",
        "E_windows": "q_window_rank",
        "F_sort": "q_topk_global",
        "G_setops": "q_set_ops",
        "H_scalars": "q_date_functions",
        "I_llm": "q_dedup_exact",
        "J_streaming": "q_stream_tumbling",
        "K_udfs": "q_udaf_trimmed_mean",
        "tpch": "q_tpch_q7_volume",
        "etl": "q_merge_upsert",
        "noaa": "q_ghcn_pipeline",
    }
    missing = {fam: q for fam, q in reps.items() if q not in GRADED_WINDOW}
    assert not missing, f"graded window lost family reps: {missing}"
