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
def test_oracle_parity(spark, duck, name):
    spark_df = QUERIES[name](spark, SF_DIR)
    duck_rel = duck.sql(ORACLES[name])
    assert_parity(spark_df, duck_rel)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_smoke(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0
