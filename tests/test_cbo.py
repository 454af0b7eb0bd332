"""Cost-based optimizer demonstration: column statistics change the
compile-time join strategy.

Without column stats, Catalyst sizes a filtered relation at its full
file footprint — a selective filter on a dim is invisible to the
broadcast decision, so a threshold below the file size forces a
sort-merge join. `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`
plus `spark.sql.cbo.enabled` lets FilterEstimation shrink the estimate
(equality on a unique key ⇒ ~1 row), flipping the same query to a
broadcast join at compile time.

At 100 TB this is the difference between planning from guesses and
planning from the catalog: AQE can rescue *runtime* sizes after a
shuffle materializes, but only stats move the decision before the
first exchange is laid down. The assertions read `sparkPlan` (the
compile-time plan), not `executedPlan`, precisely so AQE's runtime
rescue doesn't mask the stats effect.
"""

from __future__ import annotations

import os
import shutil

import pytest

from noaa_etl_spark.io import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def catalog_tables(spark):
    """customer/orders as managed catalog tables (ANALYZE needs the
    catalog; plain parquet-dir reads have nowhere to put stats)."""
    names = ["cbo_customer", "cbo_orders"]
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for n, src in zip(names, ["customer", "orders"]):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        # stale-dir gotcha: a fresh session's catalog forgets tables
        # whose warehouse dirs survive (see tests/test_scale.py)
        shutil.rmtree(os.path.join(warehouse, n), ignore_errors=True)
        load_table(spark, SF_DIR, src).write.saveAsTable(n)
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def _compile_time_plan(spark) -> str:
    df = spark.sql(
        """
        SELECT o.o_orderkey, c.c_name
        FROM cbo_orders o JOIN cbo_customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey = 42
        """
    )
    return df._jdf.queryExecution().sparkPlan().toString()


def test_column_stats_flip_join_to_broadcast(spark, catalog_tables):
    confs = {
        "spark.sql.cbo.enabled": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    for k in confs:
        confs[k] = spark.conf.get(k)
    try:
        # Threshold below the dim's file footprint but far above the
        # true post-filter size (1 row).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024))
        spark.conf.set("spark.sql.cbo.enabled", "false")

        no_stats_plan = _compile_time_plan(spark)
        assert "SortMergeJoin" in no_stats_plan, no_stats_plan

        for t in catalog_tables:
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.conf.set("spark.sql.cbo.enabled", "true")

        stats_plan = _compile_time_plan(spark)
        assert "BroadcastHashJoin" in stats_plan, stats_plan
    finally:
        for k, v in confs.items():
            spark.conf.set(k, v)
