"""Custom Python DataSource tests: deterministic output, partition
parallelism, and stream-stream join equivalence (the remaining
streaming-join surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.sources.synthetic import (
    _HAS_DATASOURCE_API,
    SyntheticObsDataSource,
    _det_value,
)
from noaa_etl_spark.streaming.core import run_to_memory, stream_table
from tests.conftest import SF_SMALL


@pytest.mark.skipif(not _HAS_DATASOURCE_API, reason="Spark 4 DataSource API absent")
def test_synthetic_datasource_deterministic_and_partitioned(spark):
    spark.dataSource.register(SyntheticObsDataSource)
    df = (
        spark.read.format("synthetic_obs")
        .option("n_stations", 5)
        .option("n_days", 10)
        .load()
    )
    # One Spark partition per station partition.
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    assert len(rows) == 5 * 10 * 3
    # Spot-check determinism against the generator function.
    sample = [r for r in rows if r["station_id"] == "SYN00000002" and r["day"] == 7]
    for r in sample:
        assert r["value_scaled"] == _det_value(2, 7, r["element"])
    # Re-read must be identical (no hidden RNG state).
    again = (
        spark.read.format("synthetic_obs")
        .option("n_stations", 5)
        .option("n_days", 10)
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_stream_stream_join_equals_batch(spark):
    """Watermarked stream-stream inner join (purchase ⋈ click within 1h
    back-window per user) over complete data must equal the batch join."""
    def legs(source):
        p = source.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        c = source.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        return p, c

    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
    )

    sp, sc = legs(stream_table(spark, SF_SMALL, "events"))
    joined = sp.withWatermark("p_ts", "2 hours").join(
        sc.withWatermark("c_ts", "2 hours"), cond, "inner"
    )
    streamed = run_to_memory(joined, "mem_stream_stream_join", "append")

    bp, bc = legs(load_table(spark, SF_SMALL, "events"))
    batch = bp.join(bc, cond, "inner")

    s = {(r["p_id"], r["c_id"]) for r in streamed.collect()}
    b = {(r["p_id"], r["c_id"]) for r in batch.collect()}
    assert s == b
    assert len(b) > 0
