"""Loader normalization contract: ``events.ts`` must arrive as a plain
TIMESTAMP whatever physical encoding the fixture generator shipped —
TIMESTAMP(NANOS) (rounds 1-3, read as long nanos under nanosAsLong) or
TIMESTAMP(MICROS, ntz) (round 4+, inferred TIMESTAMP_NTZ). A generator
switch between encodings broke three graded queries in round 3; this
test synthesizes BOTH encodings and pins identical loader output.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table

_MICROS = [1_500_000_123_456_789, 1_500_003_999_000_001, 1_500_007_000_500_000]


def _write_events(path: str, unit: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if unit == "ns":
        ts = pa.array([m * 1000 for m in _MICROS], pa.timestamp("ns"))
    else:
        ts = pa.array(_MICROS, pa.timestamp("us"))
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["a", "b", "a"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, path)


def test_fixture_decayed_sum_dyadic_bound():
    """Regen-robustness pin for q_decayed_sum's bit-exactness contract
    (ADVICE r7): every partial sum of day_cents·2^d must stay within the
    53-bit double mantissa, i.e. per event type
    max(day_cents).bit_length() + (max_day − min_day) ≤ 52. The current
    fixture sits around 19 + 29 bits; if the driver ever regenerates a
    longer-span or higher-volume events table that violates the bound,
    this fails LOUDLY in the local suite instead of as a driver
    hash-miss (DuckDB's segment-tree window sum vs Spark's sequential
    running sum would then differ in the last ulp).
    """
    import duckdb

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        path = os.path.join(sf_dir, "events.parquet")
        if not os.path.exists(path):
            continue
        row = duckdb.sql(
            f"""
            WITH daily AS (
              SELECT event_type,
                     CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000) AS BIGINT) AS day_idx,
                     sum(CAST(floor(value * 100) AS BIGINT)) AS day_cents
              FROM read_parquet('{path}')
              GROUP BY 1, 2
            )
            SELECT max(bit_length), max(span) FROM (
              SELECT CAST(ceil(log2(max(abs(day_cents)) + 1)) AS INT) AS bit_length,
                     max(day_idx) - min(day_idx) AS span
              FROM daily GROUP BY event_type
            )
            """
        ).fetchone()
        bits, span = int(row[0]), int(row[1])
        assert bits + span <= 52, (
            f"{sf_dir}: day_cents bits={bits} + day span={span} > 52 — "
            "q_decayed_sum's dyadic exactness no longer holds on this "
            "fixture; switch its grade to a rounded/tolerance form"
        )


def test_events_ts_normalizes_identically_across_encodings(spark, tmp_dir):
    rows = {}
    for unit in ("ns", "us"):
        sf_dir = os.path.join(tmp_dir, f"enc_{unit}")
        _write_events(os.path.join(sf_dir, "events.parquet"), unit)
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (unit, df.dtypes)
        # unix_micros (the gap-math workhorse) must accept the
        # normalized column and see identical epoch values.
        got = (
            df.select("event_id", F.unix_micros("ts").alias("us"))
            .orderBy("event_id")
            .collect()
        )
        rows[unit] = [(r["event_id"], r["us"]) for r in got]
    assert rows["ns"] == rows["us"] == list(zip([1, 2, 3], _MICROS))
