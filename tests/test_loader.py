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
