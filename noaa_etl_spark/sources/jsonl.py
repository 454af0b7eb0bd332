"""JSON-lines ingest with declared schema (north-star document dumps)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit DDL schema.

    Schema declaration keeps the scan single-pass (no inference pre-scan)
    and pins types so downstream oracle comparisons are stable.
    """
    return spark.read.schema(schema).option("mode", mode).json(path)
