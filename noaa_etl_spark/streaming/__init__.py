"""Structured Streaming surface (SURVEY.md §2.J): streaming twins of the
temporal operators, run in tests/graded queries with
``trigger(availableNow=True)`` so they terminate batch-shaped."""

from noaa_etl_spark.streaming.core import run_to_memory, stream_table

__all__ = ["stream_table", "run_to_memory"]
