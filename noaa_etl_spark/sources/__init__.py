"""Typed ingest surface (SURVEY.md §2.A): CSV, JSON-lines, fixed-width
(GHCN-style), binary-payload readers — every reader takes a *declared*
schema (never inferSchema: nondeterministic typing and a full extra scan
at 100 TB)."""

from noaa_etl_spark.sources.csv import read_csv
from noaa_etl_spark.sources.jsonl import read_jsonl
from noaa_etl_spark.sources.fixed_width import FixedWidthField, read_fixed_width

__all__ = ["read_csv", "read_jsonl", "read_fixed_width", "FixedWidthField"]
