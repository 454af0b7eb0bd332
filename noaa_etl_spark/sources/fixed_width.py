"""Fixed-width file ingest (GHCN ``ghcnd-stations.txt`` / ``.dly`` style).

Spark has no fixed-width datasource; the scalable composition is
``spark.read.text`` (splittable, whole-stage codegen'd) followed by one
``substring`` + ``trim`` + ``cast`` projection per field — a single
narrow map stage, no shuffle, no Python.

The public GHCN station-metadata layout is included as a ready spec
(columns per the published ghcnd-stations.txt format: ID 1-11,
LATITUDE 13-20, LONGITUDE 22-30, ELEVATION 32-37, STATE 39-40,
NAME 42-71, GSN 73-75, HCN/CRN 77-79, WMO 81-85).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FixedWidthField:
    name: str
    start: int  # 1-based, inclusive (as printed in format docs)
    length: int
    dtype: str = "string"  # Spark cast target; string fields are trimmed


# Public GHCN-Daily station metadata layout.
GHCND_STATIONS_SPEC: tuple[FixedWidthField, ...] = (
    FixedWidthField("station_id", 1, 11),
    FixedWidthField("latitude", 13, 8, "double"),
    FixedWidthField("longitude", 22, 9, "double"),
    FixedWidthField("elevation", 32, 6, "double"),
    FixedWidthField("state", 39, 2),
    FixedWidthField("name", 42, 30),
    FixedWidthField("gsn_flag", 73, 3),
    FixedWidthField("hcn_crn_flag", 77, 3),
    FixedWidthField("wmo_id", 81, 5, "int"),
)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: tuple[FixedWidthField, ...] | list[FixedWidthField],
) -> DataFrame:
    """Parse a fixed-width text file into typed columns.

    Numeric casts use ``try_cast`` so blank/garbage field regions become
    NULL instead of failing the whole scan under ANSI mode (QC filters
    downstream decide what to do with them).
    """
    raw = spark.read.text(path)
    cols = []
    for f in fields:
        piece = F.substring(F.col("value"), f.start, f.length)
        if f.dtype == "string":
            cols.append(F.trim(piece).alias(f.name))
        else:
            cols.append(F.trim(piece).try_cast(f.dtype).alias(f.name))
    return raw.select(*cols)
