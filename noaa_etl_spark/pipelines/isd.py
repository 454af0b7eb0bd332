"""ISD-Lite (hourly surface weather) ETL — the hourly companion to the
GHCN-Daily pipeline (SURVEY.md §1.1; same extract/transform/load class).

The public ISD-Lite layout (NOAA isd-lite-format documentation): one line
per station-hour, fixed right-aligned integer columns, -9999 = missing,
scaled fields in tenths —

    YEAR         1-4          OBS: air temp      14-19  tenths °C
    MONTH        6-7               dew point     20-25  tenths °C
    DAY          9-10              sea-lvl press 26-31  tenths hPa
    HOUR        12-13              wind dir      32-37  degrees
                                   wind speed    38-43  tenths m/s
                                   sky condition 44-49  code
                                   precip 1h     50-55  tenths mm
                                   precip 6h     56-61  tenths mm

Files are one-per-(station, year), named ``USAF-WBAN-YYYY`` (optionally
``.gz`` — transparent by extension), so station identity lives in the
path, not the record: the parser recovers it with ``input_file_name()``,
which is a per-task metadata lookup, not a shuffle.

Scale: like the `.dly` path, parsing is `spark.read.text` (splittable,
codegen'd substrings) + one narrow projection; a full ISD year (~14k
stations) parallelizes per file with zero driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_etl_spark.sources.fixed_width import FixedWidthField

MISSING = -9999

# (name, start, length) per the public layout; all numeric.
ISD_LITE_FIELDS: tuple[FixedWidthField, ...] = (
    FixedWidthField("year", 1, 4, "int"),
    FixedWidthField("month", 6, 2, "int"),
    FixedWidthField("day", 9, 2, "int"),
    FixedWidthField("hour", 12, 2, "int"),
    FixedWidthField("air_temp", 14, 6, "int"),
    FixedWidthField("dew_point", 20, 6, "int"),
    FixedWidthField("sea_level_pressure", 26, 6, "int"),
    FixedWidthField("wind_direction", 32, 6, "int"),
    FixedWidthField("wind_speed", 38, 6, "int"),
    FixedWidthField("sky_condition", 44, 6, "int"),
    FixedWidthField("precip_1h", 50, 6, "int"),
    FixedWidthField("precip_6h", 56, 6, "int"),
)

# Scaled-integer fields stored as tenths of the physical unit.
TENTHS_FIELDS = ("air_temp", "dew_point", "sea_level_pressure", "wind_speed", "precip_1h", "precip_6h")
# Pass-through integer fields (already physical).
RAW_FIELDS = ("wind_direction", "sky_condition")


def parse_isd_lite(spark: SparkSession, path: str) -> DataFrame:
    """Parse ISD-Lite files into long hourly observations:
    (station_id, ts, <scaled int fields>), -9999 → NULL.

    ``station_id`` is the ``USAF-WBAN`` pair recovered from the file
    name; lines whose date parts fail to parse are dropped (malformed
    header/footer junk) rather than failing the scan — ISD archives are
    append-only and occasionally carry truncated tails.
    """
    raw = spark.read.text(path).withColumn(
        "station_id",
        F.regexp_extract(F.input_file_name(), r"([0-9]{6}-[0-9]{5})-[0-9]{4}", 1),
    )
    line = F.col("value")
    cols = [
        F.trim(F.substring(line, f.start, f.length)).try_cast(f.dtype).alias(f.name)
        for f in ISD_LITE_FIELDS
    ]
    typed = raw.select("station_id", *cols)
    obs_fields = TENTHS_FIELDS + RAW_FIELDS
    return typed.filter(
        F.col("year").isNotNull()
        & F.col("month").isNotNull()
        & F.col("day").isNotNull()
        & F.col("hour").isNotNull()
    ).select(
        "station_id",
        F.make_timestamp_ntz(
            F.col("year"), F.col("month"), F.col("day"), F.col("hour"), F.lit(0), F.lit(0)
        ).alias("ts"),
        *[
            F.when(F.col(c) != MISSING, F.col(c)).alias(c)  # -9999 → NULL
            for c in obs_fields
        ],
    )


def to_physical_units(obs: DataFrame) -> DataFrame:
    """Tenths-scaled ints → physical doubles (°C, hPa, m/s, mm);
    degree/code fields pass through as ints."""
    return obs.select(
        "station_id",
        "ts",
        *[(F.col(c) / 10.0).alias(c) for c in TENTHS_FIELDS],
        *[F.col(c) for c in RAW_FIELDS],
    )


def daily_summary(obs: DataFrame) -> DataFrame:
    """Hourly → daily per-station rollup: temperature min/mean/max,
    total 1-hour precipitation, observation count. NULLs (missing) are
    excluded per-aggregate — exactly the count-aware semantics a QC'd
    climate product needs."""
    return (
        obs.groupBy("station_id", F.to_date("ts").alias("obs_date"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.min("air_temp").alias("tmin"),
            F.round(F.avg("air_temp"), 6).alias("tavg"),
            F.max("air_temp").alias("tmax"),
            F.round(F.sum("precip_1h"), 6).alias("prcp"),
        )
    )


def run_pipeline(spark: SparkSession, isd_path: str, out_path: str) -> None:
    """End-to-end: ISD-Lite fixed-width in, physical hourly observations
    (year-partitioned) + daily summaries out."""
    clean = to_physical_units(parse_isd_lite(spark, isd_path))
    (
        clean.withColumn("obs_year", F.year("ts"))
        .write.mode("overwrite")
        .partitionBy("obs_year")
        .parquet(f"{out_path}/hourly")
    )
    daily_summary(clean).write.mode("overwrite").parquet(f"{out_path}/daily")


def _main() -> None:  # pragma: no cover - thin CLI wrapper over run_pipeline
    import argparse

    from noaa_etl_spark.session import get_spark

    ap = argparse.ArgumentParser(description="ISD-Lite ETL: fixed-width → parquet")
    ap.add_argument("isd_path", help="file/dir/glob of ISD-Lite files (USAF-WBAN-YYYY[.gz])")
    ap.add_argument("out_path", help="output directory (hourly/ + daily/)")
    args = ap.parse_args()
    spark = get_spark("isd-etl")
    run_pipeline(spark, args.isd_path, args.out_path)
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    _main()
