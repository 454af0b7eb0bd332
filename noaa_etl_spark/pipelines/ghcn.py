"""GHCN-Daily ETL pipeline — the reference repo's domain, rebuilt
Spark-first (SURVEY.md §1.1: extract fixed-width `.dly`, transform
(QC-filter on flags, scaled-int → physical units, long↔wide reshape),
load Parquet/CSV).

The public `.dly` layout (GHCN-Daily readme): one line per
(station, year, month, element) with 31 day slots —

    ID        1-11   char
    YEAR     12-15   int
    MONTH    16-17   int
    ELEMENT  18-21   char  (TMAX/TMIN/PRCP/...)
    VALUE1   22-26   int   (scaled: tenths of °C / tenths of mm; -9999 = missing)
    MFLAG1   27      char
    QFLAG1   28      char  (non-blank = failed QC)
    SFLAG1   29      char
    ...repeating 8-char day groups through day 31 (line width 269)

Scale design: parsing is `spark.read.text` (splittable) + one narrow
projection; the wide→long day explosion is a generated 31-element array
+ ``explode`` (no shuffle); all downstream steps are ordinary
aggregations. A year of GHCN (~35M lines) is one narrow scan; 100 TB of
archive parallelizes per file with zero driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DLY_LINE_WIDTH = 269
MISSING = -9999

# Elements whose scaled integer value is tenths of the physical unit.
TENTHS_ELEMENTS = ("TMAX", "TMIN", "TAVG", "PRCP")

# Public GHCN by-year CSV layout (ID,DATE,ELEMENT,DATA_VALUE,M,Q,S,OBS_TIME).
GHCN_CSV_SCHEMA = (
    "station_id STRING, date_str STRING, element STRING, data_value INT, "
    "mflag STRING, qflag STRING, sflag STRING, obs_time STRING"
)


def parse_dly(raw: DataFrame) -> DataFrame:
    """Parse `.dly` lines (a DataFrame with a single ``value`` string
    column, e.g. from ``spark.read.text``) into long observations:
    (station_id, obs_date, element, value_scaled, mflag, qflag, sflag).

    Missing day slots (-9999) are dropped; day numbers invalid for the
    month (e.g. Feb 30) never appear as real values in well-formed files
    and are excluded by the same -9999 rule.
    """
    line = F.col("value")
    days = F.array(
        *[
            F.struct(
                F.lit(d).alias("day"),
                F.trim(F.substring(line, 22 + 8 * (d - 1), 5)).try_cast("int").alias("value_scaled"),
                F.substring(line, 27 + 8 * (d - 1), 1).alias("mflag"),
                F.substring(line, 28 + 8 * (d - 1), 1).alias("qflag"),
                F.substring(line, 29 + 8 * (d - 1), 1).alias("sflag"),
            )
            for d in range(1, 32)
        ]
    )
    exploded = raw.select(
        F.trim(F.substring(line, 1, 11)).alias("station_id"),
        F.substring(line, 12, 4).cast("int").alias("year"),
        F.substring(line, 16, 2).cast("int").alias("month"),
        F.trim(F.substring(line, 18, 4)).alias("element"),
        F.explode(days).alias("obs"),
    )
    return (
        exploded.filter(F.col("obs.value_scaled") != MISSING)
        .select(
            "station_id",
            F.make_date("year", "month", F.col("obs.day")).alias("obs_date"),
            "element",
            F.col("obs.value_scaled").alias("value_scaled"),
            F.trim(F.col("obs.mflag")).alias("mflag"),
            F.trim(F.col("obs.qflag")).alias("qflag"),
            F.trim(F.col("obs.sflag")).alias("sflag"),
        )
    )


def from_by_year_csv(csv_df: DataFrame) -> DataFrame:
    """GHCN by-year CSV rows (``GHCN_CSV_SCHEMA``, the
    ``ID,DATE,ELEMENT,DATA_VALUE,M,Q,S,OBS_TIME`` public layout) → the
    same long-observation shape ``parse_dly`` produces, so both ingest
    formats feed one transform chain. Null flags normalize to '' to
    match the fixed-width path's trimmed blanks."""
    return csv_df.select(
        "station_id",
        F.to_date("date_str", "yyyyMMdd").alias("obs_date"),
        "element",
        F.col("data_value").alias("value_scaled"),
        F.coalesce("mflag", F.lit("")).alias("mflag"),
        F.coalesce("qflag", F.lit("")).alias("qflag"),
        F.coalesce("sflag", F.lit("")).alias("sflag"),
    )


def qc_filter(obs: DataFrame) -> DataFrame:
    """Drop observations with a non-blank quality flag (the GHCN QC
    contract: any QFLAG value means the obs failed a check)."""
    return obs.filter(F.col("qflag").isNull() | (F.col("qflag") == ""))


def to_physical_units(obs: DataFrame) -> DataFrame:
    """Scaled int → physical value (tenths for temp/precip elements;
    other elements pass through unscaled)."""
    phys = F.when(
        F.col("element").isin(*TENTHS_ELEMENTS),
        F.col("value_scaled") / 10.0,
    ).otherwise(F.col("value_scaled").cast("double"))
    return obs.withColumn("value", phys)


def pivot_daily(obs: DataFrame, elements: list[str] | None = None) -> DataFrame:
    """Long→wide reshape: one row per (station, date) with one column
    per element — the analysis-ready daily table. Explicit element list
    (pivot without it adds a distinct pre-scan)."""
    elements = elements or list(TENTHS_ELEMENTS[:3])
    return (
        obs.groupBy("station_id", "obs_date")
        .pivot("element", elements)
        .agg(F.min("value"))
    )


def monthly_climate(obs: DataFrame) -> DataFrame:
    """Monthly per-station/element climate statistics (the canonical
    GHCN rollup): observation count, mean/min/max physical value."""
    return (
        obs.groupBy(
            "station_id",
            F.year("obs_date").alias("year"),
            F.month("obs_date").alias("month"),
            "element",
        )
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def run_pipeline(spark, dly_path: str, out_path: str, partition_by_year: bool = True) -> None:
    """The reference repo's end-to-end job as one call: `.dly` files in,
    cleaned long observations + monthly climate parquet out."""
    parsed = parse_dly(spark.read.text(dly_path))
    clean = to_physical_units(qc_filter(parsed))
    writer = clean.withColumn("obs_year", F.year("obs_date")).write.mode("overwrite")
    if partition_by_year:
        writer = writer.partitionBy("obs_year")
    writer.parquet(f"{out_path}/observations")
    monthly_climate(clean).write.mode("overwrite").parquet(f"{out_path}/monthly_climate")


def format_dly(obs_monthly: DataFrame) -> DataFrame:
    """Inverse of parse_dly for the sink side: render one `.dly` line per
    (station, year, month, element) from a DataFrame with columns
    (station_id, year, month, element, days: map<int, struct<value_scaled int, qflag string>>).

    Missing days render as -9999 with blank flags.
    """
    day_str = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(31)),
            lambda d: F.format_string(
                "%5d%1s%1s%1s",
                F.coalesce(F.element_at(F.col("days"), d)["value_scaled"], F.lit(MISSING)),
                F.lit(" "),
                F.coalesce(
                    F.nullif(F.element_at(F.col("days"), d)["qflag"], F.lit("")),
                    F.lit(" "),
                ),
                F.lit(" "),
            ),
        ),
        "",
    )
    return obs_monthly.select(
        F.format_string(
            "%-11s%4d%02d%-4s%s",
            F.col("station_id"),
            F.col("year"),
            F.col("month"),
            F.col("element"),
            day_str,
        ).alias("value")
    )


def _main() -> None:  # pragma: no cover - thin CLI wrapper over run_pipeline
    import argparse

    from noaa_etl_spark.session import get_spark

    ap = argparse.ArgumentParser(description="GHCN-Daily ETL: .dly → parquet")
    ap.add_argument("dly_path", help="file/dir/glob of GHCN .dly fixed-width files")
    ap.add_argument("out_path", help="output directory (observations/ + monthly_climate/)")
    ap.add_argument("--no-partition", action="store_true", help="skip partitionBy(year)")
    args = ap.parse_args()
    spark = get_spark("ghcn-etl")
    run_pipeline(spark, args.dly_path, args.out_path, not args.no_partition)
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    _main()
