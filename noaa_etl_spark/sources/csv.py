"""CSV ingest with declared schema (NOAA by-year CSV style).

Compression is transparent by file extension in Spark's text
datasources for the codecs the JVM carries (.gz/.bz2/.lz4/.deflate —
this reader covers the gzip compressed_scan surface). zstd TEXT needs
the Hadoop native codec, absent in this container: the ``.zst`` leg
lives in :mod:`noaa_etl_spark.sources.zstd_text` (Python DataSource
pair, executor-side pyarrow codec).

Scale: a schema-declared CSV scan is splittable per file (gzip files are
not splittable — at 100 TB prefer many medium files or zstd with
seekable framing; the loader takes a glob/dir so file-level parallelism
is the unit of scale either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
    null_value: str = "",
    timestamp_format: str | None = None,
) -> DataFrame:
    """Read CSV with an explicit DDL schema string.

    ``schema`` example: ``"id BIGINT, name STRING, ts TIMESTAMP_NTZ"``.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("nullValue", null_value)
        # Fail loudly on malformed rows instead of silently nulling:
        # QC-grade ingest wants FAILFAST; use PERMISSIVE + corrupt-record
        # column in exploratory paths.
        .option("mode", "FAILFAST")
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)
