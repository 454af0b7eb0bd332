"""zstd-compressed CSV source + sink as a Python DataSource pair.

Why this exists: this container's JVM has no Hadoop native zstd codec,
so Spark's built-in text datasources reject ``compression=zstd``
(``CODEC_NOT_AVAILABLE``; gzip/bzip2/lz4/deflate work, zstd does not).
Parquet/ORC zstd is unaffected (zstd-jni is bundled for columnar
formats) — it is only *text* formats that lose the codec. Rather than
silently dropping the ``.zst`` half of SURVEY.md §2.A's compressed_scan
row, the engine supplies the codec Python-side: pyarrow links libzstd,
and the Spark 4 Python DataSource API runs reader and writer code on
executors, so both directions stay fully distributed:

- **read**: one ``InputPartition`` per ``.csv.zst`` file; each task
  streams its file through ``pyarrow.input_stream(compression="zstd")``
  into ``pyarrow.csv.read_csv`` and yields Arrow RecordBatches —
  vectorized end-to-end, no per-row Python objects. File-level
  parallelism is the scan's unit of scale (same story as gzip text:
  single-file compression is not splittable, so at 100 TB you shard
  into many medium files; zstd's seekable-frame extension would enable
  intra-file splits but pyarrow's reader does not expose it).
- **write**: a :class:`~pyspark.sql.datasource.DataSourceArrowWriter` —
  each task receives Arrow RecordBatches and emits one
  ``part-*.csv.zst`` via a zstd ``CompressedOutputStream``. Write
  bandwidth scales with the cluster; commit publishes atomically by
  the same all-tasks-succeeded contract as every DataSource sink.

Schema is always DECLARED (DDL string), never inferred — consistent
with the package-wide ingest rule (inference costs an extra full scan
and nondeterministic typing at scale).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

try:  # Spark 4+ only; the engine degrades gracefully without it.
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        DataSourceReader,
        InputPartition,
        WriterCommitMessage,
    )

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore
    DataSourceArrowWriter = object  # type: ignore
    DataSourceReader = object  # type: ignore
    InputPartition = object  # type: ignore
    WriterCommitMessage = object  # type: ignore
    _HAS_DATASOURCE_API = False


@dataclass
class _ZstFilePartition(InputPartition):
    path: str


@dataclass
class _ZstPartMessage(WriterCommitMessage):
    file: str | None  # None: empty partition, no file written
    rows: int


def _arrow_schema_of(spark_schema):
    """Spark StructType → equivalent Arrow schema (drives both the CSV
    parse types and the batch cast so executor output matches what the
    JVM expects back over Arrow)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


class ZstCsvReader(DataSourceReader):
    def __init__(self, schema, options):
        self.spark_schema = schema
        self.path = options["path"]
        self.header = options.get("header", "true").lower() == "true"

    def partitions(self):
        # Driver-side listing (local FS here; a real deployment lists
        # through its object-store client the same way). One partition
        # per file — the scan parallelizes across files.
        p = self.path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith(".zst") and not f.startswith(("_", "."))
            )
        else:
            files = [p]
        if not files:
            raise FileNotFoundError(f"no .zst files under {p!r}")
        return [_ZstFilePartition(f) for f in files]

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.csv as pacsv

        target = _arrow_schema_of(self.spark_schema)
        # Empty field ⇒ NULL, matching the package-wide CSV convention
        # (sources/csv.py reads with nullValue="" too): the text format
        # cannot distinguish NULL from empty string either way.
        convert = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in target},
            strings_can_be_null=True,
        )
        read_opts = pacsv.ReadOptions(
            column_names=None if self.header else [f.name for f in target]
        )
        with pa.input_stream(partition.path, compression="zstd") as stream:
            table = pacsv.read_csv(
                stream, read_options=read_opts, convert_options=convert
            )
        # Column order in the file is not a contract; the declared
        # schema's order is.
        table = table.select([f.name for f in target]).cast(target)
        yield from table.to_batches()


class ZstCsvArrowWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = bool(overwrite)

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.csv as pacsv

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.csv.zst")
        sink = None
        writer = None
        n = 0
        for batch in iterator:
            if writer is None:
                sink = pa.output_stream(fname, compression="zstd")
                writer = pacsv.CSVWriter(sink, batch.schema)
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is None:  # empty partition
            return _ZstPartMessage(file=None, rows=0)
        writer.close()
        sink.close()
        return _ZstPartMessage(file=fname, rows=n)

    def commit(self, messages):
        if self.overwrite:
            # All tasks succeeded: retire every pre-existing part file
            # that is not part of this batch. uuid part names make the
            # new set disjoint from the old, so this is safe.
            keep = {
                os.path.basename(m.file)
                for m in messages
                if m is not None and m.file is not None
            }
            for f in os.listdir(self.path):
                if f.endswith(".zst") and f not in keep:
                    os.remove(os.path.join(self.path, f))

    def abort(self, messages):
        for m in messages:
            if m is not None and m.file is not None and os.path.exists(m.file):
                os.remove(m.file)


class ZstCsvDataSource(DataSource):
    """``spark.read.format("csv_zst")`` / ``df.write.format("csv_zst")``.

    Options: ``path`` (file or directory), ``schema`` (DDL string,
    read side), ``header`` (default true).
    """

    @classmethod
    def name(cls):
        return "csv_zst"

    def schema(self):
        if "schema" not in self.options:
            raise ValueError("csv_zst requires option 'schema' (DDL string)")
        return self.options["schema"]

    def reader(self, schema):
        if "path" not in self.options:
            raise ValueError("csv_zst requires option 'path'")
        return ZstCsvReader(schema, self.options)

    def writer(self, schema, overwrite: bool):
        if "path" not in self.options:
            raise ValueError("csv_zst requires option 'path'")
        return ZstCsvArrowWriter(self.options, overwrite)


def _register(spark) -> None:
    # Must precede register(): registration pickles the class, and only
    # configure_session's by-value registration makes that pickle
    # self-contained for workers that can't import noaa_etl_spark.
    from noaa_etl_spark.session import configure_session

    configure_session(spark)
    spark.dataSource.register(ZstCsvDataSource)


def write_csv_zst(df, path: str, overwrite: bool = True):
    """Distributed zstd-CSV write (executor-side pyarrow codec)."""
    _register(df.sparkSession)
    mode = "overwrite" if overwrite else "append"
    df.write.format("csv_zst").option("path", path).mode(mode).save()


def read_csv_zst(spark, path: str, schema: str):
    """Distributed zstd-CSV scan with a declared DDL schema."""
    _register(spark)
    return (
        spark.read.format("csv_zst")
        .option("path", path)
        .option("schema", schema)
        .load()
    )
