"""Compaction operator: row preservation, output sizing, plan shape
(coalesce mode must not shuffle), and clustering repair via sort_cols."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.compaction import compact, file_stats, plan_compaction
from tests.conftest import SF_DIR


def _checksum(df):
    """Order-insensitive content checksum: sum of per-row xxhash64 over
    every column rendered to string."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in df.columns]
    return (
        df.select(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"))
        .collect()[0]
        .h
    )


def _fragmented(spark, tmp_dir, n_files=64):
    src = os.path.join(tmp_dir, "fragmented")
    if not os.path.exists(src):
        load_table(spark, SF_DIR, "lineitem").repartition(n_files).write.mode(
            "overwrite"
        ).parquet(src)
    return src


def test_compact_shuffle_preserves_rows_and_hits_target(spark, tmp_dir):
    src = _fragmented(spark, tmp_dir)
    n_in, total_bytes = file_stats(spark, src)
    assert n_in == 64
    # pick a target size that plans to ~4 output files
    target_mb = max(1, round(total_bytes / 4 / (1 << 20)))
    out = os.path.join(tmp_dir, "compacted")
    plan = compact(spark, src, out, target_file_mb=target_mb)
    assert plan["n_files"] == 64
    assert 2 <= plan["n_target"] <= 8
    assert plan["n_files_out"] == plan["n_target"]
    before, after = spark.read.parquet(src), spark.read.parquet(out)
    assert before.count() == after.count()
    assert _checksum(before) == _checksum(after)
    # shuffle mode evens out file sizes
    sizes = [os.path.getsize(p) for p in glob.glob(os.path.join(out, "*.parquet"))]
    assert max(sizes) < 3 * min(sizes)


def test_compact_coalesce_mode_has_no_shuffle(spark, tmp_dir):
    src = _fragmented(spark, tmp_dir)
    df = spark.read.parquet(src).coalesce(4)
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str
    out = os.path.join(tmp_dir, "coalesced")
    _, total_bytes = file_stats(spark, src)
    target_mb = max(1, round(total_bytes / 4 / (1 << 20)))
    plan = compact(spark, src, out, target_file_mb=target_mb, mode="coalesce")
    assert plan["n_files_out"] == plan["n_target"]
    assert _checksum(spark.read.parquet(src)) == _checksum(spark.read.parquet(out))


def test_compact_with_sort_cols_restores_clustering(spark, tmp_dir):
    """sort_cols rewrite yields (near-)disjoint per-file key ranges —
    the data-skipping layout a fragmented table has lost. Range
    partition boundaries are sampled, so allow one file-pair overlap."""
    src = _fragmented(spark, tmp_dir)
    out = os.path.join(tmp_dir, "clustered")
    _, total_bytes = file_stats(spark, src)
    target_mb = max(1, round(total_bytes / 4 / (1 << 20)))
    compact(spark, src, out, target_file_mb=target_mb, sort_cols=["l_orderkey"])
    spans = []
    for p in glob.glob(os.path.join(out, "*.parquet")):
        md = pq.ParquetFile(p).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index("l_orderkey")
        lo = min(md.row_group(r).column(idx).statistics.min for r in range(md.num_row_groups))
        hi = max(md.row_group(r).column(idx).statistics.max for r in range(md.num_row_groups))
        spans.append((lo, hi))
    spans.sort()
    overlaps = sum(1 for (a, b) in zip(spans, spans[1:]) if a[1] > b[0])
    assert overlaps <= 1
    # fragmented input, by contrast, has every file spanning ~everything
    frag_spans = []
    for p in glob.glob(os.path.join(src, "*.parquet"))[:8]:
        md = pq.ParquetFile(p).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index("l_orderkey")
        frag_spans.append(
            (
                md.row_group(0).column(idx).statistics.min,
                md.row_group(md.num_row_groups - 1).column(idx).statistics.max,
            )
        )
    frag_spans.sort()
    frag_overlaps = sum(1 for (a, b) in zip(frag_spans, frag_spans[1:]) if a[1] > b[0])
    assert frag_overlaps >= len(frag_spans) - 2


def test_plan_compaction_reports_shape(spark, tmp_dir):
    src = _fragmented(spark, tmp_dir)
    plan = plan_compaction(spark, src, target_file_mb=10_000)
    assert plan["n_files"] == 64
    assert plan["n_target"] == 1
    assert plan["total_bytes"] > 0
