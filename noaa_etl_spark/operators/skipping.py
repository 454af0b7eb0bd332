"""File-level min/max stats index + manifest-side data skipping.

The Delta/Iceberg data-skipping pattern re-expressed on plain parquet
directories: build a tiny per-file (min, max, n_rows) manifest from
parquet FOOTERS only (no data pages read), then prune the file list
driver-side before the scan job is even planned.

Why this exists when parquet already has row-group stats: Spark's
row-group skipping still *schedules a task per file* and pays a footer
read per file per query. At 100 TB a table is O(10^6) files — listing
plus footer reads dominate short queries. A persisted stats index makes
pruning a metadata-only filter over a manifest table (exactly Delta's
Add-file stats / Iceberg's manifest entries): the scan job never sees
skipped files. Complements Z-order / repartitionByRange layout
(operators/zorder.py, compaction.py sort_cols mode), which make per-file
ranges disjoint so the pruning actually bites.

Reference parity: the reference engine's zone-map / small-materialized-
aggregate skipping (per-block min/max consulted before touching a
block); here the "block" is a parquet file and the zone map is a
DataFrame you can persist and union incrementally as batches land.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _strip_scheme(path: str) -> str:
    if path.startswith("file:"):
        path = path[len("file:"):]
        while path.startswith("//"):
            path = path[1:]
    return path


def build_stats_index(spark: SparkSession, path: str, cols: Sequence[str]) -> DataFrame:
    """Per-file stats manifest: (file, n_rows, <c>_min, <c>_max per c).

    Footer-only: file paths are distributed and each task opens just the
    parquet footer via pyarrow (metadata + row-group statistics — data
    pages are never read), folding row-group stats to file grain. A
    column with no usable stats (e.g. all-null) yields NULL min/max,
    which `prune_files` treats as "must keep".

    100 TB: one short task per file, no shuffle; output is |files| rows
    × (2·|cols|+2) columns — persist it next to the table and append new
    batches' rows incrementally (the manifest is additive, like HLL/CMS
    sketch tables).
    """
    files = [f for f in spark.read.parquet(path).inputFiles()]
    sample = spark.read.parquet(path).schema
    types = {f.name: f.dataType.simpleString() for f in sample.fields}
    for c in cols:
        if c not in types:
            raise ValueError(f"column {c!r} not in table schema {sorted(types)}")

    out_schema = "file string, n_rows bigint, " + ", ".join(
        f"{c}_min {types[c]}, {c}_max {types[c]}" for c in cols
    )
    cols_local = list(cols)

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for batch in batches:
            rows = []
            for uri in batch["file"]:
                md = pq.ParquetFile(_strip_scheme(uri)).metadata
                name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                rec = {"file": uri, "n_rows": md.num_rows}
                for c in cols_local:
                    lo = hi = None
                    idx = name_to_idx[c]
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            lo = hi = None
                            break
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    rec[f"{c}_min"] = lo
                    rec[f"{c}_max"] = hi
                rows.append(rec)
            yield pd.DataFrame(rows)

    file_df = spark.createDataFrame([(f,) for f in files], "file string")
    # one footer per task: footer reads are short and even, and a dead
    # node re-reads only its own files
    return file_df.repartition(min(len(files), 64)).mapInPandas(read_footers, out_schema)


def prune_files(
    index: DataFrame, bounds: dict[str, tuple[object, object]]
) -> list[str]:
    """Driver-side manifest pruning: keep files whose [min, max] spans
    overlap every requested [lo, hi] (inclusive; None = unbounded).
    NULL stats keep the file — skipping must be SOUND (a pruned file
    provably contains no matching rows); it may only be incomplete.

    Returns the surviving file URIs (tiny: paths only — the same shape
    Delta's log replay hands the scan planner). Driver-side bound: the
    collect moves ~100 B per SURVIVING file (1 MB at 10⁴ files; probed
    curve in SCALING.md). Beyond ~10⁶ files the manifest itself should
    be stored partitioned by the layout key so this filter prunes
    manifest partitions before collecting — Delta-checkpoint-style —
    keeping the collect proportional to the answer, not the table."""
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        mn, mx = F.col(f"{c}_min"), F.col(f"{c}_max")
        # literals cast to the stats column's own type (ANSI rejects
        # e.g. string-vs-TIMESTAMP_NTZ comparisons)
        typ = index.schema[f"{c}_min"].dataType
        keep = F.lit(True)
        if hi is not None:
            keep = keep & (mn <= F.lit(hi).cast(typ))
        if lo is not None:
            keep = keep & (mx >= F.lit(lo).cast(typ))
        # NULL stats ⇒ keep (NULL comparisons above yield NULL ⇒ coalesce)
        cond = cond & F.coalesce(keep, F.lit(True))
    return [r.file for r in index.filter(cond).select("file").collect()]


def read_pruned(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    bounds: dict[str, tuple[object, object]],
) -> DataFrame:
    """Scan only the files the stats index cannot rule out. The caller
    still applies the row-level predicate — skipping is a superset
    guarantee (file grain), not the filter itself."""
    files = prune_files(index, bounds)
    if not files:
        return spark.read.parquet(path).limit(0)
    schema = spark.read.parquet(path).schema
    return spark.read.schema(schema).parquet(*files)
