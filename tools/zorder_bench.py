#!/usr/bin/env python
"""Z-order data-skipping bench: does the Morton layout actually prune?

tests/test_zorder.py proves the LAYOUT property (per-file min/max spans
shrink on every keyed column); this measures the EFFECT — a selective
2-D box filter over three physical layouts of the same rows:

    natural    insertion order (random in both keys)
    sorted_x   single-column sort — the "just sort by the hot key" rival
    zorder_xy  Morton-interleaved (x, y)
    hilbert_xy Hilbert-curve (x, y) — no diagonal jumps, tighter boxes
    zorder_xyz Morton over three keys — the dimensionality tax demo

For each layout: median-of-3 wall for the box count, plus the fraction
of parquet ROW GROUPS whose min/max stats overlap the box (pyarrow
metadata — the unit Spark's parquet reader prunes at; fewer overlapping
groups = less IO regardless of local disk speed, which is the quantity
that matters when the bytes live on S3/HDFS).

Expected shape (and what SCALING.md records):
- x-filter only: sorted_x ~ zorder_xy << natural (sorting any key wins
  on that key).
- (x, y) box: zorder_xy prunes on BOTH keys; sorted_x degenerates to
  natural on the y dimension once the x slice is wider than a file.
- zorder_xyz vs zorder_xy on the same 2-D box: bits/dim drop from 24
  to 16, spans widen — z-order the 2-3 most-filtered columns, not
  everything.

Usage: python tools/zorder_bench.py [n_rows]      (default 4,000,000)
Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from noaa_etl_spark.operators.zorder import hilbert_by, zorder_by
from noaa_etl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".tmp", "zorder_bench")

KEY_SPAN = 100_000  # x, y, w uniform in [0, KEY_SPAN)


def build(spark, n_rows: int):
    """Deterministic rows: independent uniform keys from xxhash64 of the
    id — no RNG state, identical across runs."""
    df = spark.range(n_rows)
    key = lambda salt: F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(KEY_SPAN))
    return df.select(
        key("x").alias("x"),
        key("y").alias("y"),
        key("w").alias("w"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )


def overlap_fraction(path: str, box: dict[str, tuple[int, int]]) -> float:
    """Fraction of row groups whose stats overlap the box — what a
    stats-based reader must actually read."""
    total = hit = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in box.items():
                s = md.row_group(rg).column(names.index(col)).statistics
                if s is not None and (s.max < lo or s.min > hi):
                    ok = False
                    break
            if ok:
                hit += 1
    return hit / max(total, 1)


def timed_count(spark, path: str, box: dict[str, tuple[int, int]], runs: int = 3):
    walls = []
    n = None
    for _ in range(runs):
        df = spark.read.parquet(path)
        for col, (lo, hi) in box.items():
            df = df.filter(F.col(col).between(lo, hi))
        t0 = time.perf_counter()
        n = df.count()
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls), n


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark("zorder-bench", master="local[32]", shuffle_partitions=32)
    shutil.rmtree(OUT, ignore_errors=True)

    base = build(spark, n_rows)
    per_file = max(n_rows // 64, 1)
    layouts = {
        "natural": base,
        "sorted_x": base.orderBy("x"),
        "zorder_xy": zorder_by(base, ["x", "y"]),
        "hilbert_xy": hilbert_by(base, ["x", "y"]),
        "zorder_xyz": zorder_by(base, ["x", "y", "w"]),
    }
    for name, df in layouts.items():
        (
            df.write.mode("overwrite")
            .option("maxRecordsPerFile", per_file)
            .parquet(os.path.join(OUT, name))
        )

    # Box menu: narrow per-key slices are 5% of KEY_SPAN. y_only and
    # wide_x are the discriminating cases — a single-column x sort
    # cannot prune either (y spans everything inside every x file; a
    # 40% x slice hits 40% of files and y again prunes nothing), while
    # the Morton layout prunes both dimensions independently.
    w = KEY_SPAN // 20
    boxes = {
        "x_only": {"x": (40_000, 40_000 + w)},
        "y_only": {"y": (70_000, 70_000 + w)},
        "xy_box": {"x": (40_000, 40_000 + w), "y": (70_000, 70_000 + w)},
        "wide_x_narrow_y": {"x": (20_000, 60_000), "y": (70_000, 70_000 + w)},
    }

    result: dict = {"n_rows": n_rows, "layouts": {}}
    for name in layouts:
        path = os.path.join(OUT, name)
        entry: dict = {}
        for box_name, box in boxes.items():
            wall, n = timed_count(spark, path, box)
            entry[box_name] = {
                "wall_sec": round(wall, 4),
                "rows": n,
                "rowgroup_overlap": round(overlap_fraction(path, box), 4),
            }
        result["layouts"][name] = entry

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
