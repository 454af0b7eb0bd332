"""Count-min sketch as plain DataFrame aggregation.

The CMS grid (depth d × width w counters) is just a keyed count table:
cell (i, h_i(x) mod w) accumulates every occurrence of x under hash row
i. Everything CMS needs is therefore native Spark:

- BUILD: explode each row into its d (row, bucket) coordinates and
  count — map-side combine collapses a partition to ≤ d·w partial
  cells before the shuffle, so shuffle bytes are O(d·w·partitions),
  independent of data volume.
- MERGE: grids are additive — groupBy(d, bucket).sum. Per-day grids
  persisted next to the data answer range frequency queries without
  rescanning history (same publishing pattern as the per-day HLL
  sketches in q_hll_sketch_union).
- POINT QUERY: est(x) = min_i cell[i][h_i(x)] — a join from the probe
  keys to the tiny grid (broadcast: the grid is d·w rows ≈ KBs).

Guarantees (Cormode & Muthukrishnan): est ≥ true always (counters only
over-count under collisions), and est ≤ true + (e/w)·N with probability
≥ 1 − e^−d per key, N = total occurrences. Hash rows use xxhash64
seeded by the row index — deterministic across sessions, executors and
reruns, so a persisted grid remains queryable forever.

vs operators/heavy_hitters.py (Misra-Gries): MG answers "which keys are
frequent" with exact recount; CMS answers point-frequency for ANY key —
including keys unseen at build time — from a fixed-size mergeable
summary. They are the two halves of the classic frequency-sketch kit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

E = 2.718281828459045


def _coords(col: Column, depth: int, width: int) -> Column:
    """Array of (d, bucket) structs for one value — the d grid cells it
    lands in. xxhash64(seed_row, value) keeps rows pairwise independent
    enough in practice while staying 100% JVM codegen."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("d"),
                F.pmod(F.xxhash64(F.lit(i), col), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024, group_cols: tuple = ()
) -> DataFrame:
    """Build the CMS grid (group_cols…, d, bucket, cnt) over non-null
    values of `col`. With group_cols (e.g. a day column) one grid per
    group is produced — merge with `cms_merge` for any group range."""
    src = df.filter(F.col(col).isNotNull())
    exploded = src.select(
        *group_cols, F.explode(_coords(F.col(col), depth, width)).alias("h")
    ).select(*group_cols, "h.d", "h.bucket")
    return exploded.groupBy(*group_cols, "d", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(cells: DataFrame) -> DataFrame:
    """Fold per-group grids into one grid: cells are additive."""
    return cells.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_total(cells: DataFrame) -> DataFrame:
    """One row (n_total): N recovered exactly from any single hash row
    of the grid — no second scan of the source data."""
    return cells.filter(F.col("d") == 0).agg(F.sum("cnt").alias("n_total"))


def cms_estimate(
    cells: DataFrame, keys: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-frequency estimates for each distinct key in `keys[col]`:
    est = min over hash rows of the key's cell count (0 if the cell is
    absent — an absent cell means nothing ever hashed there).

    The grid side is broadcast: d·w rows regardless of data volume."""
    probes = (
        keys.select(col).distinct()
        .filter(F.col(col).isNotNull())
        .select(col, F.explode(_coords(F.col(col), depth, width)).alias("h"))
        .select(col, "h.d", "h.bucket")
    )
    joined = probes.join(F.broadcast(cells), ["d", "bucket"], "left").select(
        col, F.coalesce("cnt", F.lit(0)).alias("cell_cnt")
    )
    return joined.groupBy(col).agg(F.min("cell_cnt").alias("est"))
