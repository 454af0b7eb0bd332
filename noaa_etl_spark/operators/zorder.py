"""Z-order (Morton) clustering for multi-dimensional data-skipping.

Parquet scans skip row groups via min/max stats; a table sorted by one
column prunes on that column only. Z-ordering interleaves the bits of
several normalized sort keys so *every* keyed column gets locality —
files/row groups cover small ranges of each dimension simultaneously,
and filters on any subset of the keys skip most of the data.

All pure Catalyst expressions (normalize → scale to b bits → bit
interleave via shift/or): no UDF, codegen-friendly, and the final
``orderBy(z)`` is an ordinary range-partitioned sort, so writing a
z-ordered table costs exactly one global sort — the same as sorting by
any single column.

This is the open-source-Spark equivalent of the OPTIMIZE ZORDER BY
layout step table formats offer; proof of effect (row-group span
shrinkage on both keys) lives in tests/test_zorder.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    cols: list[Column],
    mins: list[float],
    maxs: list[float],
    total_bits: int = 48,
) -> Column:
    """Morton code of the given columns as a bigint.

    Each column is normalized to [0, 2^b) using the provided min/max
    (b = total_bits // len(cols)), then bits are interleaved
    column-major: z bit (j*c + i) = bit j of column i.
    """
    c = len(cols)
    if c == 0:
        raise ValueError("zorder needs at least one column")
    b = total_bits // c
    z = F.lit(0).cast("long")
    for i, (col, lo, hi) in enumerate(zip(cols, mins, maxs)):
        span = float(hi) - float(lo)
        scale = ((1 << b) - 1) / span if span > 0 else 0.0
        norm = F.least(
            F.greatest(
                ((col.cast("double") - F.lit(float(lo))) * F.lit(scale)).cast("long"),
                F.lit(0).cast("long"),
            ),
            F.lit((1 << b) - 1).cast("long"),
        )
        for j in range(b):
            bit = F.shiftright(norm, j).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, j * c + i))
    return z


def zorder_by(df: DataFrame, col_names: list[str], total_bits: int = 48) -> DataFrame:
    """Return ``df`` globally sorted by the Morton code of ``col_names``.

    Column min/max are computed with one tiny aggregate job (at scale:
    pass cached stats instead, or read them from the table metadata).
    Write the result with ``maxRecordsPerFile``/row-group sizing so the
    stats granularity matches the skipping unit.
    """
    aggs = []
    for name in col_names:
        aggs += [F.min(name).alias(f"min_{name}"), F.max(name).alias(f"max_{name}")]
    stats = df.agg(*aggs).collect()[0]
    mins = [float(stats[f"min_{n}"]) for n in col_names]
    maxs = [float(stats[f"max_{n}"]) for n in col_names]
    z = zorder_value([F.col(n) for n in col_names], mins, maxs, total_bits)
    return df.orderBy(z.alias("__z"))


def hilbert_value(
    x: Column,
    y: Column,
    mins: list[float],
    maxs: list[float],
    order: int = 8,
) -> Column:
    """Hilbert index of a 2-D point as a bigint (order p ⇒ 2^p × 2^p
    grid, index in [0, 4^p)) — SINGLE-EXPRESSION form.

    Z-order's weakness is the diagonal JUMP: consecutive Morton codes
    can be grid-distant, so a file of contiguous codes covers two
    disjoint spatial patches and its min/max box inflates. Consecutive
    Hilbert indexes are always grid-NEIGHBORS (the adjacency theorem,
    tested in tests/test_round15_ops.py), so equal-size files cover
    tighter boxes — measurably fewer row groups overlap a 2-D box
    filter (tools/zorder_bench.py's hilbert_xy leg).

    ORDER CAP: the rotation carry makes each round reference the
    previous round's x/y in multiple CASE arms, so a single Column
    duplicates those subtrees — the tree grows ~4^order and the JVM
    dies past order ~9. This form is capped at order 8; ``hilbert_by``
    materializes per-round columns instead (CollapseProject keeps
    multi-referenced non-cheap aliases un-inlined) and runs at any
    order."""
    if order > 8:
        raise ValueError("hilbert_value caps at order 8; use hilbert_by")
    n = 1 << order
    cx, cy = _hilbert_norm(x, mins[0], maxs[0], n), _hilbert_norm(
        y, mins[1], maxs[1], n
    )
    d = F.lit(0).cast("long")
    for s in (1 << j for j in range(order - 1, -1, -1)):
        d_new, nx, ny = _hilbert_round(cx, cy, s, n)
        d = d + d_new
        cx, cy = nx, ny
    return d


def _hilbert_norm(col: Column, lo: float, hi: float, n: int) -> Column:
    span = float(hi) - float(lo)
    scale = (n - 1) / span if span > 0 else 0.0
    return F.least(
        F.greatest(
            ((col.cast("double") - F.lit(float(lo))) * F.lit(scale)).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit(n - 1).cast("long"),
    )


def _hilbert_round(cx: Column, cy: Column, s: int, n: int):
    """One quadrant-classify + rotate/flip round: returns (d_increment,
    next_x, next_y). (3·rx) ^ ry on {0,1} bits == 3·rx + ry − 2·rx·ry."""
    rx = F.when(cx.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
    ry = F.when(cy.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
    d_inc = F.lit(s).cast("long") * F.lit(s) * (
        F.lit(3) * rx + ry - F.lit(2) * rx * ry
    )
    nx = F.when(ry == 1, cx).otherwise(
        F.when(rx == 1, F.lit(n - 1).cast("long") - cy).otherwise(cy)
    )
    ny = F.when(ry == 1, cy).otherwise(
        F.when(rx == 1, F.lit(n - 1).cast("long") - cx).otherwise(cx)
    )
    return d_inc, nx, ny


def hilbert_by(df: DataFrame, col_names: list[str], order: int = 12) -> DataFrame:
    """Return ``df`` globally sorted by the Hilbert index of the two
    named columns — the drop-in locality-tighter alternative to
    ``zorder_by`` for the 2-D case (Hilbert generalizes past 2-D but
    the rotation tables grow; z-order stays the ≥3-key tool).

    Each round MATERIALIZES its (d, x, y) as projection columns — the
    rotation carry references the previous round's x/y in multiple
    CASE arms, and a single nested Column expression would duplicate
    those subtrees ~4^order times (a JVM-killing tree past order ~9);
    as named aliases they are non-cheap multi-referenced expressions,
    which CollapseProject deliberately refuses to inline, so the plan
    stays linear in `order`. Cost: one global range sort, identical to
    zorder_by."""
    if len(col_names) != 2:
        raise ValueError("hilbert_by handles exactly 2 columns")
    aggs = []
    for name in col_names:
        aggs += [F.min(name).alias(f"min_{name}"), F.max(name).alias(f"max_{name}")]
    stats = df.agg(*aggs).collect()[0]
    mins = [float(stats[f"min_{n}"]) for n in col_names]
    maxs = [float(stats[f"max_{n}"]) for n in col_names]
    n = 1 << order
    orig = df.columns
    cur = df.select(
        "*",
        _hilbert_norm(F.col(col_names[0]), mins[0], maxs[0], n).alias("__hx"),
        _hilbert_norm(F.col(col_names[1]), mins[1], maxs[1], n).alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    for s in (1 << j for j in range(order - 1, -1, -1)):
        d_inc, nx, ny = _hilbert_round(F.col("__hx"), F.col("__hy"), s, n)
        cur = cur.select(
            *orig,
            (F.col("__hd") + d_inc).alias("__hd"),
            nx.alias("__hx"),
            ny.alias("__hy"),
        )
    return cur.orderBy("__hd").select(*orig)
