"""Heavy hitters (frequent items) — exact form and the Misra-Gries
two-phase scale path.

The exact form is one groupBy: correct, and fine whenever the DISTINCT
key count fits a shuffle. The 100 TB failure mode is key explosion —
counting URLs/domains/shingles where distinct keys number in the
billions means the full groupBy shuffles every distinct key only to
throw almost all of them away at the threshold filter.

The classic fix is per-partition **Misra-Gries** sketches: each task
keeps at most k counters; any item with global frequency ≥ N/(k+1) is
guaranteed to survive in at least one partition's sketch (averaging
argument), so the union of per-partition candidates is a SUPERSET of
the true heavy hitters. An exact recount restricted to that small
candidate set (broadcast semi-join) then removes false positives —
the final answer is exactly the exact form's, but the wide shuffle
carries only candidate-key rows and the grouping cardinality is
bounded by |candidates| ≤ partitions × (k+1), not by global distinct
keys.

Implementation notes: the sketch runs in ``mapInPandas`` with
vectorized per-batch ``value_counts`` folded into the counter dict via
the mergeable-summaries rule (add weighted counts; when over capacity,
subtract the (k+1)-th largest counter and drop non-positives — Agarwal
et al., "Mergeable Summaries", PODS'12). Python work per Arrow batch is
O(distinct-in-batch + k log k), not per-row.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_heavy_hitters(df: DataFrame, col: str, min_frac: float) -> DataFrame:
    """Keys of ``col`` with frequency ≥ ``min_frac`` of all rows.
    Output: (col, n_key, n_total, freq). One full groupBy — the
    correctness anchor and the small-cardinality fast path."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("n_key"))
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n_key") >= F.lit(min_frac) * F.col("n_total"))
        .select(
            col,
            "n_key",
            "n_total",
            (F.col("n_key") / F.col("n_total")).alias("freq"),
        )
    )


def mg_candidates(df: DataFrame, col: str, min_frac: float) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (superset of every key
    with global frequency ≥ min_frac). Small by construction:
    ≤ (k+1) keys per partition, k = ⌈1/min_frac⌉."""
    k = max(8, math.ceil(1.0 / min_frac))
    field = df.schema[col]

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                d = vals[k]  # (k+1)-th largest
                counters = {key: c - d for key, c in counters.items() if c > d}
        yield pd.DataFrame({col: pd.Series(list(counters), dtype=object)})

    from pyspark.sql.types import StructType

    return df.select(col).mapInPandas(sketch, StructType([field])).distinct()


def heavy_hitters_mg(df: DataFrame, col: str, min_frac: float) -> DataFrame:
    """Two-phase heavy hitters: MG candidates → exact recount of only
    the candidate keys → threshold filter. Output identical to
    ``exact_heavy_hitters`` (asserted in tests/test_heavy_hitters.py);
    shuffle carries only candidate-key rows."""
    candidates = mg_candidates(df, col, min_frac)
    counts = (
        df.join(F.broadcast(candidates), on=col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_key"))
    )
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n_key") >= F.lit(min_frac) * F.col("n_total"))
        .select(
            col,
            "n_key",
            "n_total",
            (F.col("n_key") / F.col("n_total")).alias("freq"),
        )
    )
