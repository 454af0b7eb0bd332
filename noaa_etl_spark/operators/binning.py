"""Approximate quantile binning — the scale form of q_quality_bins.

Exact ``ntile(n)`` needs a total order: one range shuffle plus a global
rank, with a single skew point if the score distribution is tight. At
100 TB the standard trade is: estimate the n-quantile *cutpoints* once
(``approxQuantile`` — a Greenwald-Khanna sketch folded in a single
aggregate, error bound ``rel_err``), broadcast the ≤ n-1 doubles, and
assign bins with a scan-local comparison chain. Bin populations are
then equal only to within the sketch error, but the bin column costs
zero shuffles and composes with any downstream per-bin sampling gate
(queries/sampling.py) in the same scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_bin_column(
    df: DataFrame, score_col: str, n_bins: int = 10, rel_err: float = 0.001
) -> Column:
    """A Column assigning each row a 1-based bin by approximate
    ``n_bins``-quantile cutpoints of ``score_col``. Two Spark actions:
    the sketch aggregate (driver receives n_bins-1 doubles), then the
    caller's plan with a pure scan-local projection."""
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.stat.approxQuantile(score_col, probs, rel_err)
    score = F.col(score_col)
    # bin = 1 + #cutpoints strictly below the score (ties land low,
    # matching ntile's fill direction closely enough for rate tables)
    return reduce(
        lambda acc, c: acc + (score > F.lit(c)).cast("int"),
        cuts,
        F.lit(1),
    ).alias("bin")


def with_approx_bins(
    df: DataFrame, score_col: str, n_bins: int = 10, rel_err: float = 0.001
) -> DataFrame:
    return df.withColumn("bin", approx_bin_column(df, score_col, n_bins, rel_err))
