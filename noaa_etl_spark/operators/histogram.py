"""Mergeable fixed-bin histogram sketch → bounded-error quantiles.

The third member of the persisted-sketch kit (HLL → distincts, CMS →
point frequencies, histogram → quantiles): per-group equi-width bin
counts over a FIXED global [lo, hi] domain. Fixed edges are what make
grids additive — per-day histograms sum cell-wise into any range's
histogram without rescanning history (same publishing pattern as
q_hll_sketch_union's per-day sketches).

Quantile estimate: the right edge of the bin holding the rank-⌈q·N⌉
value. Guarantee (a theorem, not a tail bound): if x_r is the exact
discrete q-quantile, then x_r ≤ est ≤ x_r + w with w the bin width —
rank-exact, value-error bounded by one bin. Tighten by adding bins:
error halves per doubling, counters stay 8 bytes.

Everything is expression-level DataFrame ops: bin assignment is scan-
local arithmetic (map-side-combinable count), quantile extraction is a
cumulative-sum window over the |groups|·|bins| cell table — never the
data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bin_expr(col, lo: float, hi: float, n_bins: int):
    """Bin index for a value: floor((x − lo) / w), clamped into
    [0, n_bins−1] so domain-edge values (x == hi) and minor drift
    outside the declared domain still land in a counter."""
    w = (hi - lo) / n_bins
    raw = F.floor((col - F.lit(lo)) / F.lit(w)).cast("int")
    return F.greatest(F.least(raw, F.lit(n_bins - 1)), F.lit(0))


def hist_build(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """(group…, bin, cnt) over non-null values — the sketch table."""
    src = df.filter(F.col(col).isNotNull())
    return (
        src.select(*group_cols, bin_expr(F.col(col), lo, hi, n_bins).alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(hists: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Fold finer-grained grids (e.g. per-day) into coarser groups:
    cells are additive."""
    return hists.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame,
    qs: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int = 64,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group quantile estimates from the sketch alone: for each q,
    est = right edge of the first bin whose cumulative count reaches
    rank ⌈q·N⌉. Returns (group…, q, est).

    Runs entirely on the cell table (|groups|·|bins| rows): one window
    cumsum ordered by bin, a tiny cross join with the q list, one min-
    aggregate. The data itself is never touched."""
    w = (hi - lo) / n_bins
    spark = hist.sparkSession
    gcols = list(group_cols)
    win = Window.partitionBy(*gcols).orderBy("bin") if gcols else Window.orderBy("bin")
    tot = (
        Window.partitionBy(*gcols)
        if gcols
        else Window.partitionBy(F.lit(1))
    )
    cum = hist.select(
        *gcols,
        "bin",
        F.sum("cnt").over(win).alias("cum"),
        F.sum("cnt").over(tot).alias("n_total"),
    )
    q_df = spark.createDataFrame([(float(q),) for q in qs], "q double")
    rank = F.ceil(F.col("q") * F.col("n_total"))
    return (
        cum.crossJoin(F.broadcast(q_df))
        .filter(F.col("cum") >= rank)
        .groupBy(*gcols, "q")
        .agg(F.min(F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("est"))
    )


def approx_mad(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Sketch-based median + MAD per group — the documented 100 TB swap
    for q_anomaly_mad's exact windowed percentiles: two histogram
    passes (values, then absolute deviations from the estimated
    median) instead of materializing each partition's values on a
    reducer. Returns (group…, med_est, mad_est).

    Error bounds compose from the one-bin theorem: med_est is within
    one value-bin width w of the exact median, so each |x − med_est|
    deviates from |x − med| by ≤ w, and the deviation histogram (bin
    width w_d over [0, hi−lo]) puts mad_est within w + w_d of the
    exact MAD — tested in tests/test_algorithms.py. Both passes are
    map-side-combined cell tables; the second pass's per-row subtract
    is scan-local arithmetic against the broadcast median frame.
    """
    gcols = list(group_cols)
    med = hist_quantiles(
        hist_build(df, col, lo, hi, n_bins, gcols), [0.5], lo, hi, n_bins, gcols
    ).select(*gcols, F.col("est").alias("med_est"))
    dev = (
        df.join(F.broadcast(med), gcols)
        if gcols
        else df.crossJoin(F.broadcast(med))
    ).withColumn("_absdev", F.abs(F.col(col) - F.col("med_est")))
    span = hi - lo
    mad = hist_quantiles(
        hist_build(dev, "_absdev", 0.0, span, n_bins, gcols),
        [0.5],
        0.0,
        span,
        n_bins,
        gcols,
    ).select(*gcols, F.col("est").alias("mad_est"))
    return med.join(mad, gcols) if gcols else med.crossJoin(mad)
