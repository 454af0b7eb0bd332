"""Data-quality assertion operator — fail-fast (or tolerate-and-count)
expectations over a DataFrame, the ETL guardrail pattern.

``expect`` evaluates all expectations in ONE pass (a single aggregate
job counting violations per rule — never one job per rule) and raises
``DataQualityError`` listing every failed rule with its violation
count. At 100 TB the cost is one scan; attach it after loads and before
sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DataQualityError(AssertionError):
    def __init__(self, failures: dict[str, int], total_rows: int):
        self.failures = failures
        self.total_rows = total_rows
        detail = ", ".join(f"{name}: {n} violations" for name, n in failures.items())
        super().__init__(f"data quality check failed over {total_rows} rows — {detail}")


def expect(
    df: DataFrame,
    expectations: dict[str, Column],
    max_violations: int = 0,
) -> DataFrame:
    """Assert boolean ``expectations`` hold for (almost) every row.

    ``expectations``: {rule_name: boolean Column that should be true}.
    Rules violated on more than ``max_violations`` rows raise
    ``DataQualityError``. Returns ``df`` unchanged on success so it
    chains inside pipelines.
    """
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.count_if(~cond | cond.isNull()).alias(name)
        for name, cond in expectations.items()
    ]
    row = df.agg(*aggs).collect()[0]
    failures = {
        name: row[name] for name in expectations if row[name] > max_violations
    }
    if failures:
        raise DataQualityError(failures, row["__total"])
    return df


def observe_quality(
    df: DataFrame,
    expectations: dict[str, Column],
    name: str = "quality",
):
    """Attach violation counters to the query plan itself via
    ``df.observe`` — metrics are computed as a side effect of whatever
    action runs downstream (the sink write, a collect), costing ZERO
    extra scans. ``expect`` by contrast runs its own aggregate job; at
    100 TB that second pass is the difference between free QC and
    doubling the pipeline's read volume.

    Returns ``(observed_df, observation)``; run the action on
    ``observed_df``, then call :func:`assert_observed`.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.count_if(~cond | cond.isNull()).alias(rule)
        for rule, cond in expectations.items()
    ]
    return df.observe(obs, *aggs), obs


def assert_observed(observation, max_violations: int = 0) -> dict:
    """Check an :func:`observe_quality` observation after its action ran.
    Raises :class:`DataQualityError` like ``expect``; returns the raw
    metrics dict (including ``__total``) on success."""
    got = observation.get  # blocks until the observed action finishes
    failures = {
        rule: n
        for rule, n in got.items()
        if rule != "__total" and n > max_violations
    }
    if failures:
        raise DataQualityError(failures, got["__total"])
    return got
