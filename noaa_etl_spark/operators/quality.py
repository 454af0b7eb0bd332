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
