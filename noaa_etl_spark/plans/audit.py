"""Physical-plan audit helpers.

``formatted_plan`` captures ``df.explain("formatted")`` (the only
explain mode that does not truncate PushedFilters / ReadSchema lists);
the predicate helpers encode the plan properties the engine's scale
posture depends on, so tests and ad-hoc audits share one vocabulary:

    from noaa_etl_spark.plans import assert_plan
    assert_plan(df, requires=["BroadcastHashJoin", "TakeOrderedAndProject"],
                    forbids=["CartesianProduct"])
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The full formatted physical plan as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_plan(
    df: DataFrame,
    requires: list[str] | None = None,
    forbids: list[str] | None = None,
) -> str:
    """Assert plan-node substrings present/absent; returns the plan so
    callers can chain further checks. Raises AssertionError with the
    full plan attached — the failure message IS the explain output."""
    plan = formatted_plan(df)
    for token in requires or []:
        assert token in plan, f"plan missing required node {token!r}:\n{plan}"
    for token in forbids or []:
        assert token not in plan, f"plan contains forbidden node {token!r}:\n{plan}"
    return plan


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_pushed_filters(df: DataFrame) -> bool:
    """True when at least one non-trivial filter reached a file scan."""
    plan = formatted_plan(df)
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """All ReadSchema struct bodies in the plan — audit column pruning."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange nodes — the scale-limiting resource."""
    return formatted_plan(df).count("Exchange")


def executed_exchange_counts(df: DataFrame) -> tuple[int, int]:
    """(exchanges, reused_exchanges) in the AQE-final executed plan.

    Triggers execution (collect) — AQE only finalizes the plan after the
    last stage runs. ``\\bExchange\\b`` does not match ReusedExchange
    (no word boundary after 'Reused'), so the two counts are disjoint.
    """
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = len(re.findall(r"\bExchange\b", plan))
    reused = len(re.findall(r"ReusedExchange", plan))
    return exchanges, reused
