"""Central registry wiring operators to the driver's graded contract.

Every graded operator lands as a triple (SURVEY.md §3.1):

    @graded("q_name", oracle="SELECT ... AS same_alias ...")
    def q_name(spark, sf_dir) -> DataFrame: ...

- The callable goes into ``queries()`` in ``__spark_entry__.py``.
- The oracle SQL (DuckDB dialect, run over the same parquet views) goes
  into ``oracle_sql()``. ``oracle=None`` ⇒ rows-only check (for ops that
  are genuinely not SQL-expressible: LSH, iterative algorithms).

Column names are part of the graded contract: the driver sorts columns by
name before value-hashing, so every computed column is aliased identically
in both the Spark code and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def graded(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all_queries() -> None:
    """Import every query module so registration side effects run."""
    # Imports are deferred so `import noaa_etl_spark` stays cheap.
    from noaa_etl_spark.queries import (  # noqa: F401
        relational,
        windows,
        temporal,
        text,
        similarity,
        sources,
        scalars,
        udfs,
        streaming,
        multimodal,
        noaa,
        scale,
        etl,
        subqueries,
        tpch,
    )
