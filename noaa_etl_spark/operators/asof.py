"""As-of (point-in-time) join as a DataFrame composition.

Spark has no native ASOF JOIN (DuckDB does — that's the oracle). The
scalable composition (SURVEY.md §2.C as_of): union probe and build rows
tagged by side, sort within each key partition by (ts, side), and carry
the latest build payload forward with ``last(..., ignorenulls=True)``
over a growing frame; finally keep only probe rows.

Why this shape at 100 TB: it costs exactly one shuffle+sort of
(probe ∪ build) on the join key — the same cost as a sort-merge join —
and never materializes the (probe × candidate) pairs a naive range join
would. Skewed keys are handled by AQE skew-split since this is a plain
window over a hash-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    probe_keys: list[str],
    build_keys: list[str],
    probe_ts: str,
    build_ts: str,
    build_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each probe row, attach the build payload with the greatest
    ``build_ts`` ≤ ``probe_ts`` within the same key (backward as-of,
    inclusive). Probe rows with no match keep null payload (left as-of).

    ``build_payload`` columns must not collide with probe column names.
    ``tiebreak`` orders equal-timestamp build rows (last one wins).
    """
    probe_cols = probe.columns
    payload_types = {f.name: f.dataType for f in build.schema.fields}

    build_side = build.select(
        *[F.col(bk).alias(pk) for bk, pk in zip(build_keys, probe_keys)],
        F.col(build_ts).alias("__ts"),
        *[F.col(c) for c in build_payload],
        F.lit(0).alias("__side"),  # build rows sort before probe rows at equal ts
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_cols if c not in probe_keys],
    )
    probe_side = probe.select(
        *probe_cols,
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(payload_types[c]).alias(c) for c in build_payload],
    )

    unioned = probe_side.unionByName(build_side)
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(*probe_keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = unioned.select(
        *probe_cols,
        "__side",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in build_payload],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
