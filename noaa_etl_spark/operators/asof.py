"""As-of (point-in-time) join as a DataFrame composition.

Spark has no native ASOF JOIN (DuckDB does — that's the oracle). The
scalable composition (SURVEY.md §2.C as_of): union probe and build rows
tagged by side, sort within each key partition by (ts, side), and carry
the latest build payload forward with ``last(..., ignorenulls=True)``
over a growing frame; finally keep only probe rows. The payload is
carried as ONE struct per row (not one last() per column), so the
emitted columns always come from the same build row even when some
payload fields are NULL.

Variants:

- direction="backward" (default): greatest build ts ≤ probe ts
  (strict=True: < probe ts) — "latest calibration before the obs".
- direction="forward": smallest build ts ≥ probe ts (strict=True: >) —
  "next event after"; implemented by reversing the sort order, same
  single-shuffle cost.
- tolerance_seconds: nulls the payload when the matched build row is
  further than the tolerance from the probe time (requires the build
  timestamp column to be part of ``build_payload``).

Why this shape at 100 TB: it costs exactly one shuffle+sort of
(probe ∪ build) on the join key — the same cost as a sort-merge join —
and never materializes the (probe × candidate) pairs a naive range join
would. Skewed keys are handled by AQE skew-split since this is a plain
window over a hash-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    probe_keys: list[str],
    build_keys: list[str],
    probe_ts: str,
    build_ts: str,
    build_payload: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each probe row, attach the build payload of the nearest build
    row in ``direction`` (backward: ts ≤ probe, forward: ts ≥ probe;
    ``strict`` excludes exact-equal timestamps). Probe rows with no
    match keep null payload (left as-of).

    ``build_payload`` columns must not collide with probe column names.
    ``tiebreak`` orders equal-timestamp build rows (nearest-sorted last
    one wins). ``tolerance_seconds`` requires ``build_ts`` (or an alias
    of it) in ``build_payload`` to measure the match distance.

    The payload travels as ONE struct, carried by a single
    last(ignorenulls) per probe row — so the emitted columns always
    come from the SAME build row (merge_asof semantics). Carrying each
    column independently would silently back-fill a NULL field of the
    nearest build row from an older row, mixing rows in the output.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    probe_cols = probe.columns
    payload_types = {f.name: f.dataType for f in build.schema.fields}

    # SQL ASOF semantics: a NULL join key or NULL timestamp on the build
    # side can never match any probe row (`p.k = b.k` / `p.ts >= b.ts`
    # are NULL-rejecting). Spark's window partitionBy groups NULL keys
    # into ONE partition, so without this filter a NULL-key build row
    # would serve NULL-key probe rows — diverging from the DuckDB ASOF
    # oracle. Probe rows with NULL key/ts are RETAINED (left as-of) and
    # get NULL payload: NULL-key probes partition alone once build NULLs
    # are dropped, and NULL-ts probes sort before every build row (see
    # the nulls_first ordering below).
    build_not_null = F.col(build_ts).isNotNull()
    for k in build_keys:
        build_not_null = build_not_null & F.col(k).isNotNull()
    build = build.filter(build_not_null)

    # Side ordering at equal timestamps: inclusive → build sorts before
    # probe (visible to the growing frame); strict → probe first (build
    # rows at the identical ts are not yet visible).
    build_side_tag, probe_side_tag = (0, 1) if not strict else (1, 0)

    # The whole payload rides in ONE struct: a build row's struct is
    # non-NULL even when every payload field is NULL, so one
    # last(__pl, ignorenulls=True) carries the entire nearest row —
    # never a column-mixed composite of several build rows.
    pl_type = StructType(
        [StructField(c, payload_types[c]) for c in build_payload]
    )
    build_side = build.select(
        *[F.col(bk).alias(pk) for bk, pk in zip(build_keys, probe_keys)],
        F.col(build_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in build_payload]).alias("__pl"),
        F.lit(build_side_tag).alias("__side"),
        F.lit(0).alias("__is_probe"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_cols if c not in probe_keys],
    )
    probe_side = probe.select(
        *probe_cols,
        F.col(probe_ts).alias("__ts"),
        F.lit(None).cast(pl_type).alias("__pl"),
        F.lit(probe_side_tag).alias("__side"),
        F.lit(1).alias("__is_probe"),
    )

    unioned = probe_side.unionByName(build_side)
    # nulls_first in BOTH directions: NULL-ts probe rows must sort before
    # every (non-NULL-ts, filtered-above) build row so last(ignorenulls)
    # has seen no payload yet → NULL payload, matching SQL's NULL-rejecting
    # range predicate. Spark's desc() default is nulls_LAST, which would
    # hand NULL-ts probes the final carried payload — wrong.
    ts_order = (
        F.col("__ts").asc_nulls_first()
        if direction == "backward"
        else F.col("__ts").desc_nulls_first()
    )
    order = [ts_order, F.col("__side").asc()]
    if tiebreak is not None:
        # Nearest-sorted-last wins under last(): ascending puts the max
        # tiebreak nearest for backward; flip for forward so the min
        # tiebreak wins there (deterministic either way). The tiebreak
        # lives inside the payload struct (NULL struct → NULL field on
        # probe rows, which __side already separates at equal ts).
        tb = F.col("__pl").getField(tiebreak)
        order.append(
            tb.asc_nulls_first()
            if direction == "backward"
            else tb.desc_nulls_first()
        )
    w = (
        Window.partitionBy(*probe_keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = unioned.select(
        *probe_cols,
        "__ts",
        "__is_probe",
        F.last("__pl", ignorenulls=True).over(w).alias("__pl"),
    )
    result = carried.filter(F.col("__is_probe") == 1)

    if tolerance_seconds is not None:
        if build_ts not in build_payload:
            raise ValueError("tolerance requires build_ts in build_payload")
        dist = F.abs(
            F.unix_micros(F.col("__ts"))
            - F.unix_micros(F.col("__pl").getField(build_ts))
        ) / 1_000_000.0
        within = dist <= F.lit(float(tolerance_seconds))
        result = result.withColumn(
            "__pl", F.when(within, F.col("__pl"))
        )

    return result.select(
        *probe_cols,
        *[F.col("__pl").getField(c).alias(c) for c in build_payload],
    )


def asof_join_nearest(
    probe: DataFrame,
    build: DataFrame,
    probe_keys: list[str],
    build_keys: list[str],
    probe_ts: str,
    build_ts: str,
    build_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """NEAREST-match as-of: for each probe row, the build row minimizing
    |build_ts − probe_ts| (sensor alignment, nearest-quote joins —
    pandas merge_asof direction='nearest'). Exact-distance ties go
    BACKWARD; equal-timestamp ties within a direction follow
    ``tiebreak`` (backward: max wins; forward: min — both match
    :func:`asof_join`'s carry semantics so each direction alone equals
    the corresponding one-sided join).

    Cost: the same ONE hash exchange on the key as asof_join — both
    directions' carries are windows over the identical partitioning
    (two in-partition sorts, zero extra shuffles), never a probe×build
    pair blow-up. NULL contract matches asof_join: NULL-key/ts build
    rows can serve no probe; NULL-key/ts probe rows are retained with
    NULL payload. Timestamp columns must be TIMESTAMP (distances are
    measured in unix micros).
    """
    probe_cols = probe.columns
    payload_types = {f.name: f.dataType for f in build.schema.fields}

    build_not_null = F.col(build_ts).isNotNull()
    for k in build_keys:
        build_not_null = build_not_null & F.col(k).isNotNull()
    build = build.filter(build_not_null)

    # One struct per build row: __bts (the build timestamp, non-NULL
    # after the filter above — so the struct marks "a build row was
    # seen" even when every payload field is NULL) + the payload. A
    # single last(__pl, ignorenulls=True) per direction then carries
    # the whole nearest row together — never a column-mixed composite
    # where a NULL payload field back-fills from an older build row.
    pl_type = StructType(
        [StructField("__bts", payload_types[build_ts])]
        + [StructField(c, payload_types[c]) for c in build_payload]
    )
    build_side = build.select(
        *[F.col(bk).alias(pk) for bk, pk in zip(build_keys, probe_keys)],
        F.col(build_ts).alias("__ts"),
        F.struct(
            F.col(build_ts).alias("__bts"),
            *[F.col(c) for c in build_payload],
        ).alias("__pl"),
        F.lit(0).alias("__side"),  # inclusive: build visible at equal ts
        F.lit(0).alias("__is_probe"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_cols if c not in probe_keys],
    )
    probe_side = probe.select(
        *probe_cols,
        F.col(probe_ts).alias("__ts"),
        F.lit(None).cast(pl_type).alias("__pl"),
        F.lit(1).alias("__side"),
        F.lit(1).alias("__is_probe"),
    )
    unioned = probe_side.unionByName(build_side)

    def carry_window(direction: str) -> Window:
        ts_order = (
            F.col("__ts").asc_nulls_first()
            if direction == "backward"
            else F.col("__ts").desc_nulls_first()
        )
        order = [ts_order, F.col("__side").asc()]
        if tiebreak is not None:
            tb = F.col("__pl").getField(tiebreak)
            order.append(
                tb.asc_nulls_first()
                if direction == "backward"
                else tb.desc_nulls_first()
            )
        return (
            Window.partitionBy(*probe_keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    wb, wf = carry_window("backward"), carry_window("forward")
    carried = unioned.select(
        *probe_cols,
        "__ts",
        "__is_probe",
        F.last("__pl", ignorenulls=True).over(wb).alias("__pl_bk"),
        F.last("__pl", ignorenulls=True).over(wf).alias("__pl_fw"),
    ).filter(F.col("__is_probe") == 1)

    bts_bk = F.col("__pl_bk").getField("__bts")
    bts_fw = F.col("__pl_fw").getField("__bts")
    d_bk = F.unix_micros(F.col("__ts")) - F.unix_micros(bts_bk)
    d_fw = F.unix_micros(bts_fw) - F.unix_micros(F.col("__ts"))
    pick_bk = bts_bk.isNotNull() & (bts_fw.isNull() | (d_bk <= d_fw))
    return carried.select(
        *probe_cols,
        *[
            F.when(pick_bk, F.col("__pl_bk").getField(c))
            .otherwise(F.col("__pl_fw").getField(c))
            .alias(c)
            for c in build_payload
        ],
    )
