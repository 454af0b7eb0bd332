"""Gap-based sessionization (batch form).

Algorithm (SURVEY.md §2.E sessionize_batch): per user, order events by
time; a row starts a new session when the gap to the previous event
exceeds the threshold; the running sum of start-flags is the session id.

Precision note: gaps are computed in *microseconds* (``unix_micros``),
never via ``ts.cast("long")`` — the long cast truncates to whole seconds,
which silently mis-classifies gaps within one second of the threshold
(e.g. a 1800.7 s gap reads as 1800 and fails a ``> 1800`` test).

Scale: exactly one shuffle+sort on the user key; state never exceeds a
partition. The streaming twin is ``F.session_window`` + watermark
(noaa_etl_spark/streaming/sessions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-user ``session_col`` (1-based, increasing in time).

    ``tiebreak_col`` makes ordering total when timestamps can tie — pass
    a unique id column for deterministic output (graded queries must).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)

    ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_seconds * 1_000_000), 1
    ).otherwise(0)

    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__new_session", new_session).withColumn(
        session_col, F.sum("__new_session").over(w_run)
    ).drop("__new_session")


def sessionize_bucketed(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Scale form of :func:`sessionize` for SKEWED users: identical
    output, different shuffle layout.

    The plain form's window sorts ALL of a user's events in one task —
    a celebrity user at 100 TB becomes a straggler (the one scale risk
    SCALING.md flags for sessionize). This form:

    1. locally sessionizes per ``(user, day-bucket)`` — the heavy
       shuffle+sort key now spreads each hot user across their active
       days (hot-key fan-out bounded by the date range);
    2. stitches at bucket boundaries with a window over SESSION
       summaries — input is |sessions| ≪ |events| rows, so the per-user
       sort that remains is compressed by the events-per-session factor;
    3. maps the stitched global ids back onto events with an equi-join
       on the local session key (the mapping side is tiny: one row per
       local session — broadcastable).

    Correct for any ``gap_seconds`` < 1 day (a session pausing over a
    boundary merges in step 2 no matter how many empty buckets it
    spans). NULL keys match the plain form too: the map-back join is
    null-safe on (user, bucket), so NULL ``user_col`` rows (a valid
    window partition in the plain form) and NULL ``ts_col`` rows (each
    its own session under the plain form's lag-isNull rule — mirrored
    here by the ``__start_us IS NULL`` stitch term) are kept, never
    silently dropped. Equivalence with the plain form — including NULL
    users, NULL timestamps and multi-midnight sessions — is asserted in
    tests/test_scale.py.
    """
    assert gap_seconds < 86_400, "bucket (1 day) must exceed the gap"
    bucket = F.to_date(F.col(ts_col)).alias("__bucket")
    ev = df.withColumn("__bucket", bucket)

    # 1. local sessionize within (user, bucket)
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w_local = Window.partitionBy(user_col, "__bucket").orderBy(*order)
    ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w_local)
    new_local = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    ev = ev.withColumn(
        "__local_sid",
        F.sum(new_local).over(
            w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    # 2. session summaries + cross-bucket stitch (rows = local sessions)
    first_key = (
        F.min(F.struct(F.col(ts_col), F.col(tiebreak_col))).alias("__first")
        if tiebreak_col
        else F.min(F.struct(F.col(ts_col), F.col(ts_col))).alias("__first")
    )
    summaries = ev.groupBy(user_col, "__bucket", "__local_sid").agg(
        F.min(ts_us).alias("__start_us"),
        F.max(ts_us).alias("__last_us"),
        first_key,
    )
    w_user = Window.partitionBy(user_col).orderBy(F.col("__start_us").asc(), F.col("__first").asc())
    prev_last = F.lag("__last_us").over(w_user)
    # __start_us IS NULL ⇒ a NULL-ts singleton session (the plain form's
    # lag over a NULL ts is NULL ⇒ isNull fires ⇒ new session per row);
    # without this term consecutive NULL-start summaries would merge.
    new_global = F.when(
        prev_last.isNull()
        | F.col("__start_us").isNull()
        | ((F.col("__start_us") - prev_last) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    mapping = summaries.withColumn(
        session_col,
        F.sum(new_global).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select(
        F.col(user_col).alias("__m_user"),
        F.col("__bucket").alias("__m_bucket"),
        F.col("__local_sid").alias("__m_sid"),
        session_col,
    )

    # 3. map back to events (mapping side is one row per local session).
    # Null-safe keys: plain equality would drop NULL-user / NULL-bucket
    # rows that the plain form keeps (EqualNullSafe is still a hash-join
    # key, so the join stays broadcastable).
    cond = (
        F.col(user_col).eqNullSafe(F.col("__m_user"))
        & F.col("__bucket").eqNullSafe(F.col("__m_bucket"))
        & (F.col("__local_sid") == F.col("__m_sid"))
    )
    return (
        ev.join(mapping, cond)
        .drop("__m_user", "__m_bucket", "__m_sid", "__bucket", "__local_sid")
    )


def sessionize_auto(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
    session_col: str = "session_id",
    skew_threshold: int = 5_000_000,
) -> DataFrame:
    """Skew-adaptive sessionize: pick the plain or the bucketed form
    from the DATA — the codified SCALING.md switch rule. The round-10
    probe settled that the bucketed twin is the SKEW gear, not the size
    gear (~3× slower at every uniform scale), so the dispatch key is
    max events-per-user (one combinable agg + a 1-row collect, the
    q_skew_diagnose statistic), never the table size: a single user
    above ``skew_threshold`` events would make the plain form's
    per-user window sort a straggler task, so only then does the
    bucketed form's extra stitch pass pay for itself.

    The default threshold is sized from the measured crossover
    (SCALING.md round-3 skew bench: bucketed wins ~3× at 8M events on
    one user; both forms are within noise near ~1M) with a safety
    margin under it. Output is identical either way — the bucketed
    form's equivalence (incl. NULL users/ts, multi-midnight sessions)
    is pinned in tests/test_scale.py, so the dispatch can never change
    results, only the shuffle layout.
    """
    hottest = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(user_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    fn = sessionize_bucketed if (hottest or 0) >= skew_threshold else sessionize
    return fn(
        df,
        user_col=user_col,
        ts_col=ts_col,
        gap_seconds=gap_seconds,
        tiebreak_col=tiebreak_col,
        session_col=session_col,
    )
