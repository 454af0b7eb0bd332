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
