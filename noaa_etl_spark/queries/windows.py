"""Window functions: rank family, lag/lead, frames, per-group top-k.

SURVEY.md §2.E. Scale notes: every window here partitions by a key whose
cardinality grows with the data (custkey, user_id), so the window shuffle
parallelizes; none uses a global (unpartitioned) ordering, which would
serialize onto one task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.registry import graded


@graded(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(rank()       OVER w AS INT) AS rnk,
             CAST(dense_rank() OVER w AS INT) AS drnk,
             CAST(row_number() OVER w AS INT) AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) t
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank family + per-group top-k (rank ≤ 3 per customer).

    The (price DESC, orderkey) ordering is a total order, making
    row_number deterministic. Scale: at 100 TB a two-phase mapPartitions
    heap pre-aggregation can cut the shuffle; the window form is the
    graded baseline (see operators/topk.py for the scalable variant).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@graded(
    "q_window_lag_lead",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS order_day,
             sum(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT order_day, revenue,
           revenue - lag(revenue, 1, 0.0) OVER (ORDER BY order_day) AS delta_prev,
           lead(revenue, 1) OVER (ORDER BY order_day)               AS next_revenue
    FROM daily
    ORDER BY order_day
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day delta via lag/lead.

    The unpartitioned window runs over the *daily* aggregate (bounded
    cardinality: one row per day), not the raw fact — the pre-aggregation
    is what makes a global ordering acceptable at scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    # .cast("date"): DuckDB date_trunc('day', ts) yields DATE, Spark
    # yields TIMESTAMP - align the collected Python objects.
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("order_day")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("order_day")
    return daily.select(
        "order_day",
        "revenue",
        (F.col("revenue") - F.lag("revenue", 1, 0.0).over(w)).alias("delta_prev"),
        F.lead("revenue", 1).over(w).alias("next_revenue"),
    ).orderBy("order_day")


@graded(
    "q_window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-customer spend; (date, orderkey) is a total order so
    the running sum is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 6).alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@graded(
    "q_window_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS order_day,
             sum(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT order_day, revenue,
           avg(revenue) OVER (
             ORDER BY order_day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS ma7
    FROM daily
    ORDER BY order_day
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average over the daily revenue series."""
    orders = load_table(spark, sf_dir, "orders")
    # .cast("date"): DuckDB date_trunc('day', ts) yields DATE, Spark
    # yields TIMESTAMP - align the collected Python objects.
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("order_day")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("order_day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "order_day", "revenue", F.avg("revenue").over(w).alias("ma7")
    ).orderBy("order_day")


@graded(
    "q_window_rolling_1h",
    oracle="""
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    SELECT event_id, user_id,
           avg(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS avg_1h,
           count(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS n_1h
    FROM e
    ORDER BY event_id
    """,
)
def q_window_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour physical-time window per user.

    Spark has no INTERVAL RANGE frame on timestamps; the engine orders by
    ``unix_micros`` and uses a numeric rangeBetween in microseconds —
    never ``ts.cast("long")``, which truncates to whole *seconds* and
    misclassifies rows within 1 s of the frame edge. The oracle casts
    DuckDB's nanosecond view of ts down to microseconds so both engines
    evaluate the identical frame membership.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    # No final orderBy: the output is per-event (unbounded at scale) and
    # the graded compare is order-insensitive — a global sort here added
    # a RangeExchange worth ~0.5× the query itself at sf0.1.
    return ev.select(
        "event_id",
        "user_id",
        F.avg("value").over(w).alias("avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@graded(
    "q_window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value per partition with a full frame + total order."""
    orders = load_table(spark, sf_dir, "orders")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_grow = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            F.first("o_orderkey").over(w_grow).alias("first_order"),
            F.last("o_orderkey").over(w_full).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


@graded(
    "q_record_tracking",
    oracle="""
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    SELECT event_id, user_id, value
    FROM (
      SELECT event_id, user_id, value,
             max(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max
      FROM e
    ) t
    WHERE prev_max IS NULL OR value > prev_max
    ORDER BY event_id
    """,
)
def q_record_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-record detection: events setting a new per-user all-time
    max (NOAA framing: 'is this obs a new record high for the station')."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("value").over(w)
    return (
        ev.select("event_id", "user_id", "value", prev_max.alias("prev_max"))
        .filter(F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max")))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )


@graded(
    "q_window_range_numeric",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           count(*) OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
           ) AS n_similar_price
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
)
def q_window_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric (value-based) RANGE frame: per priority class, how many
    orders fall within ±1000 of this order's price — the value-window
    complement of the time-based rolling frame."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return (
        orders.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.count(F.lit(1)).over(w).alias("n_similar_price"),
        )
        .orderBy("o_orderkey")
    )


@graded(
    "q_ntile_cume",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS balance_quartile,
           cume_dist()    OVER (ORDER BY c_acctbal, c_custkey) AS cdist,
           percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS prank
    FROM customer
    ORDER BY c_custkey
    """,
)
def q_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / cume_dist / percent_rank distribution ranks."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.cume_dist().over(w).alias("cdist"),
        F.percent_rank().over(w).alias("prank"),
    ).orderBy("c_custkey")


@graded(
    "q_anomaly_mad",
    oracle="""
    WITH s AS (
        SELECT event_id, event_type, value,
               quantile_cont(value, 0.5)
                   OVER (PARTITION BY event_type) AS med
        FROM events
    ),
    s2 AS (
        SELECT *,
               quantile_cont(abs(value - med), 0.5)
                   OVER (PARTITION BY event_type) AS mad
        FROM s
    )
    SELECT event_id, event_type, value,
           round(med, 6) AS med,
           round(mad, 6) AS mad
    FROM s2
    WHERE abs(value - med) > 5 * mad
    ORDER BY event_id
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection (median / MAD, the sensor-QC staple):
    flag events whose value deviates from the per-type median by more
    than 5× the median absolute deviation. Median+MAD resist the very
    outliers they hunt (mean/stddev get dragged by them), which is why
    QC pipelines (e.g. climate-record screening) use this exact rule.

    Plan shape: TWO stacked unbounded windows on the SAME partition key
    (median, then MAD of deviations-from-median) — one exchange total,
    no sort (unbounded frames), and crucially NO agg + join-back: the
    SCALING.md double-plan rule applied to percentiles. Exact
    percentile interpolation matches DuckDB's quantile_cont bit-for-bit
    (same linear-interpolation formula; q_percentiles establishes the
    parity).

    100 TB: one shuffle on event_type; exact windowed percentiles
    materialize each partition's values on one reducer — fine for
    bounded per-key cardinality; the scale swap is
    operators/histogram.approx_mad (two map-side-combined sketch
    passes, estimates within composed one-bin bounds — proven against
    this query's exact form in tests/test_algorithms.py).
    """
    w = Window.partitionBy("event_type")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    with_med = ev.withColumn("med", F.percentile("value", F.lit(0.5)).over(w))
    with_mad = with_med.withColumn(
        "mad", F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).over(w)
    )
    return (
        with_mad.filter(F.abs(F.col("value") - F.col("med")) > 5 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
        .orderBy("event_id")
    )


@graded(
    "q_winsorize",
    oracle="""
    WITH s AS (
        SELECT event_id, event_type, value,
               quantile_cont(value, 0.05)
                   OVER (PARTITION BY event_type) AS lo,
               quantile_cont(value, 0.95)
                   OVER (PARTITION BY event_type) AS hi
        FROM events
    )
    SELECT event_id, event_type, value,
           round(lo, 6) AS lo,
           round(hi, 6) AS hi,
           least(greatest(value, lo), hi) AS w_value,
           value < lo OR value > hi AS clipped
    FROM s
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each event's value into its type's exact
    [p05, p95] band — the robust-stats tail treatment feature pipelines
    apply before fitting anything mean-squared (clipping, unlike
    trimming, keeps the row count intact for downstream joins).

    Plan shape: BOTH exact percentiles ride ONE unbounded window on the
    same partition key (one exchange, no sort, no agg + join-back —
    q_anomaly_mad's rule with two quantiles in a single pass). The
    clamp is least/greatest over bit-identical doubles: Spark
    F.percentile matches DuckDB quantile_cont bit-for-bit (same linear
    interpolation — q_percentiles parity), so w_value needs no
    rounding; lo/hi are rounded only as display columns.

    100 TB: one shuffle on event_type; per-key exact percentiles
    materialize a partition on one reducer — the documented bounded-
    cardinality contract, with operators/histogram.py the sketch swap
    when a key's row count outgrows a reducer.
    """
    w = Window.partitionBy("event_type")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    banded = ev.select(
        "event_id",
        "event_type",
        "value",
        F.percentile("value", F.lit(0.05)).over(w).alias("lo"),
        F.percentile("value", F.lit(0.95)).over(w).alias("hi"),
    )
    return banded.select(
        "event_id",
        "event_type",
        "value",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("w_value"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias("clipped"),
    )
