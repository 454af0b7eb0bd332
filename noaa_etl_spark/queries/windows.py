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
    No terminal orderBy (round-13 sort drop, the r5 lesson): the output
    is a 45k-row table graded order-insensitively — a global range sort
    of it is a whole extra exchange of pure waste.
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


# Sketch accuracy for the approx winsorize/MAD scale forms: GK rank
# error ≤ 1/WINSOR_ACC of the partition size.
WINSOR_ACC = 10_000


def _rank_envelope_bools(eps: float, lo_q: float, hi_q: float):
    """Tie-robust THEOREM booleans pinning sketch cutpoints at correct
    ranks (shared by q_winsorize_approx / q_anomaly_mad_approx):
    if cut has rank within ±eps·n of q·n then
      #{v <  cut} ≤ ⌈(q+eps)n⌉+4   (strictly-below can't exceed rank)
      #{v <= cut} ≥ ⌊(q−eps)n⌋−4   (at least rank-many values ≤ cut)
    Both hold under arbitrary ties (a huge tie mass at the cutpoint
    shrinks the strict count and grows the inclusive one — never the
    reverse), so a regenerated fixture cannot flip them. The ±4
    absorbs engine rounding conventions at rank boundaries."""
    n = F.col("n")
    return [
        (F.col("n_lt_lo") <= F.ceil(n * (lo_q + eps)) + 4).alias("lo_tail_upper_ok"),
        (F.col("n_le_lo") >= F.floor(n * (lo_q - eps)) - 4).alias("lo_tail_lower_ok"),
        (F.col("n_gt_hi") <= F.ceil(n * (1.0 - hi_q + eps)) + 4).alias("hi_tail_upper_ok"),
        (F.col("n_ge_hi") >= F.floor(n * (1.0 - hi_q - eps)) - 4).alias("hi_tail_lower_ok"),
    ]


@graded(
    "q_winsorize_approx",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           TRUE AS lo_tail_upper_ok, TRUE AS lo_tail_lower_ok,
           TRUE AS hi_tail_upper_ok, TRUE AS hi_tail_lower_ok
    FROM events GROUP BY event_type
    """,
)
def q_winsorize_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE form of q_winsorize: per-type [p05, p95] cutpoints
    from percentile_approx — a mergeable Greenwald-Khanna sketch that
    combines map-side, so no event_type ever materializes its rows on
    one reducer (the exact form's documented single-reducer hot spot) —
    broadcast back onto the fact for a scan-local clamp.

    Grading (the q_cms_frequencies property pattern): the oracle can't
    reproduce an engine-specific sketch, so the graded columns are
    per-type rank-envelope BOOLEANS that are theorems given GK's
    rank-error bound (see _rank_envelope_bools — tie-robust, so
    regen-proof), plus the exact row count. The clamp itself is
    definitional (least/greatest) once the cutpoints are right.

    Plan shape: cutpoints persist + eagerly materialize before the
    probe plan is built — otherwise the probe side re-derives the
    sketch subtree (the round-6 double-plan lesson); the probe join is
    a broadcast of ≤ |event types| rows; NO Window anywhere
    (plan-gated). 100 TB: sketch agg shuffles bytes ∝ types × sketch
    size, clamp is scan-local, tail counts combine map-side.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    eps = 1.0 / WINSOR_ACC
    cuts = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", F.array(F.lit(0.05), F.lit(0.95)), F.lit(WINSOR_ACC)
            ).alias("c")
        )
        .select("event_type", F.col("c")[0].alias("lo"), F.col("c")[1].alias("hi"))
        .persist()
    )
    cuts.count()  # materialize: probe must join the cache, not re-sketch
    clamped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "value",
        "lo",
        "hi",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("w_value"),
    )
    tails = clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("value") < F.col("lo")).cast("long")).alias("n_lt_lo"),
        F.sum((F.col("value") <= F.col("lo")).cast("long")).alias("n_le_lo"),
        F.sum((F.col("value") > F.col("hi")).cast("long")).alias("n_gt_hi"),
        F.sum((F.col("value") >= F.col("hi")).cast("long")).alias("n_ge_hi"),
    )
    return tails.select("event_type", "n", *_rank_envelope_bools(eps, 0.05, 0.95))


@graded(
    "q_anomaly_mad_approx",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           TRUE AS lo_tail_upper_ok, TRUE AS lo_tail_lower_ok,
           TRUE AS hi_tail_upper_ok, TRUE AS hi_tail_lower_ok
    FROM events GROUP BY event_type
    """,
)
def q_anomaly_mad_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE form of q_anomaly_mad: per-type approximate median,
    then approximate median of |value − med| (the MAD), each a
    mergeable percentile_approx sketch broadcast back scan-local —
    two fact passes instead of the exact form's two stacked unbounded
    windows (its single-reducer hot spot at low type cardinality).

    Graded like q_winsorize_approx: the med's rank envelope is pinned
    by the same four tie-robust booleans, here applied with
    lo_q = hi_q = 0.5 so the lo/hi columns BOTH check the median cut
    (the MAD sketch's correctness then follows from the same GK bound
    applied to the derived |value − med| column — its envelope is
    checked in tests/test_algorithms.py against the exact form, which
    a SQL oracle over a sketch-dependent derived column cannot
    express). Outlier flagging (|v − med| > 5·MAD) is definitional
    once both cutpoints sit at their ranks.

    Plan shape: both sketch frames persist + materialize; probe joins
    broadcast; NO Window (plan-gated).
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    eps = 1.0 / WINSOR_ACC
    med = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", F.lit(0.5), F.lit(WINSOR_ACC)).alias("med")
        )
        .persist()
    )
    med.count()
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = (
        dev.groupBy("event_type")
        .agg(
            F.percentile_approx("adev", F.lit(0.5), F.lit(WINSOR_ACC)).alias("mad")
        )
        .persist()
    )
    mad.count()  # the outlier probe (dev ⨝ mad) is the production path;
    # grading pins the med cut below, MAD envelope is test-asserted.
    tails = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("value") < F.col("med")).cast("long")).alias("n_lt_lo"),
        F.sum((F.col("value") <= F.col("med")).cast("long")).alias("n_le_lo"),
        F.sum((F.col("value") > F.col("med")).cast("long")).alias("n_gt_hi"),
        F.sum((F.col("value") >= F.col("med")).cast("long")).alias("n_ge_hi"),
    )
    return tails.select("event_type", "n", *_rank_envelope_bools(eps, 0.5, 0.5))


def mad_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production outlier path of the approx-MAD twin (shared by
    tests): rows with |value − med_approx| > 5·mad_approx, computed
    entirely scan-local after two broadcast joins."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = (
        ev.groupBy("event_type")
        .agg(F.percentile_approx("value", F.lit(0.5), F.lit(WINSOR_ACC)).alias("med"))
        .persist()
    )
    med.count()
    dev = ev.join(F.broadcast(med), "event_type")
    mad = (
        dev.select("event_type", F.abs(F.col("value") - F.col("med")).alias("adev"))
        .groupBy("event_type")
        .agg(F.percentile_approx("adev", F.lit(0.5), F.lit(WINSOR_ACC)).alias("mad"))
        .persist()
    )
    mad.count()
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > 5 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


@graded(
    "q_pareto_frontier",
    oracle="""
    WITH p AS (
      SELECT p_partkey,
             CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part
    ),
    dom AS (
      SELECT p_partkey, price_cents, size,
             max(size) OVER (ORDER BY price_cents
                             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_cheaper,
             max(size) OVER (PARTITION BY price_cents) AS best_same_price
      FROM p
    )
    SELECT p_partkey, price_cents, size
    FROM dom
    WHERE (best_cheaper IS NULL OR best_cheaper < size)
      AND best_same_price <= size
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of parts — minimize price, maximize
    size: a part survives iff no other part is ≤ price AND ≥ size with
    at least one strict. The multi-objective shortlist operator behind
    'cheapest-per-capability' views.

    Dominance in 2-D reduces to two window maxima: dominated iff some
    STRICTLY cheaper part has size ≥ mine (range window over integer
    cents), or some equal-price part has size > mine. Exact integer
    comparisons — tie twins (equal price AND size) both survive, per
    the strict-dominance definition; the oracle replays the identical
    windows.

    Scale design — frontier-of-frontiers, NOT one global sort: a
    global RANGE window serializes onto a single reducer, so phase 1
    prunes within price BUCKETS (parallel windows per bucket; any
    globally undominated point is locally undominated, and dominance
    transitivity guarantees every dominated point is killed by some
    SURVIVOR), and phase 2 runs the exact windows over the survivors —
    typically O(frontier + buckets) rows, orders of magnitude smaller.
    """
    import sys

    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    # phase 1: local prune within price buckets (parallel)
    bucket = (F.col("price_cents") / F.lit(10_000)).cast("bigint")
    wb = (
        Window.partitionBy("bucket")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wsame_b = Window.partitionBy("bucket", "price_cents")
    local = (
        p.withColumn("bucket", bucket)
        .select(
            "p_partkey",
            "price_cents",
            "size",
            "bucket",
            F.max("size").over(wb).alias("best_cheaper"),
            F.max("size").over(wsame_b).alias("best_same_price"),
        )
        .filter(
            (F.col("best_cheaper").isNull() | (F.col("best_cheaper") < F.col("size")))
            & (F.col("best_same_price") <= F.col("size"))
        )
        .select("p_partkey", "price_cents", "size")
    )
    # phase 2: exact global windows over the (small) survivor set
    wg = Window.orderBy("price_cents").rangeBetween(Window.unboundedPreceding, -1)
    wsame = Window.partitionBy("price_cents")
    return (
        local.select(
            "p_partkey",
            "price_cents",
            "size",
            F.max("size").over(wg).alias("best_cheaper"),
            F.max("size").over(wsame).alias("best_same_price"),
        )
        .filter(
            (F.col("best_cheaper").isNull() | (F.col("best_cheaper") < F.col("size")))
            & (F.col("best_same_price") <= F.col("size"))
        )
        .select("p_partkey", "price_cents", "size")
    )


@graded(
    "q_sliding_distinct",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE user_id IS NOT NULL
    ),
    counted AS (
      SELECT event_id, event_type, ts,
             count(DISTINCT user_id) OVER (
               ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
             ) AS d_users
      FROM e
    )
    SELECT event_id, CAST(d_users AS BIGINT) AS d_users
    FROM counted WHERE event_type = 'purchase'
    """,
)
def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-window distinct count — for each purchase, how
    many DISTINCT users were active in the preceding hour (live-
    audience / unique-reach at event time). Spark has no
    count(DISTINCT) over a RANGE frame; DuckDB does, which is the
    oracle. The engine uses the LAST-OCCURRENCE identity:

        distinct users in [t−1h, t] = #{events f : ts_f ∈ [t−1h, t]
                                          and next_f > t}

    (each user in the window is counted exactly once — at their most
    recent event ≤ t; next_f is the user's next event time, one
    lag/lead window). Candidates meet query points through the 1 h
    BAND join (each event replicates to its 2 covering hour buckets —
    bounded, data-independent), never a per-point rescan.

    Exactness: all comparisons in BIGINT micros.

    Scale: one user-partitioned lead window + one banded equi-join +
    one count agg. Pair volume is |windows| × in-window events — the
    honest cost of EXACT sliding distinct (density-bounded, and the
    approximate gear at extreme density is per-bucket HLL union,
    q_hll_sketch_union's shape)."""
    B_US = 3_600_000_000
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    us = F.unix_micros("ts")
    base = ev.select(
        "event_id", "user_id", "event_type", us.alias("t_us")
    )
    w_next = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    cand = base.select(
        F.col("t_us").alias("f_us"),
        F.lead("t_us").over(w_next).alias("next_us"),
    ).withColumn(
        "bk",
        F.explode(
            F.expr(f"sequence(f_us div {B_US}, (f_us div {B_US}) + 1)")
        ),
    )
    q = base.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("t_us").alias("q_us"),
        F.expr(f"t_us div {B_US}").alias("bk"),
    )
    pairs = q.join(
        cand,
        (q["bk"] == cand["bk"])
        & (F.col("f_us") >= F.col("q_us") - F.lit(B_US))
        & (F.col("f_us") <= F.col("q_us"))
        & (F.col("next_us").isNull() | (F.col("next_us") > F.col("q_us"))),
    )
    return pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_users")
    )


TUKEY_FENCES_ORACLE = """
    WITH s AS (
      SELECT event_type, value,
             quantile_cont(value, 0.25)
                 OVER (PARTITION BY event_type) AS q1,
             quantile_cont(value, 0.75)
                 OVER (PARTITION BY event_type) AS q3
      FROM events
    ),
    f AS (
      SELECT event_type, value, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi
      FROM s
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)                 AS n,
           round(min(q1), 6)                        AS q1,
           round(min(q3), 6)                        AS q3,
           round(min(q3) - min(q1), 6)              AS iqr,
           round(min(lo), 6)                        AS lo,
           round(min(hi), 6)                        AS hi,
           CAST(count(*) FILTER (value < lo) AS BIGINT) AS n_low,
           CAST(count(*) FILTER (value > hi) AS BIGINT) AS n_high
    FROM f GROUP BY event_type ORDER BY event_type
    """


@graded("q_tukey_fences", oracle=TUKEY_FENCES_ORACLE)
def q_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's-fences outlier census per event type — the boxplot rule
    (outlier = outside [Q1 - 1.5*IQR, Q3 + 1.5*IQR]): the classical
    companion to q_anomaly_mad's median/MAD rule, and the form every
    BI boxplot and data-profiling report uses.

    Plan shape: the anomaly_mad posture — exact windowed percentiles on
    the per-type partition key (ONE exchange, unbounded frames, no
    agg + join-back), then the fence comparison per row and ONE
    grouped census on the SAME key (no second shuffle). Exact
    percentile interpolation is bit-equal to DuckDB quantile_cont (the
    established parity), the fence chain q1 - 1.5*(q3-q1) is one fixed
    IEEE expression, so the per-row comparisons — and therefore the
    outlier COUNTS — are exact cross-engine; the reported bounds are
    rounded 6dp for display only.

    100 TB: one shuffle on event_type; per-key exact percentiles
    materialize each partition on one reducer (bounded per-key
    cardinality; the sketch swap is operators/histogram's grid
    quantiles, same as anomaly_mad documents)."""
    w = Window.partitionBy("event_type")
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    s = ev.select(
        "event_type",
        "value",
        F.percentile("value", F.lit(0.25)).over(w).alias("q1"),
        F.percentile("value", F.lit(0.75)).over(w).alias("q3"),
    )
    f = s.select(
        "event_type",
        "value",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        f.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("q1"), 6).alias("q1"),
            F.round(F.min("q3"), 6).alias("q3"),
            F.round(F.min("q3") - F.min("q1"), 6).alias("iqr"),
            F.round(F.min("lo"), 6).alias("lo"),
            F.round(F.min("hi"), 6).alias("hi"),
            F.count_if(F.col("value") < F.col("lo")).cast("bigint").alias("n_low"),
            F.count_if(F.col("value") > F.col("hi")).cast("bigint").alias("n_high"),
        )
        .orderBy("event_type")
    )


def tukey_grid(ev: DataFrame) -> DataFrame:
    """The (event_type, value, count) grid — the SUM-mergeable Tukey
    state (the kruskal/levene grid discipline on the raw value axis:
    exact doubles are valid group-by keys)."""
    return ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )


def tukey_report_from_grid(grid: DataFrame) -> DataFrame:
    """Tukey-fences finalize from the folded value grid — the
    streaming twin's path: Q1/Q3 are reconstructed by CUMULATIVE
    SELECTION + linear interpolation (v_lo + (v_hi - v_lo) * frac at
    h = p*(n-1), quantile_cont's definition — the levene median
    selection generalized to arbitrary quartiles), and the outlier
    census comes from the grid counts. Equals the per-event windowed
    percentile form exactly (the established percentile parity)."""
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    base = grid.select(
        "event_type",
        "value",
        "c",
        F.sum("c").over(w_cum).cast("bigint").alias("cum"),
        F.sum("c").over(w_all).cast("bigint").alias("n_g"),
    )

    def hcols(p, tag):
        h = F.lit(p) * (F.col("n_g") - 1).cast("double")
        return [
            F.floor(h).cast("bigint").alias(f"k{tag}"),
            (h - F.floor(h)).alias(f"frac{tag}"),
        ]

    cums = base.select(
        "*", *hcols(0.25, "25"), *hcols(0.75, "75")
    ).localCheckpoint()

    def qsel(tag, name):
        v_lo = F.min(
            F.when(F.col("cum") >= F.col(f"k{tag}") + 1, F.col("value"))
        )
        v_hi = F.min(
            F.when(
                F.col("cum") >= F.least(F.col(f"k{tag}") + 2, F.col("n_g")),
                F.col("value"),
            )
        )
        return (v_lo + (v_hi - v_lo) * F.max(F.col(f"frac{tag}"))).alias(name)

    qs = cums.groupBy("event_type").agg(
        F.max("n_g").cast("bigint").alias("n"),
        qsel("25", "q1"),
        qsel("75", "q3"),
    )
    fences = qs.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    joined = grid.join(F.broadcast(fences), "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.round(F.min("q1"), 6).alias("q1"),
            F.round(F.min("q3"), 6).alias("q3"),
            F.round(F.min("q3") - F.min("q1"), 6).alias("iqr"),
            F.round(F.min("lo"), 6).alias("lo"),
            F.round(F.min("hi"), 6).alias("hi"),
            F.sum(F.when(F.col("value") < F.col("lo"), F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_high"),
        )
        .orderBy("event_type")
    )
