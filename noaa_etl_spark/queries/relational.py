"""Relational core: scans, filters, joins, aggregations, set ops.

Each query is one graded operator exercise (SURVEY.md §2.A–D, §2.F–G)
over the fixture star schema. Scale notes inline — these queries are
written for a 1000-executor / 100 TB deployment and merely *tested* at
fixture scale:

- Dimension joins (region/nation/customer/supplier/part) stay below the
  broadcast threshold by construction at any realistic dimension size, so
  Catalyst broadcasts them; the fact table (lineitem) is never shuffled
  for a dim join.
- Aggregations rely on Spark's automatic partial (map-side) aggregation;
  group keys here are low-cardinality flags or bounded dimension keys, so
  the final shuffle moves only the partial aggregates.
- Filters are expressed on raw columns so predicate pushdown reaches the
  parquet row-group stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table, ntz_lit
from noaa_etl_spark.registry import graded


# ---------------------------------------------------------------------------
# Aggregations over the fact table
# ---------------------------------------------------------------------------


@graded(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                   AS sum_qty,
           sum(l_extendedprice)                              AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))           AS sum_disc_price,
           avg(l_quantity)                                   AS avg_qty,
           avg(l_extendedprice)                              AS avg_price,
           avg(l_discount)                                   AS avg_disc,
           count(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: filter + hash agg + sort.

    Scale: map-side partial agg reduces 100 TB of lineitem to
    (#partitions × 6 groups) partial rows before the only shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= ntz_lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@graded(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 6)            AS std_price,
           round(var_samp(l_quantity), 6)                    AS var_qty,
           round(corr(l_extendedprice, l_quantity), 6)       AS corr_price_qty,
           round(covar_samp(l_extendedprice, l_discount), 6) AS covar_price_disc,
           min(l_extendedprice)                      AS min_price,
           max(l_extendedprice)                      AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/var/corr/covar) per group.

    Note: Spark's skewness/kurtosis use population formulas while DuckDB
    uses sample-corrected ones — deliberately excluded from the graded
    surface; the engine exposes them but they cannot hash-match.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 6).alias("std_price"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
            F.round(F.covar_samp("l_extendedprice", "l_discount"), 6).alias("covar_price_disc"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@graded(
    "q_percentiles",
    oracle="""
    SELECT l_linestatus,
           median(l_extendedprice)                       AS median_price,
           quantile_cont(l_extendedprice, 0.90)          AS p90_price,
           quantile_cont(l_extendedprice, 0.99)          AS p99_price
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group.

    Exact ``F.percentile`` (not approx) so values hash-match the oracle's
    ``quantile_cont``. Scale note: exact percentile shuffles group-local
    values; at 100 TB prefer ``approx_percentile`` for monitoring paths
    and reserve exact for bounded-cardinality groups like these.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.median("l_extendedprice").alias("median_price"),
            F.percentile("l_extendedprice", 0.90).alias("p90_price"),
            F.percentile("l_extendedprice", 0.99).alias("p99_price"),
        )
        .orderBy("l_linestatus")
    )


@graded(
    "q_minmax_by",
    oracle="""
    SELECT l_returnflag,
           arg_max(l_orderkey, l_extendedprice)  AS key_of_max_price,
           arg_min(l_orderkey, l_extendedprice)  AS key_of_min_price,
           max(l_extendedprice)                  AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-extreme (arg_max/arg_min ≡ max_by/min_by)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.max_by("l_orderkey", "l_extendedprice").alias("key_of_max_price"),
            F.min_by("l_orderkey", "l_extendedprice").alias("key_of_min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@graded(
    "q_count_distinct",
    oracle="""
    SELECT n_name,
           count(DISTINCT s_suppkey)  AS n_suppliers,
           count(*)                   AS n_rows
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (joined through a broadcast dim).

    Scale: exact count-distinct expands to a two-phase agg in Spark;
    for dashboards at 100 TB use approx_count_distinct (HLL) instead —
    exposed by the engine but unhashable vs an exact oracle.
    """
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count_distinct("s_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("n_name")
    )


@graded(
    "q_agg_filtered",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'error')     AS n_errors,
           count(*) FILTER (WHERE event_type = 'purchase')  AS n_purchases,
           sum(value) FILTER (WHERE event_type = 'purchase') AS purchase_value,
           count(*)                                          AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER-style) per user."""
    ev = load_table(spark, sf_dir, "events")
    is_err = F.col("event_type") == "error"
    is_buy = F.col("event_type") == "purchase"
    return (
        ev.groupBy("user_id")
        .agg(
            F.count_if(is_err).alias("n_errors"),
            F.count_if(is_buy).alias("n_purchases"),
            F.sum(F.when(is_buy, F.col("value"))).alias("purchase_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@graded(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS TINYINT)  AS g_flag,
           CAST(grouping(l_linestatus) AS TINYINT)  AS g_status,
           sum(l_quantity)         AS sum_qty,
           count(*)                AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup (station → station×month → total in the
    NOAA framing; flag → flag×status → grand total here)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_last(),
            F.col("l_linestatus").asc_nulls_last(),
        )
    )


@graded(
    "q_cube",
    oracle="""
    SELECT c_mktsegment, o_orderpriority,
           count(*)          AS n_orders,
           sum(o_totalprice) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderpriority)
    ORDER BY c_mktsegment NULLS LAST, o_orderpriority NULLS LAST
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions after a dim join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


# ---------------------------------------------------------------------------
# Filters / projections / conditionals
# ---------------------------------------------------------------------------


@graded(
    "q_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    ORDER BY o_orderkey
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate surface: between / isin / like / comparison, all on raw
    columns so every one reaches the parquet scan as a pushed filter."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_totalprice").between(1000, 50000)
            & F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderpriority").like("%URGENT%")
            & (F.col("o_orderdate") >= ntz_lit("1996-01-01"))
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@graded(
    "q_conditional_case",
    oracle="""
    SELECT
      CASE WHEN l_quantity < 10 THEN 'small'
           WHEN l_quantity < 30 THEN 'medium'
           ELSE 'large' END            AS qty_band,
      CASE WHEN l_discount = 0 THEN 'none' ELSE 'discounted' END AS disc_band,
      count(*)                          AS n_items,
      sum(l_extendedprice)              AS revenue
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY qty_band, disc_band
    """,
)
def q_conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-logic banding (trace-precipitation-style recoding in NOAA terms)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_band = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
    )
    disc_band = F.when(F.col("l_discount") == 0, "none").otherwise("discounted")
    return (
        li.groupBy(qty_band.alias("qty_band"), disc_band.alias("disc_band"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_extendedprice").alias("revenue"),
        )
        .orderBy("qty_band", "disc_band")
    )


@graded(
    "q_null_handling",
    oracle="""
    SELECT o_orderstatus,
           count(*)                                   AS n_rows,
           count(nullif(o_orderpriority, '1-URGENT')) AS n_not_urgent,
           sum(coalesce(nullif(o_totalprice, 0), -1)) AS total_nz
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif / coalesce / null-aware count (QC missing-obs handling)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))).alias("n_not_urgent"),
            F.sum(F.coalesce(F.nullif(F.col("o_totalprice"), F.lit(0)), F.lit(-1))).alias("total_nz"),
        )
        .orderBy("o_orderstatus")
    )


@graded(
    "q_distinct_rows",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", "c_nationkey").distinct().orderBy("c_mktsegment", "c_nationkey")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@graded(
    "q_join3_topk",
    oracle="""
    SELECT c_custkey, c_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           count(*)                                AS n_items
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def q_join3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: filter + customer⋈orders⋈lineitem + agg + top-10.

    Scale: orders filter is pushed to the scan; customer is broadcast;
    orders⋈lineitem is the one real shuffle (both sides hashed on
    orderkey); orderBy+limit fuses into TakeOrderedAndProject (per-
    partition heaps — no global sort).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            orders.filter(F.col("o_orderdate") >= ntz_lit("1996-01-01")),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@graded(
    "q_join5_region",
    oracle="""
    SELECT n_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_join5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-table join: local-supplier revenue by nation.

    Scale: all four dimension joins broadcast; lineitem⋈orders is the
    single large shuffle. The r_name filter prunes via the broadcast
    (dynamic filter) before the fact shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg.filter(F.col("r_name") == "ASIA")), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@graded(
    "q_join_left",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey)              AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 6) AS total_spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with zero orders. No terminal
    orderBy (round-13 sort drop, the r5 lesson): the 150k-row per-
    customer table is graded order-insensitively — a global sort is a
    whole extra exchange of pure waste at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 6).alias("total_spend"),
        )
    )


@graded(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having any six-figure order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 100000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@graded(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    ORDER BY c_custkey
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders in the recent window
    (missing-data audit / churn query). The window predicate keeps the
    result non-empty at every fixture scale — every customer has *some*
    order, so the unwindowed form is vacuous."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(F.col("o_orderdate") >= ntz_lit("2000-01-01"))
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@graded(
    "q_join_cross",
    oracle="""
    SELECT r_name, seg.c_mktsegment AS mktsegment
    FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    ORDER BY r_name, mktsegment
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two small sets (date-spine-style expansion)."""
    reg = load_table(spark, sf_dir, "region").select("r_name")
    seg = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("mktsegment"))
        .distinct()
    )
    return reg.crossJoin(seg).orderBy("r_name", "mktsegment")


@graded(
    "q_join_range",
    oracle="""
    SELECT b.bucket_name, count(*) AS n_parts, sum(p_retailprice) AS total_price
    FROM part
    JOIN (VALUES ('small', 0, 20), ('medium', 20, 35), ('large', 35, 1000000))
         AS b(bucket_name, lo, hi)
      ON p_size >= b.lo AND p_size < b.hi
    GROUP BY b.bucket_name
    ORDER BY b.bucket_name
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: value-in-bucket against a tiny bounds table.

    Scale: the bounds side is a literal handful of rows → broadcast
    nested-loop join, which is the correct physical plan; never range-join
    two large sides without banding (see q_asof_join for the banded form).
    """
    part = load_table(spark, sf_dir, "part")
    buckets = spark.createDataFrame(
        [("small", 0, 20), ("medium", 20, 35), ("large", 35, 1_000_000)],
        "bucket_name string, lo int, hi int",
    )
    return (
        part.join(
            F.broadcast(buckets),
            (part.p_size >= buckets.lo) & (part.p_size < buckets.hi),
        )
        .groupBy("bucket_name")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("p_retailprice").alias("total_price"),
        )
        .orderBy("bucket_name")
    )


# ---------------------------------------------------------------------------
# Set operations / dedup
# ---------------------------------------------------------------------------


@graded(
    "q_set_ops",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'both' AS which, nationkey FROM (SELECT nationkey FROM cust_nations INTERSECT SELECT nationkey FROM supp_nations)
    UNION ALL
    SELECT 'cust_only' AS which, nationkey FROM (SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations)
    ORDER BY which, nationkey
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over nation keysets."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    sup = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cust.intersect(sup).select(F.lit("both").alias("which"), "nationkey")
    cust_only = cust.exceptAll(sup).select(F.lit("cust_only").alias("which"), "nationkey")
    return both.unionByName(cust_only).orderBy("which", "nationkey")


@graded(
    "q_null_safe_join",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority = '3-MEDIUM' THEN NULL
                  ELSE o_orderpriority END AS prio_key
      FROM orders WHERE o_orderkey <= 2000
    ),
    d AS (
      SELECT * FROM (VALUES ('1-URGENT', 10), ('2-HIGH', 5), (NULL, 0))
               AS t(prio_key, boost)
    )
    SELECT coalesce(o.prio_key, '(none)') AS prio,
           count(*)                       AS n_orders,
           CAST(sum(d.boost) AS BIGINT)   AS total_boost
    FROM o JOIN d ON o.prio_key IS NOT DISTINCT FROM d.prio_key
    GROUP BY 1
    ORDER BY prio
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    NULL dim rows instead of dropping — the lookup-with-default shape
    where 'unknown' is itself a dimension value."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "3-MEDIUM", None)
        .otherwise(F.col("o_orderpriority"))
        .alias("prio_key"),
    )
    d = spark.createDataFrame(
        [("1-URGENT", 10), ("2-HIGH", 5), (None, 0)], "d_prio_key string, boost int"
    )
    return (
        o.join(F.broadcast(d), o.prio_key.eqNullSafe(d.d_prio_key))
        .groupBy(F.coalesce("prio_key", F.lit("(none)")).alias("prio"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("boost").cast("bigint").alias("total_boost"),
        )
        .orderBy("prio")
    )


@graded(
    "q_bool_aggs",
    oracle="""
    SELECT c_mktsegment,
           bool_and(c_acctbal > -1000)  AS all_above_floor,
           bool_or(c_acctbal < 0)       AS any_negative,
           CAST(count_if(c_acctbal > 5000) AS BIGINT) AS n_rich
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any) — the QC summary shape ('did all
    observations pass', 'did any fail')."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
            F.bool_or(F.col("c_acctbal") < 0).alias("any_negative"),
            F.count_if(F.col("c_acctbal") > 5000).alias("n_rich"),
        )
        .orderBy("c_mktsegment")
    )


@graded(
    "q_union_all_yearly",
    oracle="""
    WITH early AS (
      SELECT o_orderkey, o_totalprice, CAST(year(o_orderdate) AS INT) AS order_year
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    late AS (
      SELECT o_orderkey, o_totalprice, CAST(year(o_orderdate) AS INT) AS order_year,
             o_orderpriority
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    )
    SELECT order_year,
           count(*)                                   AS n_orders,
           count(o_orderpriority)                     AS n_with_priority,
           CAST(sum(floor(o_totalprice)) AS BIGINT)   AS floor_revenue
    FROM (SELECT *, NULL AS o_orderpriority FROM early
          UNION ALL BY NAME
          SELECT * FROM late)
    GROUP BY order_year
    ORDER BY order_year
    """,
)
def q_union_all_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The yearly-file append pattern: two year-slices with *different
    schemas* (the late slice carries an extra column) appended via
    unionByName(allowMissingColumns=True) — by-name, never positional,
    so schema drift across years cannot silently swap columns."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = ntz_lit("1998-01-01")
    early = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_totalprice", F.year("o_orderdate").alias("order_year")
    )
    late = orders.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").alias("order_year"),
        "o_orderpriority",
    )
    return (
        early.unionByName(late, allowMissingColumns=True)
        .groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("o_orderpriority").alias("n_with_priority"),
            F.sum(F.floor("o_totalprice").cast("bigint")).alias("floor_revenue"),
        )
        .orderBy("order_year")
    )


@graded(
    "q_dedup_keyed",
    oracle="""
    SELECT l_orderkey,
           min(l_linenumber)     AS first_line,
           min(l_extendedprice)  AS min_price,
           count(*)              AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)
def q_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup in the deterministic groupBy-min form.

    ``dropDuplicates`` picks an arbitrary survivor (nondeterministic under
    retries/speculation at scale) — the engine's graded form aggregates
    instead, which is both deterministic and map-side combinable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.min("l_linenumber").alias("first_line"),
            F.min("l_extendedprice").alias("min_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )


@graded(
    "q_agg_first_last",
    oracle="""
    SELECT o_orderpriority,
           arg_min(o_totalprice, o_orderkey)        AS first_price,
           arg_max(o_totalprice, o_orderkey)        AS last_price,
           any_value(substr(o_orderpriority, 1, 1)) AS prio_digit,
           count(*)                                 AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg-side first/last/any_value, made deterministic: raw
    ``first()``/``last()`` pick an arbitrary survivor per partition order
    (unfit for graded output under retries/speculation — SURVEY §5), so
    the engine's form is ``min_by``/``max_by`` over a UNIQUE ordering key
    (o_orderkey) — 'first' = value at the smallest key — and
    ``any_value`` only over a group-constant expression, where every
    choice is the same value. All three are map-side combinable."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.min_by("o_totalprice", "o_orderkey").alias("first_price"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_price"),
            F.any_value(F.substring("o_orderpriority", 1, 1)).alias("prio_digit"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@graded(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k via orderBy+limit → TakeOrderedAndProject (per-
    partition heaps; no full sort, no single-node pressure at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@graded(
    "q_sort_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def q_sort_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + offset pagination."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(10)
    )


@graded(
    "q_set_ops_all",
    oracle="""
    WITH a AS (SELECT l_returnflag, l_linestatus FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                 AND l_shipdate <  TIMESTAMP '1997-07-01'),
         b AS (SELECT l_returnflag, l_linestatus FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1997-07-01'
                 AND l_shipdate <  TIMESTAMP '1998-01-01')
    SELECT 'except_all' AS op, l_returnflag, l_linestatus
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'intersect_all' AS op, l_returnflag, l_linestatus
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL keep
    MULTIPLICITY, the semantics reconciliation jobs actually need
    ("how many rows of this shape did H1 have beyond H2", not "which
    distinct shapes"): two half-year slices of (returnflag, linestatus)
    compared as bags. The driver's order-insensitive hash grades the
    multiset exactly.

    100 TB: Spark plans both as a single hash aggregate computing
    per-side counts then replicating min/difference counts — one
    shuffle on the compared columns, no join, multiplicities never
    materialize as row explosions mid-plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_returnflag", "l_linestatus"]
    a = li.filter(
        (F.col("l_shipdate") >= ntz_lit("1997-01-01"))
        & (F.col("l_shipdate") < ntz_lit("1997-07-01"))
    ).select(*cols)
    b = li.filter(
        (F.col("l_shipdate") >= ntz_lit("1997-07-01"))
        & (F.col("l_shipdate") < ntz_lit("1998-01-01"))
    ).select(*cols)
    return a.exceptAll(b).select(F.lit("except_all").alias("op"), *cols).unionByName(
        b.intersectAll(a).select(F.lit("intersect_all").alias("op"), *cols)
    )


@graded(
    "q_sort_null_ordering",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio_or_null
    FROM orders
    ORDER BY prio_or_null ASC NULLS FIRST, o_orderkey
    LIMIT 15
    """,
)
def q_sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ordered-limit results: NULLS FIRST
    pulls the NULLified sentinel rows into the top-k, so null ordering
    changes WHICH rows survive the limit (the only place null placement
    is observable under an order-insensitive grade). Tie-broken by key
    for cross-engine determinism.

    100 TB: TakeOrderedAndProject per-partition heaps — null ordering
    rides the comparator, costing nothing over a plain top-k.
    """
    orders = load_table(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return (
        orders.select("o_orderkey", prio.alias("prio_or_null"))
        .orderBy(F.col("prio_or_null").asc_nulls_first(), F.col("o_orderkey"))
        .limit(15)
    )


@graded(
    "q_mode_by_group",
    oracle="""
    WITH counted AS (
      SELECT c_mktsegment, o_orderpriority, count(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority
    ),
    ranked AS (
      SELECT c_mktsegment, o_orderpriority, n,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, o_orderpriority) AS rn,
             CAST(sum(n) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS total_orders
      FROM counted
    )
    SELECT c_mktsegment,
           o_orderpriority AS modal_priority,
           n               AS n_modal,
           total_orders
    FROM ranked WHERE rn = 1
    ORDER BY c_mktsegment
    """,
)
def q_mode_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: the most frequent order priority in
    each market segment, ties broken toward the lexicographically
    smallest value — built-in mode() has engine-specific tie behavior,
    so the engine computes it as count + min_by over the composite
    (−count, value) key: two map-side-combinable aggs, NO window sort
    (the oracle replays it as a row_number window, which is the shape
    Spark would need if min_by couldn't encode the tie-break).

    100 TB: the second agg runs over |segments × priorities| rows —
    nothing after the first count touches fact-table volume."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    counted = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counted.groupBy("c_mktsegment")
        .agg(
            F.min_by(
                "o_orderpriority", F.struct(-F.col("n"), F.col("o_orderpriority"))
            ).alias("modal_priority"),
            F.max("n").alias("n_modal"),
            F.sum("n").alias("total_orders"),
        )
        .orderBy("c_mktsegment")
    )


@graded(
    "q_string_agg",
    oracle="""
    SELECT r_name AS region,
           CAST(count(DISTINCT n_name) AS BIGINT) AS n_nations,
           string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations_csv,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY region
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation (SQL LISTAGG / string_agg):
    per region, the sorted CSV of member nations plus customer counts.
    Spark has no ordered string_agg — the deterministic composition is
    collect_set → array_sort → array_join, which is order-insensitive
    to partitioning (collect_list would not be) and therefore
    reproducible across engines and cluster sizes.

    100 TB: collect_set state is bounded by the DISTINCT value set per
    group (25 nations here — listagg over unbounded-cardinality values
    is an anti-pattern at any scale, documented by this query's shape);
    both dims broadcast onto the customer scan, one combinable agg.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.countDistinct("n_name").cast("bigint").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias(
                "nations_csv"
            ),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("region")
    )


@graded(
    "q_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT flag, cents, w,
             CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents) AS BIGINT) AS cw,
             CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT)               AS tw
      FROM g
    )
    SELECT flag,
           CAST(min(tw) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT)
               AS median_cents
    FROM c GROUP BY flag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED (lower) median: the smallest price whose cumulative
    quantity weight reaches half the group's total — the
    inventory-weighted midpoint price (plain median treats a
    1000-unit line and a 1-unit line alike). Selection, not
    interpolation: the answer is an EXACT BIGINT from exact BIGINT
    cumulative weights — no float percentile arithmetic anywhere.

    Scale: rows collapse to the (flag, cents) VALUE grid first (one
    combinable agg — the weight of repeated prices merges map-side),
    so the rank windows sort |distinct prices| per flag, not raw rows;
    per-flag window over the reduced grid is the MAD/quantile-family
    honest cost."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    g = li.groupBy("flag", "cents").agg(F.sum("q").cast("bigint").alias("w"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "cents",
        F.sum("w").over(w_cum).cast("bigint").alias("cw"),
        F.sum("w").over(w_all).cast("bigint").alias("tw"),
    )
    return c.groupBy("flag").agg(
        F.min("tw").cast("bigint").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents")))
        .cast("bigint")
        .alias("median_cents"),
    )
