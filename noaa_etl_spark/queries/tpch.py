"""TPC-H-shaped analytical queries over the fixture star schema —
the classic decision-support shapes not yet covered by the §2 rows
(multi-nation volume, market share, HAVING-vs-scalar, promo share,
correlated-average filter). DataFrame-first: the correlated forms are
written hand-decorrelated (join against the aggregate), which is the
plan Catalyst produces from the subquery form the oracle uses — the
hash match proves the equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.registry import graded


@graded(
    "q_tpch_q7_volume",
    oracle="""
    SELECT n_s.n_name AS supp_nation, n_c.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n_c ON c_nationkey = n_c.n_nationkey
    JOIN nation n_s ON s_nationkey = n_s.n_nationkey
    WHERE (n_s.n_name = 'NATION_12' AND n_c.n_name = 'NATION_13')
       OR (n_s.n_name = 'NATION_13' AND n_c.n_name = 'NATION_12')
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral shipping volume between two nations per year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    n_c = nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n_s = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_13")
    ) | ((F.col("supp_nation") == "NATION_13") & (F.col("cust_nation") == "NATION_12"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@graded(
    "q_tpch_q8_share",
    oracle="""
    WITH orders_rev AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS rev,
             n_s.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n_c ON c_nationkey = n_c.n_nationkey
      JOIN region   ON n_c.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n_s ON s_nationkey = n_s.n_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)
                 / sum(rev), 6) AS mkt_share
    FROM orders_rev
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's market share of a region's order revenue
    per year (conditional sum over total, per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    n_c = nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n_s = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(reg.filter(F.col("r_name") == "ASIA")), F.col("c_rk") == reg.r_regionkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@graded(
    "q_tpch_q11_value",
    oracle="""
    SELECT l_partkey,
           sum(l_extendedprice) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING sum(l_extendedprice) > (
      SELECT 1.25 * sum(l_extendedprice) / count(DISTINCT l_partkey) FROM lineitem
    )
    ORDER BY part_value DESC, l_partkey
    """,
)
def q_tpch_q11_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose traded value exceeds 1.25x the mean part
    value — HAVING against an uncorrelated scalar aggregate,
    decorrelated as a cross-join against the one-row threshold. (A
    mean-relative threshold stays non-trivial at every scale factor;
    fraction-of-total thresholds go vacuous as the part count grows.)"""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum("l_extendedprice").alias("part_value"))
    total = li.agg(
        (1.25 * F.sum("l_extendedprice") / F.count_distinct("l_partkey")).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@graded(
    "q_tpch_q14_promo",
    oracle="""
    SELECT year(l_shipdate) AS l_year, month(l_shipdate) AS l_month,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
    ORDER BY l_year, l_month
    """,
)
def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share per ship month."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").alias("l_year"), F.month("l_shipdate").alias("l_month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share")
        )
        .orderBy("l_year", "l_month")
    )


@graded(
    "q_tpch_q17_small_qty",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part ON l.l_partkey = p_partkey
    WHERE p_brand = 'Brand#11'
      AND l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from unusually-small-quantity orders of one
    brand's parts — correlated average, decorrelated as a per-part
    aggregate joined back to the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#11")), li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )
