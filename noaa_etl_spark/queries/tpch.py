"""TPC-H-shaped analytical queries over the fixture star schema —
the classic decision-support shapes not yet covered by the §2 rows
(multi-nation volume, market share, HAVING-vs-scalar, promo share,
correlated-average filter). DataFrame-first: the correlated forms are
written hand-decorrelated (join against the aggregate), which is the
plan Catalyst produces from the subquery form the oracle uses — the
hash match proves the equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table, ntz_lit
from noaa_etl_spark.registry import graded


@graded(
    "q_tpch_q7_volume",
    oracle="""
    SELECT n_s.n_name AS supp_nation, n_c.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
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
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
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
    WITH per_part AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS part_value_cents
      FROM lineitem
      GROUP BY l_partkey
    ), tot AS (
      SELECT CAST(sum(part_value_cents) AS BIGINT) AS total_cents,
             count(*) AS nparts
      FROM per_part
    )
    SELECT l_partkey, part_value_cents
    FROM per_part, tot
    WHERE part_value_cents * nparts * 4 > total_cents * 5
    ORDER BY part_value_cents DESC, l_partkey
    """,
)
def q_tpch_q11_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose traded value exceeds 1.25x the mean part
    value — HAVING against an uncorrelated scalar aggregate. (A
    mean-relative threshold stays non-trivial at every scale factor;
    fraction-of-total thresholds go vacuous as the part count grows.)

    The threshold is a GLOBAL WINDOW over the per-part aggregate, not a
    second lineitem aggregate cross-joined back: sum is distributive
    (sum of per-part sums == sum over lineitem) and count(per-part
    rows) == count_distinct(partkey), so the scalar derives from the
    reduced relation — referencing lineitem from a second subtree made
    Spark scan+aggregate the fact twice (the Q21 double-plan smell).
    The window's single-partition exchange moves only |parts| skinny
    rows.

    Values are exact integer CENTS (per-term floor, bigint sum — the
    Q3/Q6 form) and the 1.25x-mean threshold is the cross-multiplied
    integer predicate 4*n*value > 5*total, so boundary membership is
    bit-exact across engines, partitionings, and accumulation orders —
    no double sum ever meets a ulp-sensitive comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("bigint")
    per_part = li.groupBy("l_partkey").agg(F.sum(cents).alias("part_value_cents"))
    w = Window.partitionBy()
    return (
        per_part.withColumn("total_cents", F.sum("part_value_cents").over(w))
        .withColumn("nparts", F.count(F.lit(1)).over(w))
        .filter(
            F.col("part_value_cents") * F.col("nparts") * 4
            > F.col("total_cents") * 5
        )
        .select("l_partkey", "part_value_cents")
        .orderBy(F.desc("part_value_cents"), F.asc("l_partkey"))
    )


@graded(
    "q_tpch_q14_promo",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS l_year, CAST(month(l_shipdate) AS INT) AS l_month,
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
    brand's parts — correlated average, decorrelated as a PER-PART
    WINDOW over the brand-filtered fact. The brand join selects whole
    partkeys, so the window avg over the joined rows equals the
    correlated subquery's avg over all lineitems of that part — and
    this form beats the agg+join-back two ways at scale: the fact is
    referenced once (the old per-part-avg subtree re-scanned ALL of
    lineitem), and only the brand's share of rows (~1/|brands|)
    shuffles for the partkey window."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#11")),
            li.l_partkey == part.p_partkey,
        )
        .withColumn("half_avg_qty", 0.5 * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@graded(
    "q_tpch_q4_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: late-shipment order counts per priority in one quarter —
    correlated EXISTS with an inequality on both tables' columns,
    expressed as a left-semi join whose condition spans both sides."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    quarter = orders.filter(
        (F.col("o_orderdate") >= ntz_lit("1996-01-01"))
        & (F.col("o_orderdate") < ntz_lit("1996-04-01"))
    )
    late = quarter.join(
        li,
        (quarter.o_orderkey == li.l_orderkey) & (li.l_shipdate > quarter.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@graded(
    "q_tpch_q10_returns",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by returned-item revenue in a quarter.
    Dim joins broadcast; the orderBy+limit fuses to TakeOrderedAndProject
    so no global sort materializes (SURVEY.md §4 top-k row)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nat = load_table(spark, sf_dir, "nation")
    quarter = orders.filter(
        (F.col("o_orderdate") >= ntz_lit("1996-01-01"))
        & (F.col("o_orderdate") < ntz_lit("1996-04-01"))
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(quarter, li.l_orderkey == quarter.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@graded(
    "q_tpch_q13_custdist",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts, zeros
    included — a left outer join with a predicate on the *right* side
    (kept in the join condition, not a post-filter, so unmatched
    customers survive), then a double aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@graded(
    "q_tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_rev, 4) AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) with maximum quarterly revenue — a
    reused aggregate (TPC-H's view) compared against its own scalar max,
    decorrelated as a broadcast join against the one-row max."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= ntz_lit("1996-01-01"))
            & (F.col("l_shipdate") < ntz_lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("raw_rev"))
    )
    # Global-window max over the per-supplier aggregate (|suppliers|
    # rows through one single-partition exchange) instead of a second
    # agg subtree that re-plans the fact scan; max is order-exact so
    # the equality filter is unchanged.
    w = Window.partitionBy()
    return (
        rev.withColumn("mx", F.max("raw_rev").over(w))
        .filter(F.col("raw_rev") == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", F.round("raw_rev", 4).alias("total_rev"))
        .orderBy("s_suppkey")
    )


@graded(
    "q_tpch_q19_disjunctive",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 45 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive brand/size/quantity bands
    spanning both join sides. Catalyst extracts the common l_quantity and
    p_size bounds as pushed-down prefilters; the broadcast join keeps the
    disjunction a post-join filter without a shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def band(brand: str, lo_s: int, hi_s: int, lo_q: int, hi_q: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(lo_s, hi_s)
            & F.col("l_quantity").between(lo_q, hi_q)
        )

    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band("Brand#11", 1, 15, 1, 20) | band("Brand#22", 10, 30, 10, 30) | band("Brand#33", 20, 45, 20, 40))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@graded(
    "q_tpch_q20_nested_in",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 2800
    )
    ORDER BY s_suppkey
    """,
)
def q_tpch_q20_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: two-level nested IN — suppliers who shipped more than a
    threshold quantity of promo-type parts. Inner IN becomes a broadcast
    left-semi against the part filter; outer IN a left-semi against the
    HAVING aggregate. l_quantity is integer-valued so the double sum is
    exact and the threshold comparison deterministic cross-engine."""
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    qualified = (
        li.join(F.broadcast(promo), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("promo_qty"))
        .filter(F.col("promo_qty") > 2800)
    )
    return (
        sup.join(qualified, sup.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@graded(
    "q_tpch_q22_idle_balance",
    oracle="""
    WITH idle AS (
      SELECT substring(c_name, -2, 2) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
    )
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
    FROM idle
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q_tpch_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no recent orders,
    bucketed by a code carved out of a string column (last two digits of
    c_name standing in for TPC-H's phone country code). Scalar-subquery
    threshold broadcast + anti-join + string bucketing + re-aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= ntz_lit("2000-01-01"))
    idle = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        idle.select(F.substring("c_name", -2, 2).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@graded(
    "q_tpch_q3_shipping",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-30'
      AND l_shipdate  > TIMESTAMP '1997-06-30'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: top-10 unshipped orders by revenue for one market
    segment. Customer filters+broadcasts into orders, one fact shuffle
    on orderkey, TakeOrderedAndProject for the top-10 — the canonical
    'selective dim × big fact × top-k' plan.

    Revenue is exact integer CENTS (per-term floor, bigint sum — Q6's
    form): a graded double sum is accumulation-order-sensitive across
    engines/partitionings, and the top-10 cut makes a 4th-decimal flip
    a whole-row diff, not just a value diff."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ntz_lit("1997-06-30")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > ntz_lit("1997-06-30")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents")
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.desc("revenue_cents"), F.asc("o_orderdate"), F.asc("l_orderkey")
        )
        .limit(10)
    )


@graded(
    "q_tpch_q6_forecast",
    oracle="""
    SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: revenue-change forecast — a pure scan-filter-aggregate
    with every predicate pushable to the parquet scan. The revenue sum
    is emitted as exact integer CENTS (floor per term, then integer
    sum) because a GLOBAL double sum is accumulation-order-sensitive
    across engines and partition counts; per-term floor is identical
    IEEE math on both sides and the integer sum is exact.

    100 TB: zero joins, one map-side-combinable agg — the cheapest
    possible shape; throughput = scan bandwidth."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= ntz_lit("1996-01-01"))
        & (F.col("l_shipdate") < ntz_lit("1997-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@graded(
    "q_tpch_q18_large_volume",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS big_orderkey
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN big      ON o_orderkey = big_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: large-volume orders (total quantity > 300) with their
    customers — the HAVING-subquery-membership shape, hand-written as a
    semi-join against the aggregate (the decorrelation Catalyst performs
    on the IN form the oracle uses). l_quantity is integer-valued, so
    the graded sum is exact in doubles.

    100 TB: the `big` aggregate is map-side combinable and its result
    (qualifying orderkeys) is tiny → broadcast back against lineitem;
    one fact shuffle total on orderkey."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("big_orderkey"))
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


@graded(
    "q_tpch_q2_min_cost",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             min(CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT))
               AS unit_cost_cents
      FROM lineitem GROUP BY 1, 2
    ),
    rsupply AS (
      SELECT pk, sk, unit_cost_cents, s_name, s_acctbal, n_name
      FROM supply JOIN supplier ON sk = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ),
    best AS (SELECT pk AS bpk, min(unit_cost_cents) AS best_cost
             FROM rsupply GROUP BY pk)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost_cents
    FROM rsupply JOIN best ON pk = bpk AND unit_cost_cents = best_cost
    JOIN part ON pk = p_partkey
    WHERE p_type = 'PROMO' AND p_size <= 15
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20
    """,
)
def q_tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: minimum-cost supplier per part within a region — the
    correlated-min subquery, hand-decorrelated as agg + equality join
    back (what Catalyst produces from the subquery form the oracle
    uses). The fixture has no partsupp table, so the supply relation is
    derived from lineitem: unit cost = min observed price-per-unit per
    (part, supplier), floored to exact integer cents (min is
    accumulation-order-free; the floor makes the join-back equality
    exact across engines — a raw-double equality join would be the
    classic cross-engine trap).

    100 TB: the ASIA-supplier dim filter is applied BELOW the fact
    aggregation (broadcast join before groupBy), so the big (partkey,
    suppkey) agg only ingests the region's share of lineitem — the
    dim-filter-pushdown the optimizer can't do for us because the agg
    key includes the join key. The agg is map-side combinable;
    supplier⋈nation⋈region broadcast; `best` re-aggregates the reduced
    relation; the final equality join back never touches the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 15)
    )
    rsup = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # Semi-join keeps the pre-agg stream NARROW (pk, sk, price, qty —
    # the dim columns join AFTER the agg on the reduced relation);
    # attaching them before the agg was measured to ride ~11 MB of
    # functionally-redundant payload through the shuffle at sf0.1.
    supply = (
        li.join(
            F.broadcast(rsup.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") * 100 / F.col("l_quantity")).cast(
                    "bigint"
                )
            ).alias("unit_cost_cents")
        )
    )
    rsupply = supply.join(F.broadcast(rsup), F.col("sk") == rsup.s_suppkey).select(
        "pk", "sk", "unit_cost_cents", "s_name", "s_acctbal", "n_name"
    )
    best = rsupply.groupBy(F.col("pk").alias("bpk")).agg(
        F.min("unit_cost_cents").alias("best_cost")
    )
    return (
        rsupply.join(
            best,
            (F.col("pk") == F.col("bpk"))
            & (F.col("unit_cost_cents") == F.col("best_cost")),
        )
        .join(F.broadcast(part), F.col("pk") == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "unit_cost_cents",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(20)
    )


@graded(
    "q_tpch_q9_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
           CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                                - 0.6 * p_retailprice * l_quantity) * 100)
                         AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-line profit by supplier nation and year for a
    part-name pattern. The fixture has no partsupp.ps_supplycost, so
    cost is modeled as 0.6 × p_retailprice × quantity; profit is
    floored to exact integer cents per term (the graded sum of a
    float expression must not depend on accumulation order).

    100 TB: part (name-filtered) and supplier/nation broadcast; one
    fact shuffle on the group keys, map-side combinable agg."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            F.sum(F.floor(profit * 100).cast("bigint"))
            .cast("bigint")
            .alias("profit_cents")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@graded(
    "q_tpch_q12_late_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q_tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: order-priority mix among late shipments per class.
    The fixture lacks l_shipmode/l_commitdate/l_receiptdate, so "late"
    is ship-lag > 365 days vs the order date and the grouping class is
    l_returnflag — same join + conditional-count skeleton.

    100 TB: the shipdate year-window prunes the fact scan; the
    row-vs-row date predicate evaluates post-join but the join itself
    is an equi-join on orderkey; the agg output is |classes| rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ntz_lit("1996-01-01"))
        & (F.col("l_shipdate") < ntz_lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@graded(
    "q_tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: how many distinct suppliers serve each surviving
    (brand, type, size) bucket, excluding a supplier denylist — the
    NOT-IN-subquery shape, written as a broadcast anti-join (safe here:
    s_suppkey is never NULL, so NOT IN ≡ anti). The supply relation is
    lineitem pairs (no partsupp in the fixture); the denylist predicate
    is s_acctbal < 0 in place of the comment-pattern complaint filter.

    100 TB: part filter broadcasts; the denylist is tiny → broadcast
    anti-join, no shuffle added; count_distinct shuffles once on the
    3-key group."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    deny = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(deny), li.l_suppkey == deny.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
            F.asc("p_size"),
        )
    )


@graded(
    "q_tpch_q21_waiting",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 1700 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_sup,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_sup
      FROM l GROUP BY 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l JOIN per_order USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE late AND n_sup >= 2 AND n_late_sup = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finished order. The original's EXISTS / NOT EXISTS
    pair decorrelates to per-order counts — n_suppliers ≥ 2 (exists
    another supplier) and n_late_suppliers = 1 (no OTHER late supplier,
    given this row is late). "Late" is ship-lag > 1700 days (~p95 of
    the fixture's lag distribution; no commit/receipt dates here).

    The counts are WINDOW functions over l_orderkey, not an aggregate
    joined back: the agg+join-back form references the fact⋈orders join
    from two subtrees, and Spark plans it TWICE (measured: 14 exchanges
    / 26 MB shuffled at sf0.1 with broadcast disabled — the 100 TB
    regime, since orders-F is not broadcastable at scale; the window
    form re-plans to 6 exchanges / 10.7 MB because the join's orderkey
    hash partitioning already satisfies the window's required
    distribution — no second fact pass, no extra exchange; with
    broadcast on, 8→4 exchanges and 5.0→2.4 MB).
    size(collect_set(...)) is bounded by suppliers-per-order (≤13
    here), so window state is small."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")
    l = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 1700 DAY")
            ).alias("late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = l.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_sup"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_sup"),
    )
    return (
        flagged.filter(
            F.col("late") & (F.col("n_sup") >= 2) & (F.col("n_late_sup") == 1)
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
