"""Subquery surface (SURVEY.md §4 'subquery decorrelation'): correlated
and scalar subqueries through the SQL entry point. Catalyst rewrites
each into joins/aggregates — asserted by the absence of per-row
re-execution in the plans (subqueries become joins, so these scale like
their §2.C/2.D equivalents).

Oracle SQL is near-identical (both dialects are ANSI here); only the
timestamp literal syntax differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_etl_spark.io import register_views
from noaa_etl_spark.registry import graded


@graded(
    "q_correlated_min",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p
    WHERE p_retailprice = (
      SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    ORDER BY p_brand, p_partkey
    """,
)
def q_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style correlated aggregate subquery: cheapest part per
    brand. Decorrelates into an aggregate + join (one shuffle)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part p
        WHERE p_retailprice = (
          SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
        )
        ORDER BY p_brand, p_partkey
        """
    )


@graded(
    "q_scalar_subquery",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_above_avg
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style uncorrelated scalar subquery: customers above the
    positive-balance average. The scalar subquery evaluates once and
    broadcasts into the filter."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_above_avg
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@graded(
    "q_in_subquery_agg",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    ORDER BY o_orderkey
    """,
)
def q_in_subquery_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style IN over an aggregated subquery (large-quantity
    orders). Rewrites to a semi-join against the aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        )
        ORDER BY o_orderkey
        """
    )


@graded(
    "q_double_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l1 WHERE l1.l_suppkey = s.s_suppkey AND l1.l_quantity > 45
    )
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l2 WHERE l2.l_suppkey = s.s_suppkey AND l2.l_quantity > 45 AND l2.l_discount > 0.09
    )
    ORDER BY s_suppkey
    """,
)
def q_double_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style EXISTS + NOT EXISTS pair on the same fact —
    decorrelates into one semi- and one anti-join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l1 WHERE l1.l_suppkey = s.s_suppkey AND l1.l_quantity > 45
        )
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l2 WHERE l2.l_suppkey = s.s_suppkey AND l2.l_quantity > 45 AND l2.l_discount > 0.09
        )
        ORDER BY s_suppkey
        """
    )


@graded(
    "q_lateral_join",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (
           SELECT o_orderkey, o_totalprice
           FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 2
         ) t
    WHERE c.c_custkey <= 200
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
)
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: top-2 orders per customer as a
    lateral top-k (the SQL twin of the per-group top-k window form)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
             LATERAL (
               SELECT o_orderkey, o_totalprice
               FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               LIMIT 2
             ) t
        WHERE c.c_custkey <= 200
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


@graded(
    "q_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE r AS (
        SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
        FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, r.root, r.depth + 1
        FROM customer c JOIN r ON c.c_custkey // 10 = r.node
        WHERE c.c_custkey >= 10
    )
    SELECT root,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(max(depth) AS INT)  AS max_depth,
           CAST(sum(depth) AS BIGINT) AS total_depth
    FROM r
    GROUP BY root
    ORDER BY root
    """,
)
def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy resolution — the WITH RECURSIVE capability
    Spark lacks natively (operators/hierarchy.py). The customer keys
    form a deterministic decimal forest (parent = key // 10, roots are
    the single-digit keys); every node is resolved to its root and
    depth by POINTER DOUBLING, then rolled up per root (subtree size,
    max/total depth). The oracle is DuckDB's actual recursive CTE over
    the same parenting rule, so the graded artifact is transitive-
    closure correctness, not arithmetic.

    100 TB: O(log depth) self-join rounds (each one shuffle on the
    ancestor key) versus O(depth) for naive parent-following or a
    recursive-CTE executor's per-level iteration; per-round
    localCheckpoint cuts lineage exactly like connected_components.
    Termination is a ROUND-count driver loop (log-depth few), never a
    row-wise collect.
    """
    from noaa_etl_spark.io import load_table
    from noaa_etl_spark.operators.hierarchy import resolve_roots

    cust = load_table(spark, sf_dir, "customer")
    nodes = cust.select(
        F.col("c_custkey").alias("node"),
        F.when(F.col("c_custkey") < 10, F.lit(None).cast("bigint"))
        .otherwise(F.expr("c_custkey div 10"))
        .alias("parent"),
    )
    resolved = resolve_roots(nodes)
    return (
        resolved.groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.max("depth").cast("int").alias("max_depth"),
            F.sum("depth").alias("total_depth"),
        )
        .orderBy("root")
    )
