"""ETL-load graded queries: merge/upsert and SCD2 dimension history
(SURVEY.md §1.1 'load' leg; operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.merge import merge_upsert, scd2_intervals
from noaa_etl_spark.registry import graded


@graded(
    "q_merge_upsert",
    oracle="""
    WITH source AS (
      SELECT c_custkey, 0.0 AS c_acctbal, 'RECOVERED' AS c_mktsegment
      FROM customer WHERE c_acctbal < 0
      UNION ALL
      SELECT c_custkey + 10000000 AS c_custkey, 100.0 AS c_acctbal,
             'NEW' AS c_mktsegment
      FROM customer WHERE c_custkey <= 5
    ),
    merged AS (
      SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM source)
      UNION ALL
      SELECT * FROM source
    )
    SELECT c_mktsegment,
           count(*)                                  AS n_rows,
           CAST(sum(floor(c_acctbal)) AS BIGINT)     AS floor_balance,
           min(c_custkey)                            AS min_key,
           max(c_custkey)                            AS max_key
    FROM merged
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replace-or-insert by key: negative-balance customers are replaced
    with zeroed 'RECOVERED' rows, plus five brand-new keys inserted —
    then summarized. The oracle replays the same merge relationally."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    updates = cust.filter(F.col("c_acctbal") < 0).select(
        "c_custkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("RECOVERED").alias("c_mktsegment"),
    )
    inserts = cust.filter(F.col("c_custkey") <= 5).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
        F.lit(100.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    merged = merge_upsert(cust, updates.unionByName(inserts), ["c_custkey"])
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.floor("c_acctbal").cast("bigint")).alias("floor_balance"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("c_mktsegment")
    )


@graded(
    "q_incremental_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*)                               AS n_rows,
           CAST(sum(floor(o_totalprice)) AS BIGINT) AS total,
           min(CAST(floor(o_totalprice) AS BIGINT)) AS min_value,
           max(CAST(floor(o_totalprice) AS BIGINT)) AS max_value,
           CAST(sum(floor(o_totalprice)) AS BIGINT) / count(*) AS avg_value
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: build aggregate state on the
    pre-1998 slice, fold in the 1998+ delta as a separate state, and
    finalize — the oracle recomputes from scratch, so the hash match
    proves fold(state(old), state(delta)) == full recompute."""
    from noaa_etl_spark.io import ntz_lit
    from noaa_etl_spark.operators.incremental import agg_state, finalize, merge_states

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderdate",
        F.floor("o_totalprice").cast("bigint").alias("fp"),
    )
    cutoff = ntz_lit("1998-01-01")
    old_state = agg_state(orders.filter(F.col("o_orderdate") < cutoff), ["o_orderpriority"], "fp")
    delta_state = agg_state(orders.filter(F.col("o_orderdate") >= cutoff), ["o_orderpriority"], "fp")
    merged = merge_states(old_state, delta_state)
    return finalize(merged.drop("o_orderdate", "fp")).orderBy("o_orderpriority")


@graded(
    "q_scd2_intervals",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'signup'
    )
    SELECT user_id, event_id,
           ts                                                    AS valid_from,
           lead(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM e
    ORDER BY user_id, valid_from, event_id
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 build: each signup event opens a validity interval
    closed by the user's next signup (NULL = current version)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    hist = scd2_intervals(
        ev.select("event_id", "user_id", "ts", "value"),
        keys=["user_id"],
        ts_col="ts",
        tiebreak="event_id",
    )
    return hist.select(
        "user_id", "event_id", "valid_from", "valid_to", "is_current"
    ).orderBy("user_id", "valid_from", "event_id")
