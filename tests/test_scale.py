"""Scale-mechanism tests: bucketed co-located joins, salted aggregation
equivalence, two-phase grouped top-k, hot/cold replicated join, approx
aggregate sanity bounds."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.skew import replicated_broadcast_join, salted_agg
from noaa_etl_spark.operators.topk import grouped_topk, grouped_topk_twophase
from tests.conftest import SF_SMALL


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_avoids_shuffle(spark):
    """Tables bucketed+sorted on the join key must sort-merge join with
    zero Exchange nodes — the co-located join that makes repeated
    fact⋈fact joins affordable at 100 TB."""
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")

    # DROP TABLE alone is not enough: a fresh session's in-memory catalog
    # has no entry for a table whose warehouse dir survived the previous
    # session, so the write would fail with LOCATION_ALREADY_EXISTS.
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/b_orders", ignore_errors=True)
    shutil.rmtree(f"{warehouse}/b_lineitem", ignore_errors=True)
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle either side"
        # Row count must match the unbucketed join.
        expected = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_agg_equals_plain(spark):
    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "fv", F.floor("value").cast("bigint")
    )
    salted = salted_agg(
        ev,
        keys=["event_type"],
        aggs={"n": ("count", "event_id"), "s": ("sum", "fv"), "mn": ("min", "value"), "mx": ("max", "value")},
        salt_col="event_id",
        buckets=8,
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("fv").alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    s = {tuple(r) for r in salted.collect()}
    p = {tuple(r) for r in plain.collect()}
    assert s == p


def test_grouped_topk_twophase_equals_window(spark):
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    spec = [("o_totalprice", False), ("o_orderkey", True)]
    order_cols = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    baseline = grouped_topk(orders, ["o_custkey"], order_cols, k=3)
    twophase = grouped_topk_twophase(orders, ["o_custkey"], spec, k=3)
    b = {tuple(r) for r in baseline.collect()}
    t = {tuple(r) for r in twophase.collect()}
    assert b == t


def test_replicated_broadcast_join_equals_plain(spark):
    ev = load_table(spark, SF_SMALL, "events")
    users = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    )
    hot = [r["user_id"] for r in users.orderBy(F.desc("user_events")).limit(2).collect()]
    joined = replicated_broadcast_join(
        ev, users.withColumnRenamed("user_id", "u_id"), "user_id", "u_id", hot
    )
    plain = ev.join(
        users.withColumnRenamed("user_id", "u_id"), ev.user_id == F.col("u_id")
    )
    assert joined.count() == plain.count()
    assert sorted(joined.columns) == sorted(plain.columns)


def test_dynamic_partition_pruning(spark, tmp_dir):
    """A fact table partitioned on the join key must get a dynamic
    pruning filter injected into its scan when joined to a filtered
    dim — at 100 TB this skips whole partition directories at runtime."""
    import os

    fact_path = os.path.join(tmp_dir, "orders_by_year")
    orders = load_table(spark, SF_SMALL, "orders")
    (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [(1998, "target"), (1997, "other")], "order_year int, tag string"
    ).filter(F.col("tag") == "target")
    joined = fact.join(dim, "order_year").groupBy("tag").count()
    plan = _formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), f"no DPP in plan:\n{plan}"
    # And the result is correct: only 1998 orders counted.
    expected = orders.filter(F.year("o_orderdate") == 1998).count()
    got = {r["tag"]: r["count"] for r in joined.collect()}
    assert got == {"target": expected}


def test_approx_aggs_within_bounds(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    row = (
        li.agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
            F.count_distinct("l_orderkey").alias("exact"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("amed"),
            F.median("l_extendedprice").alias("emed"),
        )
        .collect()[0]
    )
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
    assert abs(row["amed"] - row["emed"]) / row["emed"] < 0.05


def test_grouped_topk_twophase_null_keys_and_order_values(spark):
    """Null GROUP keys are real groups and null ORDER values sort
    nulls-first under asc (Spark semantics) — the pandas prune pass must
    match both or rows the window rank would keep get pruned."""
    rows = [
        ("a", 1, 10.0), ("a", 2, None), ("a", 3, 5.0), ("a", 4, 1.0),
        (None, 5, 3.0), (None, 6, None), (None, 7, 9.0),
        ("b", 8, None), ("b", 9, None), ("b", 10, 2.0),
    ]
    df = spark.createDataFrame(rows, "grp string, id bigint, v double").repartition(4)
    spec = [("v", True), ("id", True)]
    order_cols = [F.col("v").asc(), F.col("id").asc()]  # asc => nulls first
    baseline = grouped_topk(df, ["grp"], order_cols, k=2)
    twophase = grouped_topk_twophase(df, ["grp"], spec, k=2)
    b = {tuple(r) for r in baseline.collect()}
    t = {tuple(r) for r in twophase.collect()}
    assert b == t
    assert any(r[0] is None for r in b), "null group key must survive"


def test_replicated_broadcast_join_left_keeps_null_keys(spark):
    """NULL fact keys never match, but a LEFT join must still keep the
    rows — the hot/cold split may not drop them."""
    fact = spark.createDataFrame(
        [(1, "x"), (2, "y"), (None, "z"), (None, "w"), (3, "v")],
        "k bigint, payload string",
    )
    dim = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "dk bigint, name string"
    )
    joined = replicated_broadcast_join(fact, dim, "k", "dk", hot_keys=[1], how="left")
    plain = fact.join(dim, fact.k == dim.dk, "left")
    assert {tuple(r) for r in joined.collect()} == {tuple(r) for r in plain.collect()}
    assert joined.filter(F.col("k").isNull()).count() == 2


def test_sessionize_bucketed_equals_plain(spark):
    """The (user, day)-bucketed skew form must produce byte-identical
    session assignments to the plain per-user window, including sessions
    that pause across midnight (merged by the stitch pass)."""
    from noaa_etl_spark.operators.sessionize import sessionize, sessionize_bucketed

    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "ts")
    # The fixture has no cross-midnight sessions, so inject a user whose
    # one session straddles two midnights (20-min spacing over 2 days)
    # plus a clean same-day break — the stitch pass must merge the
    # former and respect the latter.
    base = datetime(2024, 3, 1, 23, 10, 0)
    straddle = [
        (9_000_000 + i, 999_999, base + timedelta(minutes=20 * i)) for i in range(160)
    ]
    straddle.append((9_100_000, 999_999, base + timedelta(days=3)))
    # NULL-key hazard rows (the plain form keeps all of these): a NULL
    # user is a valid window partition; a NULL ts makes each such row its
    # own session (lag over NULL fires the isNull new-session rule). The
    # bucketed form must agree — its map-back join is null-safe.
    straddle += [
        (9_200_000, None, base + timedelta(minutes=5)),
        (9_200_001, None, base + timedelta(minutes=10)),  # same NULL-user session
        (9_200_002, None, base + timedelta(hours=10)),    # gap > 30min: new session
        (9_300_000, 999_998, None),                       # NULL-ts singleton
        (9_300_001, 999_998, None),                       # second NULL-ts singleton
        (9_300_002, 999_998, base),                       # real event after the NULLs
        (9_400_000, None, None),                          # both keys NULL
    ]
    extra = spark.createDataFrame(
        straddle, "event_id bigint, user_id bigint, ts timestamp_ntz"
    )
    ev = ev.unionByName(extra)

    plain_df = sessionize(ev, tiebreak_col="event_id")
    plain = {
        (r["user_id"], r["event_id"], r["session_id"]) for r in plain_df.collect()
    }
    bucketed = {
        (r["user_id"], r["event_id"], r["session_id"])
        for r in sessionize_bucketed(ev, tiebreak_col="event_id").collect()
    }
    assert bucketed == plain
    # Guard against vacuity: the injected user must have a multi-day
    # session AND more than one session overall.
    inj = (
        plain_df.filter(F.col("user_id") == 999_999)
        .groupBy("session_id")
        .agg(F.count_distinct(F.to_date("ts")).alias("n_days"))
        .collect()
    )
    assert max(r["n_days"] for r in inj) >= 3, "no multi-midnight session"
    assert len(inj) == 2, "same-day break not preserved"
    # Vacuity guards for the NULL-key rows: none may be dropped, the NULL
    # user must split on the 10h gap, and each NULL-ts row is a session.
    by_user = {}
    for u, eid, sid in plain:
        by_user.setdefault(u, {})[eid] = sid
    assert len(by_user[None]) == 4 and len(set(by_user[None].values())) >= 2
    u998 = by_user[999_998]
    assert len(u998) == 3 and len(set(u998.values())) == 3


def test_sessionize_auto_dispatch_and_equivalence(spark):
    """sessionize_auto picks the plain form under the skew threshold and
    the bucketed form above it, and both dispatches produce the plain
    form's exact output (the dispatch can change layout, never rows)."""
    from noaa_etl_spark.operators.sessionize import sessionize, sessionize_auto

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "ts")
    want = sorted(
        (r["event_id"], r["user_id"], r["session_id"])
        for r in sessionize(ev, tiebreak_col="event_id").collect()
    )
    # threshold far above fixture max -> plain path
    got_plain = sorted(
        (r["event_id"], r["user_id"], r["session_id"])
        for r in sessionize_auto(
            ev, tiebreak_col="event_id", skew_threshold=10**9
        ).collect()
    )
    # threshold 1 -> every user is "hot" -> bucketed path
    got_bucketed = sorted(
        (r["event_id"], r["user_id"], r["session_id"])
        for r in sessionize_auto(
            ev, tiebreak_col="event_id", skew_threshold=1
        ).collect()
    )
    assert got_plain == want
    assert got_bucketed == want
