#!/usr/bin/env python
"""Salted vs plain shuffle join under a synthetic celebrity key.

25% of lineitem rows remap to ONE supplier key (the q_skew_join_salted
hot-key synth) at the 10x replica set; both forms pin shuffle_hash
(big x big by design) and are timed with a consuming aggregate. AQE is
left ON (engine default) so the plain form gets every mitigation the
runtime offers — the salted win is what remains AFTER AQE.

Usage: python tools/skew_join_bench.py [n]
Prints one JSON line; record in SCALING.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.skew import salted_shuffle_join
from noaa_etl_spark.session import get_spark
from tools.scaling import build


def make_sides(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    hot = (
        F.substring(
            F.md5(
                F.concat(
                    F.lit("skj:"),
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            1,
        )
        < "4"
    )
    fact = li.select(
        F.when(hot, F.lit(1)).otherwise(F.col("l_suppkey")).alias("k"),
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    build_side = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    return fact, build_side


def consume(df):
    return df.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
    )


def timed(mk, runs=3):
    mk().collect()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        mk().collect()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("skew_join_bench")
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, n)
    fact, build_side = make_sides(spark, big)

    def plain():
        f = fact
        # same physical family as the salted form, minus the salt; the
        # hint rides the build side (hashing the fact side dies on the
        # hot partition — see salted_shuffle_join docstring)
        return consume(
            f.join(
                build_side.hint("shuffle_hash"),
                f["k"] == build_side["s_suppkey"],
            )
        )

    def salted():
        return consume(
            salted_shuffle_join(
                fact, build_side, fact_key="k", build_key="s_suppkey",
                salt_col="l_orderkey",
            )
        )

    t_plain = timed(plain)
    t_salted = timed(salted)
    print(
        json.dumps(
            {
                "n": n,
                "load_avg_1m": round(os.getloadavg()[0], 2),
                "plain_sec": round(t_plain, 2),
                "salted_sec": round(t_salted, 2),
                "salted_over_plain": round(t_salted / t_plain, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
