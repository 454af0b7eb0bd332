"""Heavy hitters: the MG two-phase path must equal the exact form, and
the per-partition sketch must honor the superset guarantee on data
engineered to stress it (many distinct cold keys drowning few hot ones).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.heavy_hitters import (
    exact_heavy_hitters,
    heavy_hitters_mg,
    mg_candidates,
)
from tests.conftest import SF_DIR


def _skewed(spark, n_rows=200_000, n_hot=5, hot_share=0.30):
    """hot_share of rows over n_hot keys, the rest over ~50k cold keys —
    deterministic (hash-derived, no RNG)."""
    df = spark.range(n_rows)
    return df.select(
        F.when(
            F.col("id") % 100 < int(hot_share * 100),
            F.concat(F.lit("hot-"), (F.col("id") % n_hot).cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("cold-"),
                F.pmod(F.xxhash64("id"), F.lit(50_000)).cast("string"),
            )
        )
        .alias("key")
    )


def test_mg_equals_exact_on_fixture_words(spark):
    docs = load_table(spark, SF_DIR, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    for frac in (0.002, 0.01, 0.03):
        exact = {
            (r.word, r.n_key) for r in exact_heavy_hitters(words, "word", frac).collect()
        }
        mg = {(r.word, r.n_key) for r in heavy_hitters_mg(words, "word", frac).collect()}
        assert mg == exact, frac
        assert exact  # non-trivial at these thresholds


def test_mg_equals_exact_under_cold_key_flood(spark):
    """50k distinct cold keys vs 5 hot keys at 6% each: the regime the
    sketch exists for. Two-phase result identical to exact."""
    df = _skewed(spark)
    exact = {(r.key, r.n_key) for r in exact_heavy_hitters(df, "key", 0.05).collect()}
    mg = {(r.key, r.n_key) for r in heavy_hitters_mg(df, "key", 0.05).collect()}
    assert mg == exact
    assert len(exact) == 5  # exactly the engineered hot keys
    assert all(k.startswith("hot-") for k, _ in exact)


def test_mg_candidates_are_superset_and_bounded(spark):
    df = _skewed(spark)
    frac = 0.05
    cands = {r.key for r in mg_candidates(df, "key", frac).collect()}
    true_hh = {r.key for r in exact_heavy_hitters(df, "key", frac).collect()}
    assert true_hh <= cands
    # bounded: ≤ partitions × (k+1), with k = max(8, ceil(1/frac)) = 20
    n_parts = df.rdd.getNumPartitions()
    assert len(cands) <= n_parts * 21


def test_stream_mg_sketch_matches_batch_on_fixture(spark):
    """Streaming twin: with the fixture vocabulary (31 words) inside
    sketch capacity (K=32) the per-shard sketches must be EXACT —
    err_bound 0 and approx_count equal to the batch groupBy truth. The
    undercount bound under capacity pressure is exercised by the batch
    MG tests above (same merge rule, same code shape)."""
    from noaa_etl_spark.queries import QUERIES

    rows = QUERIES["q_stream_heavy_hitters"](spark, SF_DIR).collect()
    assert rows
    assert all(r.err_bound == 0 for r in rows)
    docs = load_table(spark, SF_DIR, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    truth = {r.word: r.n for r in words.groupBy("word").agg(F.count("*").alias("n")).collect()}
    got = {r.word: r.approx_count for r in rows}
    assert got == truth


def test_kmv_merge_equals_global_and_estimate_sane(spark):
    """KMV min-k merge theorem: the min-k of the union of per-part
    min-k sketches equals the global min-k EXACTLY (the global k
    smallest distinct hashes are contained in every cover's per-part
    k smallest). Also bounds the estimator: rse = 1/sqrt(k-2) ~ 12.7%
    at k=64; assert within 4 sigma of exact."""
    from noaa_etl_spark.queries.scale import KMV_K, kmv_hash

    orders = load_table(spark, SF_DIR, "orders")
    v = orders.select(
        F.pmod(F.col("o_orderkey"), F.lit(2)).alias("half"),
        kmv_hash(F.col("o_custkey")).alias("v"),
    )
    global_k = sorted(
        r["v"]
        for r in v.select("v").dropDuplicates(["v"]).orderBy("v").limit(KMV_K).collect()
    )
    part_union: set = set()
    for h in (0, 1):
        part_union |= {
            r["v"]
            for r in v.filter(F.col("half") == h)
            .select("v")
            .dropDuplicates(["v"])
            .orderBy("v")
            .limit(KMV_K)
            .collect()
        }
    merged = sorted(part_union)[:KMV_K]
    assert merged == global_k

    exact = orders.select("o_custkey").distinct().count()
    est = (KMV_K - 1) * float(2**48) / global_k[-1]
    assert abs(est - exact) / exact < 4 / (KMV_K - 2) ** 0.5, (est, exact)
