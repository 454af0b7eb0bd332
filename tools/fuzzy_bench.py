#!/usr/bin/env python
"""Scale probe for the blocked fuzzy self-join (operators/fuzzy.py):
how does the candidate space grow with catalog size, and how skewed is
gram occupancy — the operator's 100 TB risk is a hot gram whose
occupancy² dominates the candidate join.

Synthetic catalog: "adjective noun NNNN" product names (realistic
entity-resolution shape: templated vocabulary + numeric suffixes) plus
deterministic typo variants (one char dropped) so true matches exist at
every scale. At the smallest N the blocked result is checked equal to
the brute-force cross join; larger Ns run blocked-only and report the
candidate-count : N² ratio.

Usage: python tools/fuzzy_bench.py [N ...]   (default 3000 20000 50000)
Prints one JSON line; record results in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ADJS = ["small", "large", "red", "blue", "green", "cold", "old", "new",
        "hot", "bright", "dark", "heavy", "light", "quick", "slow"]
NOUNS = ["ring", "widget", "bolt", "gear", "gizmo", "plate", "anvil",
         "rod", "valve", "lever", "spring", "washer"]


def build_names(n: int) -> list[str]:
    """Open-vocabulary catalog (realistic entity-resolution shape): the
    suffix is a 5-char md5-derived code, so gram diversity GROWS with N
    and rare-gram occupancy stays bounded. A typo variant (one interior
    char dropped) every 7th entry provides true matches at every N."""
    import hashlib

    out = []
    i = 0
    while len(out) < n:
        code = hashlib.md5(f"name:{i}".encode()).hexdigest()[:5]
        base = f"{ADJS[i % len(ADJS)]} {NOUNS[(i // len(ADJS)) % len(NOUNS)]} {code}"
        out.append(base)
        if i % 7 == 0 and len(out) < n:
            k = 3 + (i % 5)
            out.append(base[:k] + base[k + 1:])  # one-char deletion
        i += 1
    return out[:n]


def build_templated_names(n: int) -> list[str]:
    """ADVERSARIAL closed-vocabulary catalog: zero-padded numeric
    suffixes over a 15×12 word template. Distinct (gram, occ) elements
    saturate (~300 total regardless of N), so ANY gram-based blocker's
    candidate space degenerates toward Σ occupancy² — and the data's
    true similar-groups (same template words, suffixes within 2 digit
    substitutions) are themselves Θ(group²) dense, so the cost is
    output-bound, not blocker overhead. Measured at small N only."""
    out = []
    i = 0
    while len(out) < n:
        base = f"{ADJS[i % len(ADJS)]} {NOUNS[(i // len(ADJS)) % len(NOUNS)]} {i:05d}"
        out.append(base)
        if i % 7 == 0 and len(out) < n:
            k = 3 + (i % 5)
            out.append(base[:k] + base[k + 1:])
        i += 1
    return out[:n]


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [3000, 20000, 50000]
    from pyspark.sql import functions as F

    from noaa_etl_spark.operators.fuzzy import (
        _positional_qgrams,
        fuzzy_self_join,
    )
    from noaa_etl_spark.session import get_spark

    spark = get_spark("fuzzy_bench")
    spark.sparkContext.setLogLevel("ERROR")

    result = {"sizes": {}}
    for n in sizes:
        names = build_names(n)
        df = spark.createDataFrame([(x,) for x in names], "key string").cache()
        df.count()

        # raw gram occupancy profile (what a naive inverted index faces)
        occ = (
            _positional_qgrams(df.distinct(), "key", 2)
            .groupBy("gram")
            .count()
            .agg(
                F.max("count").alias("max_occ"),
                F.expr("percentile_approx(count, 0.99)").alias("p99_occ"),
                F.count(F.lit(1)).alias("n_grams"),
            )
            .collect()[0]
        )

        t0 = time.perf_counter()
        pairs = fuzzy_self_join(df, "key", max_dist=2)
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0

        entry = {
            "n_names": n,
            "n_pairs": n_pairs,
            "wall_sec": round(wall, 2),
            "max_gram_occ": int(occ["max_occ"]),
            "p99_gram_occ": int(occ["p99_occ"]),
            "n_distinct_grams": int(occ["n_grams"]),
        }

        if n <= 3000:  # brute-force equality check at the small size
            a = df.select(F.col("key").alias("name_a"))
            b = df.select(F.col("key").alias("name_b"))
            brute = (
                a.join(b, F.col("name_a") < F.col("name_b"))
                .withColumn("dist", F.levenshtein("name_a", "name_b"))
                .filter(F.col("dist") <= 2)
            )
            bset = {tuple(r) for r in brute.collect()}
            pset = {tuple(r) for r in pairs.collect()}
            entry["brute_equal"] = bset == pset
        df.unpersist()
        result["sizes"][str(n)] = entry
        print(json.dumps({n: entry}), flush=True)

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
