#!/usr/bin/env python
"""Graph-operator scale probe: connected components and PageRank on a
deterministic G(n, m) random graph (m = 2n ⇒ one giant component —
the adversarial case for label propagation), with a driver-side
union-find verification of the CC labeling.

Usage: python tools/graph_bench.py [n_edges] [--verify]
Prints one JSON line; record results in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.operators.graph import connected_components, pagerank
from noaa_etl_spark.session import get_spark


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    verify = "--verify" in sys.argv
    n_nodes = n_edges // 2
    spark = get_spark("graph_bench")
    spark.sparkContext.setLogLevel("ERROR")

    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.lit("a"), F.col("id")), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.lit("b"), F.col("id")), F.lit(n_nodes)).alias("dst"),
    )

    t0 = time.time()
    labels = connected_components(edges).persist()
    sizes = labels.groupBy("component").count()
    stats = sizes.agg(
        F.count(F.lit(1)).alias("n_components"),
        F.max("count").alias("giant"),
        F.sum("count").alias("n_nodes"),
    ).collect()[0]
    t_cc = time.time() - t0

    exact = None
    if verify:
        got = {r["node"]: r["component"] for r in labels.collect()}
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.collect():
            ra, rb = find(r["src"]), find(r["dst"])
            if ra != rb:
                parent[ra] = rb
        roots: dict[int, int] = {}
        for n in parent:
            root = find(n)
            roots[root] = min(roots.get(root, n), n)
        exact = got == {n: roots[find(n)] for n in parent}
    labels.unpersist()

    t0 = time.time()
    ranks = pagerank(edges, n_iter=10)
    mass = ranks.agg(F.sum("rank").alias("s")).collect()[0]["s"]
    t_pr = time.time() - t0

    print(
        json.dumps(
            {
                "edges": n_edges,
                "nodes": int(stats.n_nodes),
                "components": int(stats.n_components),
                "giant_component": int(stats.giant),
                "cc_sec": round(t_cc, 1),
                "cc_exact_vs_union_find": exact,
                "pagerank_sec": round(t_pr, 1),
                "pagerank_mass_error": round(abs(mass - stats.n_nodes) / stats.n_nodes, 12),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
