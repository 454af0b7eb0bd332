#!/usr/bin/env python
"""Scaling probe for the round-4 operators (chunking, PII scrub, int8
quantization, decontamination): time each at sf0.1 and at the Nx
replicated dataset (tools/scaling.py's builder) and report the marginal
ratio. Narrow-only plans should scale ~linearly in rows (ratio ≈ N once
fixed per-job overhead is amortized); decontamination additionally
exercises the broadcast-side growth (benchmark grams scale with corpus
here — in production the benchmark side is fixed).

Usage: python tools/newops_scaling.py [N] [query ...]
(default N=10 over NEW_OPS; pass query names to probe a different set —
e.g. the round-5 TPC-H completions)
Prints one JSON line; record results in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noaa_etl_spark.queries import QUERIES
from noaa_etl_spark.registry import load_all_queries
from noaa_etl_spark.session import get_spark
from tools.scaling import BASE_SF, build, timed

NEW_OPS = [
    "q_chunk_documents",
    "q_pii_scrub",
    "q_quantize_int8",
    "q_decontaminate",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ops = sys.argv[2:] or NEW_OPS
    load_all_queries()
    spark = get_spark("newops_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, n)

    result = {"n": n, "queries": {}}
    for name in ops:
        t1 = timed(QUERIES[name], spark, BASE_SF)
        tn = timed(QUERIES[name], spark, big)
        result["queries"][name] = {
            "sec_1x": round(t1, 3),
            f"sec_{n}x": round(tn, 3),
            "ratio": round(tn / t1, 2),
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
