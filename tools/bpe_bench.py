#!/usr/bin/env python
"""BPE training-path probe: driver-local dict training vs the
distributed per-round fold loop, on the 10× corpus (tools/scaling.py's
builder). Confirms (a) both paths emit identical merge sequences at
scale and (b) the cost asymmetry that justifies the local-path default
(the distributed loop pays ~3 jobs/round of scheduling; the local path
pays one collect of the vocabulary).

Usage: python tools/bpe_bench.py [N] [n_merges]
Prints one JSON line; record results in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.bpe import train_bpe
from noaa_etl_spark.session import get_spark
from tools.scaling import build


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("bpe_bench")
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, n)

    docs = load_table(spark, big, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != "")
    words = (
        docs.select(F.explode(ws).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    vocab = words.count()

    t0 = time.time()
    local = train_bpe(words, n_merges)
    t_local = time.time() - t0

    t0 = time.time()
    dist = train_bpe(words, n_merges, local_vocab_cap=0)
    t_dist = time.time() - t0

    print(
        json.dumps(
            {
                "n": n,
                "n_merges": n_merges,
                "vocab": vocab,
                "local_sec": round(t_local, 3),
                "distributed_sec": round(t_dist, 3),
                "paths_equal": local == dist,
            }
        )
    )


if __name__ == "__main__":
    main()
