#!/usr/bin/env python
"""Parquet bloom-filter data skipping: the point-lookup complement to
z-order/min-max range skipping.

Min-max row-group stats prune RANGE predicates on clustered layouts
(tools/zorder_bench.py); they are useless for EQUALITY lookups on a
high-cardinality key in arrival order, where every row group spans
~the whole key domain. Parquet bloom filters fill exactly that hole:
the writer embeds a split-block bloom per row group, and the reader
drops row groups whose bloom rejects the literal — no data pages read.
(Parquet's other point mechanism — dictionary-page pruning — dies
precisely when the key cardinality overflows the dictionary, which is
the regime benched here: PLAIN-encoded keys.)

Two measured shapes, absent-key lookup (the common case for id joins /
existence probes — bloom's guarantee is one-sided, absent is where it
prunes) and present-key lookup, each over bloom-on vs bloom-off copies
of the same rows with a ~100-byte payload column selected (vectorized
readers decode all selected columns per batch, so skipping saves
payload decode too, not just the key column).

Usage: python tools/bloom_parquet_bench.py [n_rows]   (default 16M)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noaa_etl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".tmp", "bloom_parquet_bench")

KEY_DOMAIN = 1 << 40  # high-cardinality: overflows any dictionary


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    spark = get_spark("bloom-parquet-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)

    df = spark.range(n_rows).select(
        F.pmod(F.xxhash64("id"), F.lit(KEY_DOMAIN)).alias("k"),
        F.col("id").alias("v"),
        F.concat(F.lit("payload-" * 12), F.col("id")).alias("payload"),
    )
    # one known-present key, fetched before writing
    present = df.select("k").limit(1).collect()[0].k

    paths = {}
    for name, opts in [
        ("nobloom", {}),
        (
            "bloom",
            {
                "parquet.bloom.filter.enabled#k": "true",
                f"parquet.bloom.filter.expected.ndv#k": str(n_rows),
            },
        ),
    ]:
        path = os.path.join(OUT, name)
        w = df.write
        for key, val in opts.items():
            w = w.option(key, val)
        w.option("maxRecordsPerFile", n_rows // 16).parquet(path)
        paths[name] = path

    def lookup(path, key):
        def run():
            return (
                spark.read.parquet(path)
                .filter(F.col("k") == key)
                .select("v", "payload")
                .collect()
            )

        run()  # warm
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            rows = run()
            walls.append(time.perf_counter() - t0)
        return round(statistics.median(walls), 4), len(rows)

    result = {"n_rows": n_rows, "layouts": {}}
    for name, path in paths.items():
        absent_sec, absent_n = lookup(path, -1)  # pmod output is non-negative
        present_sec, present_n = lookup(path, present)
        result["layouts"][name] = {
            "absent_key_sec": absent_sec,
            "present_key_sec": present_sec,
            "present_rows": present_n,
        }
        assert absent_n == 0
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
