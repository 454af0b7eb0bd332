#!/usr/bin/env python
"""MinHash band-join payload study at sf0.1: slim (ids-only band join,
grams re-attached per candidate pair) vs fat (grams carried through the
banded explode+self-join), plus banding recall against the exact
shared-shingle n-gram Jaccard pairs.

Results are recorded in SCALING.md §minhash-banding. The fat variant is
reconstructed inline here (it is the round-1 shape) so the comparison
stays reproducible after the operator changed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from noaa_etl_spark.io import load_table  # noqa: E402
from noaa_etl_spark.functions.text import ngrams, tokenize  # noqa: E402
from noaa_etl_spark.operators.dedup import (  # noqa: E402
    _minhash_signature,
    jaccard,
    minhash_lsh_candidates,
)
from noaa_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESH = 0.5


def fat_candidates(df, shingle_n=3, num_perm=32, bands=8):
    """Round-1 shape: grams ride through the banded explode and the
    band self-join (bands× payload replication through the shuffle)."""
    rows_per_band = num_perm // bands
    grams = F.array_distinct(ngrams(tokenize(F.col("text")), shingle_n))
    sig = df.select(
        F.col("doc_id").alias("id"), grams.alias("grams"),
        *_minhash_signature(grams, num_perm),
    ).filter(F.size("grams") > 0)
    band_keys = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("key"),
        )
        for b in range(bands)
    ])
    banded = sig.select("id", "grams", F.explode(band_keys).alias("bk"))
    left = banded.select(F.col("bk").alias("bk"), F.col("id").alias("id_a"), F.col("grams").alias("grams_a"))
    right = banded.select(F.col("bk").alias("bk2"), F.col("id").alias("id_b"), F.col("grams").alias("grams_b"))
    pairs = (
        left.join(right, (left.bk == right.bk2) & (left.id_a < right.id_b))
        .select("id_a", "id_b", "grams_a", "grams_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.select("id_a", "id_b", jaccard(F.col("grams_a"), F.col("grams_b")).alias("jaccard_sim"))


def exact_pairs(df, shingle_n=3, thresh=THRESH):
    """Ground truth: inverted-index blocked exact n-gram Jaccard."""
    toks = tokenize(F.col("text"))
    grams_df = df.filter(F.size(toks) >= shingle_n).select(
        "doc_id", F.array_distinct(ngrams(toks, shingle_n)).alias("grams")
    )
    exploded = grams_df.select("doc_id", F.explode("grams").alias("g"))
    sizes = grams_df.select("doc_id", F.size("grams").alias("n"))
    a = exploded.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = exploded.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    inter = (
        a.join(b, (F.col("ga") == F.col("gb")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn("j", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("j") >= thresh)
        .select("id_a", "id_b")
    )


def timed(label, df):
    t0 = time.perf_counter()
    rows = df.collect()
    dt = time.perf_counter() - t0
    print(f"{label}: {len(rows)} rows in {dt:.2f}s", flush=True)
    return rows, dt


def main():
    spark = get_spark("minhash-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    for fn, label in [(fat_candidates, "fat"), (minhash_lsh_candidates, "slim")]:
        fn(docs).count()  # warm-up
    results = {}
    for fn, label in [(fat_candidates, "fat"), (minhash_lsh_candidates, "slim")]:
        rows, dt = timed(f"candidates[{label}]", fn(docs))
        results[label] = ({(r["id_a"], r["id_b"]) for r in rows if r["jaccard_sim"] >= THRESH}, dt)

    assert results["fat"][0] == results["slim"][0], "variants must find identical pairs"

    truth, _ = timed("exact", exact_pairs(docs))
    truth_set = {(r["id_a"], r["id_b"]) for r in truth}
    found = results["slim"][0]
    recall = len(found & truth_set) / max(len(truth_set), 1)
    print(f"banding recall @ jaccard>={THRESH}: {recall:.4f} "
          f"({len(found & truth_set)}/{len(truth_set)}; lsh-found {len(found)})")
    print(f"wall: fat {results['fat'][1]:.2f}s  slim {results['slim'][1]:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
