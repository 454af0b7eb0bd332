"""Dynamic partition overwrite (q_partition_overwrite's write path):
file-level proof that only the targeted partition is rewritten."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def _files(path):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
    }


def test_dynamic_overwrite_touches_only_target_partition(spark, tmp_dir):
    path = f"{tmp_dir}/dyn"
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", float(i)) for i in range(100)],
        "k bigint, part string, v double",
    )
    df.write.mode("overwrite").partitionBy("part").parquet(path)
    before = _files(path)
    assert any("part=A" in f for f in before) and any("part=B" in f for f in before)

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.filter(F.col("part") == "A").withColumn(
            "v", F.col("v") * 2
        ).write.mode("overwrite").partitionBy("part").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    after = _files(path)
    b_before = {f: t for f, t in before.items() if "part=B" in f}
    b_after = {f: t for f, t in after.items() if "part=B" in f}
    assert b_after == b_before  # B's files byte-untouched (same paths+mtimes)
    assert set(f for f in after if "part=A" in f).isdisjoint(before)  # A rewritten

    back = spark.read.parquet(path)
    assert back.filter("part = 'A'").agg(F.sum("v")).collect()[0][0] == sum(
        2.0 * i for i in range(100) if i % 2
    )
    assert back.filter("part = 'B'").agg(F.sum("v")).collect()[0][0] == sum(
        float(i) for i in range(100) if not i % 2
    )
