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


def test_retention_vacuum_survivors_byte_untouched(spark, tmp_dir):
    """The vacuum must DELETE expired partition dirs and leave every
    surviving partition's files byte-identical (size + mtime + content
    hash) — a vacuum that rewrites survivors silently breaks
    downstream incremental readers keyed on file identity."""
    import datetime as dt
    import hashlib
    import shutil

    path = f"{tmp_dir}/vacuum"
    rows = [
        (i, (dt.date(2024, 1, 1) + dt.timedelta(days=i % 20)).isoformat(), i * 1.5)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k bigint, d_str string, v double").select(
        "k", F.to_date("d_str").alias("d"), "v"
    )
    df.write.mode("overwrite").partitionBy("d").parquet(path)

    def snap(p):
        out = {}
        for f, m in _files(p).items():
            with open(f, "rb") as fh:
                out[f] = (m, os.path.getsize(f), hashlib.md5(fh.read()).hexdigest())
        return out

    before = snap(path)
    days = sorted(
        dt.date.fromisoformat(e.split("=", 1)[1])
        for e in os.listdir(path)
        if e.startswith("d=")
    )
    keep_from = days[-1] - dt.timedelta(days=13)
    expired = [d for d in days if d < keep_from]
    assert expired, "fixture must have expired partitions"
    for day in expired:
        shutil.rmtree(os.path.join(path, f"d={day.isoformat()}"))

    after = snap(path)
    # survivors byte-identical
    survivors = {f: v for f, v in before.items() if not any(
        f"d={d.isoformat()}/" in f or f"d={d.isoformat()}{os.sep}" in f for d in expired
    )}
    assert after == survivors
    # read-back sees exactly the surviving days
    back_days = {
        r["d"] for r in spark.read.parquet(path).select("d").distinct().collect()
    }
    assert back_days == {d for d in days if d >= keep_from}
