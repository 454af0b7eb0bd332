#!/usr/bin/env python
"""Multimodal ingest benchmark: synthetic binary blobs → binaryFile
reader → mapInPandas featurizer, across input-partition sizings.

The question at 100 TB of media is ingest shape, not decode speed (the
decoder here is the deterministic byte-histogram stand-in): how many
blobs per task, and does `spark.sql.files.maxPartitionBytes` pack small
files into sanely-sized partitions? binaryFile packs many small files
per partition up to maxPartitionBytes; each mapInPandas task then
streams its files through Arrow batches.

Results recorded in SCALING.md §multimodal-ingest.

Usage: python tools/multimodal_bench.py [n_blobs] [blob_kb]
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLOB_DIR = os.path.join(REPO, ".tmp", "multimodal_blobs")


def make_blobs(n: int, kb: int) -> int:
    """Deterministic pseudo-random blobs (sha256 counter stream)."""
    shutil.rmtree(BLOB_DIR, ignore_errors=True)
    os.makedirs(BLOB_DIR)
    total = 0
    for i in range(n):
        chunks = []
        need = kb * 1024
        ctr = 0
        while need > 0:
            h = hashlib.sha256(f"{i}:{ctr}".encode()).digest()
            chunks.append(h)
            need -= len(h)
            ctr += 1
        blob = b"".join(chunks)[: kb * 1024]
        with open(os.path.join(BLOB_DIR, f"blob_{i:06d}.bin"), "wb") as f:
            f.write(blob)
        total += len(blob)
    return total


def main() -> None:
    n_blobs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    blob_kb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    total = make_blobs(n_blobs, blob_kb)
    print(f"blobs: {n_blobs} x {blob_kb} KB = {total / 1e6:.1f} MB")

    from pyspark.sql import functions as F

    from noaa_etl_spark.operators.multimodal import featurize, read_binary_dir
    from noaa_etl_spark.session import get_spark

    spark = get_spark("multimodal-bench")
    spark.sparkContext.setLogLevel("ERROR")

    for max_part_mb in (4, 32, 128):
        spark.conf.set("spark.sql.files.maxPartitionBytes", f"{max_part_mb}m")
        raw = read_binary_dir(spark, BLOB_DIR, glob="*.bin").select(
            F.xxhash64("path").alias("doc_id"), F.col("content").alias("payload")
        )
        parts = raw.rdd.getNumPartitions()
        feats = featurize(raw)
        feats.count()  # warm-up
        t0 = time.perf_counter()
        n = feats.count()
        dt = time.perf_counter() - t0
        print(
            f"maxPartitionBytes={max_part_mb:>3}m: {parts:>3} partitions, "
            f"{n} blobs featurized in {dt:.2f}s "
            f"({total / 1e6 / dt:.0f} MB/s)"
        )

    # Video-like leg: a few LARGE files. binaryFile never splits a file,
    # so ingest parallelism == file count no matter what
    # maxPartitionBytes says; frame-sampling then re-establishes
    # parallelism by exploding to per-frame rows and repartitioning.
    n_big, big_mb = 8, 16
    total_big = make_blobs(n_big, big_mb * 1024)
    print(f"\nbig blobs: {n_big} x {big_mb} MB = {total_big / 1e6:.0f} MB")
    from noaa_etl_spark.operators.multimodal import sample_frames

    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    raw = read_binary_dir(spark, BLOB_DIR, glob="*.bin").select(
        F.xxhash64("path").alias("doc_id"), F.col("content").alias("payload")
    )
    print(
        f"ingest partitions at maxPartitionBytes=4m: {raw.rdd.getNumPartitions()} "
        f"(== file count: binaryFile does not split large files)"
    )
    frames = sample_frames(raw, every_n_bytes=256 * 1024)
    for label, fdf in [
        ("frames as-ingested", frames),
        ("frames repartitioned", frames.repartition(32, "doc_id", "frame_idx")),
    ]:
        fdf.count()
        t0 = time.perf_counter()
        n = fdf.count()
        print(f"{label}: {n} frame rows, {fdf.rdd.getNumPartitions()} partitions, "
              f"{time.perf_counter() - t0:.2f}s")

    # Ranged-read leg: the documented alternative, now implemented —
    # (uri, offset, length) manifest + ranged reads inside mapInPandas.
    # Same featurize work as whole-file ingest (byte histograms over all
    # bytes), but parallelism is set by the MANIFEST repartition, not the
    # file count.
    from noaa_etl_spark.operators.multimodal import (
        featurize as _featurize,
        frame_manifest,
        read_frame_ranges,
    )

    whole = _featurize(raw)
    whole.count()  # warm-up
    t0 = time.perf_counter()
    whole.count()
    t_whole = time.perf_counter() - t0

    manifest = frame_manifest(
        spark, BLOB_DIR, glob="*.bin", frame_bytes=256 * 1024
    ).repartition(32)
    ranged = read_frame_ranges(manifest)
    ranged.count()  # warm-up
    t0 = time.perf_counter()
    n_frame_rows = ranged.count()
    t_ranged = time.perf_counter() - t0
    print(
        f"whole-file featurize ({raw.rdd.getNumPartitions()}-way, file-bound): {t_whole:.2f}s\n"
        f"ranged featurize, {n_frame_rows} frames (32-way): {t_ranged:.2f}s "
        f"→ {t_whole / t_ranged:.2f}x"
    )

    spark.stop()
    shutil.rmtree(BLOB_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
