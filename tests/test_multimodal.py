"""Multimodal plumbing tests: binary payload attachment is covered by
the oracle-paired queries (q_multimodal_meta / q_frame_sample); this
module covers the large-file byte-range path — manifest shape, ranged
reads matching whole-file slices, and parallelism beyond file count."""

from __future__ import annotations

import os

from noaa_etl_spark.operators.multimodal import (
    _byte_histogram_features,
    frame_manifest,
    read_frame_ranges,
)

FRAME = 100


def _write_blobs(tmp_dir):
    """3 files with sizes that exercise the tail-frame arithmetic."""
    blobs = {}
    for i, size in enumerate([250, 300, 99]):
        payload = bytes((i * 37 + j) % 256 for j in range(size))
        path = os.path.join(tmp_dir, f"clip_{i}.bin")
        with open(path, "wb") as f:
            f.write(payload)
        blobs[f"file:{path}"] = payload
    return blobs


def test_frame_manifest_shape(spark, tmp_dir):
    blobs = _write_blobs(tmp_dir)
    m = frame_manifest(spark, tmp_dir, glob="*.bin", frame_bytes=FRAME)
    rows = m.collect()
    # 250 -> 3 frames (100,100,50); 300 -> 3; 99 -> 1.
    assert len(rows) == 7
    by_uri: dict = {}
    for r in rows:
        by_uri.setdefault(r["uri"], []).append(r)
    for uri, payload in blobs.items():
        frames = sorted(by_uri[uri], key=lambda r: r["frame_idx"])
        assert [r["byte_offset"] for r in frames] == [
            i * FRAME for i in range(len(frames))
        ]
        assert sum(r["n_bytes"] for r in frames) == len(payload)
        assert all(r["n_bytes"] == FRAME for r in frames[:-1])
        assert frames[-1]["n_bytes"] == len(payload) - (len(frames) - 1) * FRAME


def test_read_frame_ranges_matches_whole_file_slices(spark, tmp_dir):
    """Each ranged read must featurize exactly the bytes the whole-file
    slice would — the deferred-I/O path loses nothing."""
    blobs = _write_blobs(tmp_dir)
    m = frame_manifest(spark, tmp_dir, glob="*.bin", frame_bytes=FRAME)
    out = read_frame_ranges(m.repartition(8)).collect()
    assert len(out) == 7
    for r in out:
        payload = blobs[r["uri"]]
        sl = payload[r["byte_offset"]: r["byte_offset"] + FRAME]
        assert r["features"] == _byte_histogram_features(sl)


def test_manifest_parallelism_exceeds_file_count(spark, tmp_dir):
    """The point of the manifest: a 3-file input can fan out to 8+
    tasks, which binaryFile whole-file ingest can never do."""
    _write_blobs(tmp_dir)
    m = frame_manifest(spark, tmp_dir, glob="*.bin", frame_bytes=50)
    fanned = m.repartition(8)
    assert fanned.rdd.getNumPartitions() == 8
    assert read_frame_ranges(fanned).count() == m.count()
