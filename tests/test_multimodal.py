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


# --- pure-numpy codecs (operators/codecs.py) ---------------------------


def test_bmp_roundtrip_including_row_padding():
    """Encode→decode must be identity for widths whose 3·W is not a
    multiple of 4 (rows 1..3 pad bytes) and for W≡0 (no padding)."""
    import numpy as np

    from noaa_etl_spark.operators.codecs import decode_bmp, encode_bmp

    for w in (1, 2, 3, 4, 5, 7, 16):
        for h in (1, 2, 5):
            rng = np.arange(h * w * 3, dtype=np.int64) * 37 % 256
            img = rng.reshape(h, w, 3).astype(np.uint8)
            assert (decode_bmp(encode_bmp(img)) == img).all(), (w, h)


def test_bmp_golden_bytes_decode():
    """Decode a hand-assembled spec-literal BMP (2×2, known pixels) —
    catches a symmetric encode+decode misread that round-trips clean.
    Layout: bottom-up rows, B,G,R order, rows padded 6→8 bytes."""
    import numpy as np

    from noaa_etl_spark.operators.codecs import decode_bmp

    # pixels: top row = red, green ; bottom row = blue, white
    bottom_row = bytes([255, 0, 0,   255, 255, 255]) + b"\x00\x00"  # B,G,R!
    top_row = bytes([0, 0, 255,   0, 255, 0]) + b"\x00\x00"
    body = bottom_row + top_row  # bottom-up
    header = b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4 + (54).to_bytes(4, "little")
    info = (
        (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)   # width
        + (2).to_bytes(4, "little", signed=True)   # height (positive = bottom-up)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    img = decode_bmp(header + info + body)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]],        # top: red, green
         [[0, 0, 255], [255, 255, 255]]],   # bottom: blue, white
        dtype=np.uint8,
    )
    assert (img == expect).all()


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from noaa_etl_spark.operators.codecs import decode_ppm, encode_ppm

    img = (np.arange(5 * 3 * 3) % 256).astype(np.uint8).reshape(5, 3, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # spec allows comments anywhere in the header
    commented = b"P6\n# a comment\n3 5\n# another\n255\n" + img.tobytes()
    assert (decode_ppm(commented) == img).all()


def test_wav_roundtrip_stereo_and_extra_chunk():
    import numpy as np

    from noaa_etl_spark.operators.codecs import decode_wav, encode_wav

    mono = (np.arange(300) * 211 % 65536 - 32768).astype(np.int16)
    got, rate = decode_wav(encode_wav(mono, 8_000))
    assert rate == 8_000 and (got[:, 0] == mono).all()

    stereo = np.stack([mono, mono[::-1]], axis=1)
    got, rate = decode_wav(encode_wav(stereo, 44_100))
    assert rate == 44_100 and got.shape == (300, 2) and (got == stereo).all()

    # chunk walker must skip an unknown chunk before data
    payload = encode_wav(mono, 8_000)
    riff, rest = payload[:12], payload[12:]
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    patched = riff[:4] + (len(rest) + len(extra) + 4).to_bytes(4, "little") + riff[8:12] + extra + rest
    got, rate = decode_wav(patched)
    assert (got[:, 0] == mono).all()


def test_decode_media_dispatch_and_env_gate():
    import numpy as np
    import pytest

    from noaa_etl_spark.operators.codecs import decode_media, encode_bmp, encode_ppm, encode_wav

    img = (np.arange(2 * 2 * 3) % 256).astype(np.uint8).reshape(2, 2, 3)
    assert decode_media(encode_bmp(img)).shape == (2, 2, 3)
    assert decode_media(encode_ppm(img)).shape == (2, 2, 3)
    arr, _ = decode_media(encode_wav(np.zeros(4, dtype=np.int16)))
    assert arr.shape == (4, 1)
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\n....")


def test_resize_nearest_floor_rule_and_identity():
    """Top-left-anchor floor rule: integer factors are exact stride
    slices; identity resize returns the image unchanged; non-integer
    ratios pick floor(r*H/out_h) source rows."""
    import numpy as np

    from noaa_etl_spark.operators.codecs import resize_nearest

    img = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    # identity
    assert (resize_nearest(img, 12, 16) == img).all()
    # 2x downsample == even-index slice
    assert (resize_nearest(img, 6, 8) == img[::2, ::2]).all()
    # non-integer: 12->5 rows pick floor(r*12/5) = 0,2,4,7,9
    got = resize_nearest(img, 5, 16)
    assert (got == img[[0, 2, 4, 7, 9]]).all()
    # upsample 2x repeats each source pixel twice
    up = resize_nearest(img, 24, 32)
    assert (up[::2, ::2] == img).all() and (up[1::2, 1::2] == img).all()
