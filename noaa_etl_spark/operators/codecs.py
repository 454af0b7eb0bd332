"""Pure-numpy codecs for UNCOMPRESSED media formats (BMP / PPM / WAV).

De-stubs the multimodal decode path without new dependencies: these
formats are byte-layout specs, not compression algorithms, so a
self-contained decoder is exact and auditable. Compressed formats
(JPEG/PNG/MP3) still require a real media library and raise a clear
error — that is an environment gate, not a stub (decode for the
formats this module CAN express is fully real and round-trip tested).

Layout references (public specs):
- BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), 24-bit
  BI_RGB, rows bottom-up, each row padded to 4 bytes, pixels B,G,R.
- PPM: ASCII header ``P6 <w> <h> <maxval>\\n`` + raw R,G,B bytes.
- WAV: RIFF container, ``fmt `` chunk (PCM), ``data`` chunk of
  little-endian int16 samples, channel-interleaved.
"""

from __future__ import annotations

import struct

import numpy as np


# --- BMP (24-bit uncompressed) ------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (rows bottom-up,
    4-byte row padding, B,G,R pixel order)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    padded_row = row_bytes + pad
    pixel_bytes = padded_row * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    bgr = rgb[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    body = np.zeros((h, padded_row), dtype=np.uint8)
    body[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + info + body.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    header_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP is supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    flip = h > 0  # positive height ⇒ bottom-up row order
    h = abs(h)
    padded_row = (w * 3 + 3) // 4 * 4
    body = np.frombuffer(payload, dtype=np.uint8, count=padded_row * h, offset=off)
    rows = body.reshape(h, padded_row)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR → RGB
    return (rgb[::-1] if flip else rgb).copy()


# --- PPM (P6 binary) ------------------------------------------------------


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → binary P6 PPM bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_ppm expects (H, W, 3) uint8")
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + rgb.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM bytes → (H, W, 3) uint8 RGB. Handles comment
    lines and arbitrary whitespace in the header, per spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3).copy()


# --- WAV (PCM int16) ------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) or (n, channels) int16 samples → PCM WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → ((n, channels) int16 array, sample_rate).
    Walks RIFF chunks, so extra chunks (LIST/INFO) are skipped."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, ch, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", payload, pos)
            (bits,) = struct.unpack_from("<H", payload, pos + 14)
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = payload[pos : pos + size]
        pos += size + (size % 2)  # chunks are word-aligned
    if ch is None or data is None:
        raise ValueError("missing fmt/data chunk")
    arr = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return arr.copy(), rate


# --- Dispatch -------------------------------------------------------------


def decode_media(payload: bytes):
    """Magic-byte dispatch over the supported uncompressed formats.
    Returns an (H, W, 3) uint8 array for images or
    ((n, ch) int16, rate) for audio."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "compressed formats (JPEG/PNG/MP3/...) require a media library "
        "absent from this environment; BMP/PPM/WAV decode natively"
    )


def resize_nearest(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (top-left anchor: source pixel
    floor(r·H/out_h), floor(k·W/out_w)) — the deterministic integer
    resize used by the multimodal feature pipeline. For integer
    downsample factors this is exact stride slicing; non-integer
    ratios follow the same floor rule."""
    h, w = rgb.shape[0], rgb.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return rgb[rows][:, cols]


def resample_linear(samples: np.ndarray, p: int, q: int) -> np.ndarray:
    """Integer-exact linear-interpolation resample: output j reads the
    source at position j·p/q (step p/q source samples per output
    sample; p=8, q=3 converts 16 kHz to 6 kHz). With k = (j·p) div q
    and r = (j·p) mod q, the interpolated value is the FLOOR of the
    exact rational ((q−r)·v[k] + r·v[k+1]) / q — all arithmetic in
    int64, floor division (never truncation: samples are signed), so
    any engine can replay it bit-for-bit in closed form. Output length
    = ((n−1)·q) div p + 1 (every j whose source position lies inside
    the signal); when the position lands exactly on the last sample,
    r = 0 and the v[k+1] term vanishes, so the clamped index never
    contributes."""
    v = samples.astype(np.int64)
    n = v.shape[0]
    if n == 0:
        return v
    n_out = ((n - 1) * q) // p + 1
    j = np.arange(n_out, dtype=np.int64)
    pos = j * p
    k = pos // q
    r = pos - k * q
    kp1 = np.minimum(k + 1, n - 1)
    num = (q - r) * v[k] + r * v[kp1]
    return np.floor_divide(num, q)
