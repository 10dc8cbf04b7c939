"""Pure-Python/numpy media codecs — the REAL decode paths.

The container ships no media libraries (PIL/ffmpeg/librosa), so
operators/multimodal.py stubs codec-dependent steps. These three formats,
however, need nothing beyond struct + numpy, so their decoders are real,
not stubs:

- WAV (RIFF/WAVE, PCM 8/16-bit): header walk over chunks, sample decode
  to numpy, canonical audio features (duration, RMS, peak, zero-crossing
  rate).
- BMP (BITMAPINFOHEADER, uncompressed 24/32-bit): pixel decode honoring
  4-byte row padding and bottom-up row order, per-channel means.
- PPM (P6 binary): whitespace/comment-tolerant header, raw RGB decode.

Each decoder is a pure ``bytes -> dict`` function so it drops into the
Arrow-batched mapInPandas plumbing unchanged (multimodal.audio_features /
image_features), and each has an ``encode_*`` inverse used by the
property tests to round-trip arbitrary numpy payloads.

Scale note: decoders run per-row inside executor Python workers over
Arrow batches; nothing here touches the driver. Feature outputs are small
typed columns, so everything downstream of decode shuffles cheaply.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# WAV (PCM)
# --------------------------------------------------------------------------
def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """Minimal RIFF/WAVE writer for PCM 8/16-bit; channels from shape.

    ``samples``: int array shaped (n,) mono or (n, ch).
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if bits == 16:
        payload = arr.astype("<i2").tobytes()
    elif bits == 8:
        payload = (arr.astype(np.int16) + 128).clip(0, 255).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> dict:
    """Real PCM decode: chunk walk, sample extraction, audio features.

    Returns sample_rate, n_channels, bits, n_samples, duration_s, and
    mono-mixed rms / peak / zero_crossing_rate. Raises ValueError on
    non-RIFF/WAVE or non-PCM payloads.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _, block, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"only PCM supported (audio format {audio_fmt})")
    if bits == 16:
        arr = np.frombuffer(payload, dtype="<i2").astype(np.float64)
    elif bits == 8:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if ch > 1:
        arr = arr[: len(arr) - len(arr) % ch].reshape(-1, ch).mean(axis=1)
    n = arr.size
    if n == 0:
        rms = peak = zcr = 0.0
    else:
        rms = float(np.sqrt(np.mean(arr**2)))
        peak = float(np.max(np.abs(arr)))
        zcr = float(np.mean(np.signbit(arr[1:]) != np.signbit(arr[:-1]))) if n > 1 else 0.0
    return {
        "sample_rate": int(rate),
        "n_channels": int(ch),
        "bits": int(bits),
        "n_samples": int(n),
        "duration_s": float(n / rate) if rate else 0.0,
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zcr,
    }


# --------------------------------------------------------------------------
# BMP (uncompressed 24/32-bit, BITMAPINFOHEADER)
# --------------------------------------------------------------------------
def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit BMP writer; ``pixels`` shaped (h, w, 3) uint8 RGB."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = px[y, :, ::-1].tobytes()
        rows.append(bgr + b"\x00" * pad)
    body = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return header + info + body


def decode_bmp(data: bytes) -> dict:
    """Real BMP decode: dimensions + per-channel means (uncompressed
    24/32-bit BITMAPINFOHEADER, top-down or bottom-up)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _, _, _, off) = struct.unpack_from("<2sIHHI", data, 0)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMPs unsupported")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if h_signed > 0:
        rows = rows[::-1]  # stored bottom-up -> top-down
    bgr = rows[:, :, :3].astype(np.float64)
    return {
        "width": int(w),
        "height": int(h),
        "bpp": int(bpp),
        "mean_r": float(bgr[:, :, 2].mean()),
        "mean_g": float(bgr[:, :, 1].mean()),
        "mean_b": float(bgr[:, :, 0].mean()),
    }


# --------------------------------------------------------------------------
# PPM (P6 binary)
# --------------------------------------------------------------------------
def encode_ppm(pixels: np.ndarray) -> bytes:
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(data: bytes) -> dict:
    """Real PPM (P6) decode: comment-tolerant header walk + raw RGB."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    rgb = px.reshape(h, w, 3).astype(np.float64)
    return {
        "width": int(w),
        "height": int(h),
        "bpp": 24,
        "mean_r": float(rgb[:, :, 0].mean()),
        "mean_g": float(rgb[:, :, 1].mean()),
        "mean_b": float(rgb[:, :, 2].mean()),
    }


def decode_image(data: bytes) -> dict:
    """Sniff-and-decode: BMP or PPM by magic bytes."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise ValueError("unsupported image format (BMP/P6-PPM supported)")
