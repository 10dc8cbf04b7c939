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


# --------------------------------------------------------------------------
# PNG (8-bit depth; gray / RGB / palette / gray+alpha / RGBA; interlace 0)
# --------------------------------------------------------------------------
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channel count per PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels: np.ndarray, filter_type: str = "none") -> bytes:
    """Minimal PNG writer (stdlib zlib): 8-bit gray (h, w), RGB (h, w, 3)
    or RGBA (h, w, 4) from the array shape, non-interlaced.

    ``filter_type`` picks the per-row filter — none/sub/up/average/paeth,
    or "mixed" (row index mod 5) — so the property tests can round-trip
    every unfilter branch of ``decode_png``, not just filter 0.
    """
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        ct, nch = 0, 1
        px = px[:, :, None]
    elif px.shape[2] == 3:
        ct, nch = 2, 3
    elif px.shape[2] == 4:
        ct, nch = 6, 4
    else:
        raise ValueError("pixels must be (h,w), (h,w,3) or (h,w,4) uint8")
    h, w = px.shape[:2]
    names = ["none", "sub", "up", "average", "paeth"]
    flat = px.reshape(h, w * nch).astype(np.int32)
    zero = np.zeros(w * nch, dtype=np.int32)
    out = []
    for y in range(h):
        cur = flat[y]
        up = flat[y - 1] if y else zero
        f = (y % 5) if filter_type == "mixed" else names.index(filter_type)
        left = np.concatenate([zero[:nch], cur[:-nch]])
        ul = np.concatenate([zero[:nch], up[:-nch]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - up
        elif f == 3:
            filt = cur - (left + up) // 2
        else:
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, up, ul)],
                dtype=np.int32,
            )
            filt = cur - pred
        out.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
    raw = b"".join(out)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> dict:
    """Real PNG decode on stdlib zlib: chunk walk with CRC verification,
    IDAT inflate, per-row unfiltering (None/Sub/Up/Average/Paeth), all
    five 8-bit color types (palette via PLTE), non-interlaced. Returns
    the same feature dict shape as ``decode_bmp``; alpha channels are
    excluded from the channel means, gray images report the gray mean on
    all three. Raises ValueError on malformed payloads (caller maps to
    errors-as-data).

    Scale note: Sub unfiltering is a per-lane cumulative sum (vectorized
    mod-256 numpy); Average/Paeth are inherently sequential in the left
    neighbor, so those rows fall back to a per-byte loop — fine for
    feature extraction, swap in a C codec for pixel-serving workloads.
    """
    import zlib

    if data[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_MAGIC)
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + size)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ct, comp, filt_method, interlace = ihdr
    if depth != 8 or comp != 0 or filt_method != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, compression={comp})")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if ct not in _PNG_CHANNELS:
        raise ValueError(f"unknown color type {ct}")
    nch = _PNG_CHANNELS[ct]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")
    recon = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        up = recon[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            rec = row
        elif f == 1:
            # recon[i] = raw[i] + recon[i-nch]: per-lane prefix sum mod 256
            lanes = row.reshape(w, nch)
            rec = np.cumsum(lanes, axis=0, dtype=np.int64).reshape(stride)
        elif f == 2:
            rec = row + up
        elif f in (3, 4):
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                # the left neighbor must be the RECONSTRUCTED byte
                # (mod 256), not the running unmodded sum
                a = int(rec[i - nch]) & 0xFF if i >= nch else 0
                b = int(up[i])
                if f == 3:
                    rec[i] = (row[i] + (a + b) // 2) & 0xFF
                else:
                    c = int(up[i - nch]) if i >= nch else 0
                    rec[i] = (row[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {f} in row {y}")
        recon[y] = rec % 256
    px = recon.reshape(h, w, nch)
    if ct == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        rgb = plte[px[:, :, 0]].astype(np.float64)
    elif ct in (0, 4):
        g = px[:, :, 0].astype(np.float64)
        rgb = np.stack([g, g, g], axis=2)
    else:
        rgb = px[:, :, :3].astype(np.float64)
    return {
        "width": int(w),
        "height": int(h),
        "bpp": int(nch * 8),
        "mean_r": float(rgb[:, :, 0].mean()),
        "mean_g": float(rgb[:, :, 1].mean()),
        "mean_b": float(rgb[:, :, 2].mean()),
    }


def decode_image(data: bytes) -> dict:
    """Sniff-and-decode: BMP, P6 PPM, or PNG by magic bytes."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return decode_png(data)
    raise ValueError("unsupported image format (BMP/P6-PPM/PNG supported)")
