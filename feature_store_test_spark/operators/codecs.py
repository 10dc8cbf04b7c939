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
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
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


def _png_rgb_safe(data: bytes):
    import zlib

    try:
        return _png_rgb(data)
    except (IndexError, KeyError, struct.error, zlib.error) as e:
        raise ValueError(f"malformed PNG: {e}") from e


def _png_rgb(data: bytes):
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
    return rgb, nch


def decode_png(data: bytes) -> dict:
    """Feature-dict wrapper over ``_png_rgb`` — see the module pattern:
    every image decoder exposes pixels (``image_pixels``) and features.
    Malformed chunk structure surfaces as ValueError (errors as data)."""
    rgb, nch = _png_rgb_safe(data)
    h, w = rgb.shape[:2]
    return {
        "width": int(w),
        "height": int(h),
        "bpp": int(nch * 8),
        "mean_r": float(rgb[:, :, 0].mean()),
        "mean_g": float(rgb[:, :, 1].mean()),
        "mean_b": float(rgb[:, :, 2].mean()),
    }


def decode_image(data: bytes) -> dict:
    """Sniff-and-decode: BMP, P6 PPM, PNG, or baseline JPEG by magic."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    raise ValueError("unsupported image format (BMP/P6-PPM/PNG/JPEG supported)")


# --------------------------------------------------------------------------
# JPEG (baseline sequential DCT, 8-bit, grayscale / YCbCr 4:4:4)
# --------------------------------------------------------------------------
# The encoder emits CUSTOM canonical Huffman tables built from the actual
# symbol frequencies and carries them in DHT segments (any valid prefix
# code is legal JPEG — the decoder must build its codes from the stream's
# DHT, exactly like decoding a third-party file), and a deterministic
# quality-scaled quantization table via DQT. No subsampling (4:4:4), no
# progressive, no restart markers — the baseline core.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    C = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    C[0] *= np.sqrt(0.5)
    return C * 0.5  # orthonormal: block_dct = C @ B @ C.T


def _quant_table(quality: int) -> np.ndarray:
    """Deterministic radial-ramp quantization table scaled by quality
    (1-100, libjpeg-style scaling). Any table is valid JPEG — it rides
    in the DQT segment."""
    i, j = np.mgrid[0:8, 0:8]
    base = 8.0 + 2.0 * (i + j)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255).astype(np.int32)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _canonical_code(freqs: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman code (symbol -> (code, length)), max length 16,
    no all-ones code of max length (JPEG reserves it). Package-merge is
    overkill for <=256 symbols: build by frequency-sorted length
    assignment — give every symbol the same length L = ceil(log2(n+1))
    (the +1 keeps the all-ones codeword unused). Suboptimal compression,
    dead-simple and always valid; compactness is not this codec's job."""
    syms = sorted(freqs)
    n = len(syms)
    L = max(1, (n + 1 - 1).bit_length())  # 2^L >= n+1
    return {s: (i, L) for i, s in enumerate(syms)}


def _dht_segment(table_class: int, table_id: int, code: dict[int, tuple[int, int]]) -> bytes:
    counts = [0] * 17
    by_len: dict[int, list[tuple[int, int]]] = {}
    for sym, (c, ln) in code.items():
        counts[ln] += 1
        by_len.setdefault(ln, []).append((c, sym))
    vals = bytearray()
    for ln in range(1, 17):
        for _, sym in sorted(by_len.get(ln, [])):
            vals.append(sym)
    body = bytes([(table_class << 4) | table_id]) + bytes(counts[1:]) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(pixels: np.ndarray, quality: int = 85) -> bytes:
    """Baseline JPEG writer: grayscale (h, w) or RGB (h, w, 3) uint8 →
    SOI/DQT/SOF0/DHT/SOS stream with 4:4:4 sampling, custom canonical
    Huffman tables and a quality-scaled DQT. Lossy by quantization only
    (the DCT is orthonormal); ``decode_jpeg`` inverts it within the
    quantization error bound the tests assert."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        channels = [px.astype(np.float64)]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        channels = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    q = _quant_table(quality)
    C = _dct_matrix()
    H8, W8 = -(-h // 8) * 8, -(-w // 8) * 8
    # per channel: DCT+quantize all blocks, then symbol streams
    comp_blocks = []
    for ch in channels:
        padded = np.pad(ch, ((0, H8 - h), (0, W8 - w)), mode="edge") - 128.0
        blocks = []
        for by in range(0, H8, 8):
            for bx in range(0, W8, 8):
                B = padded[by : by + 8, bx : bx + 8]
                coef = C @ B @ C.T
                qc = np.rint(coef / q).astype(np.int32)
                blocks.append(qc.flatten()[_ZIGZAG])
        comp_blocks.append(blocks)

    # per-component, per-block symbol lists (DC prediction is tracked per
    # component); a multi-component baseline scan is MCU-INTERLEAVED, so
    # emission below walks block positions outer, components inner
    def symbols_per_block(blocks):
        out = []
        prev = 0
        for zz in blocks:
            syms = [("dc", int(zz[0]) - prev)]
            prev = int(zz[0])
            run = 0
            last_nz = max(np.nonzero(zz[1:])[0]) + 1 if np.any(zz[1:]) else 0
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    if run == 16:
                        syms.append(("ac", (0xF0, 0)))
                        run = 0
                else:
                    syms.append(("ac", ((run << 4) | _category(v), v)))
                    run = 0
            if last_nz < 63:
                syms.append(("ac", (0x00, 0)))
            out.append(syms)
        return out

    comp_syms = [symbols_per_block(blocks) for blocks in comp_blocks]
    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}
    for cs in comp_syms:
        for syms in cs:
            for kind, payload in syms:
                if kind == "dc":
                    s = _category(payload)
                    dc_freq[s] = dc_freq.get(s, 0) + 1
                else:
                    ac_freq[payload[0]] = ac_freq.get(payload[0], 0) + 1
    dc_code = _canonical_code(dc_freq)
    ac_code = _canonical_code(ac_freq)

    bw = _BitWriter()
    n_blocks = len(comp_blocks[0])
    for bi in range(n_blocks):
        for cs in comp_syms:
            for kind, payload in cs[bi]:
                if kind == "dc":
                    s = _category(payload)
                    c, ln = dc_code[s]
                    bw.write(c, ln)
                    if s:
                        v = payload if payload > 0 else payload + (1 << s) - 1
                        bw.write(v, s)
                else:
                    rs, v = payload
                    c, ln = ac_code[rs]
                    bw.write(c, ln)
                    s = rs & 0x0F
                    if s:
                        vv = v if v > 0 else v + (1 << s) - 1
                        bw.write(vv, s)
    entropy = bw.flush()

    nc = 1 if gray else 3
    out = bytearray(b"\xff\xd8")  # SOI
    zz_q = q.flatten()[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in zz_q
    )  # DQT id 0
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])  # 1x1 sampling, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_code) + _dht_segment(1, 0, ac_code)
    sos = bytes([nc])
    for cid in range(1, nc + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy + b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 1  # skip stuffed zero
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.read_bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> dict:
    """Real baseline JPEG decode: marker walk, DQT/DHT/SOF0/SOS parse,
    Huffman entropy decode (tables built from the stream's DHT),
    dequantize, inverse zigzag, IDCT, YCbCr→RGB. Supports 8-bit baseline
    with 1x1 sampling (4:4:4 or grayscale); rejects progressive,
    subsampled, or arithmetic-coded streams with ValueError (errors as
    data at the pipeline layer). Output dict matches the other image
    decoders."""
    rgb, nplanes = _jpeg_rgb(data)
    h, w = rgb.shape[:2]
    return {
        "width": int(w),
        "height": int(h),
        "bpp": int(8 * nplanes),
        "mean_r": float(rgb[:, :, 0].mean()),
        "mean_g": float(rgb[:, :, 1].mean()),
        "mean_b": float(rgb[:, :, 2].mean()),
    }


def _decode_jpeg(data: bytes) -> dict:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    entropy_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = body[p + 1 : p + 17]
                p += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for ln in range(1, 17):
                    for _ in range(counts[ln - 1]):
                        table[(ln, code)] = body[p]
                        p += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            hh, ww = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq))
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            frame = (hh, ww, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDA:  # SOS
            nc = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(nc)]
            entropy_start = pos + 2 + seglen
            break
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        pos += 2 + seglen
    if frame is None or scan is None or entropy_start is None:
        raise ValueError("missing SOF0/SOS segment")
    h, w, comps = frame
    # entropy data runs until EOI (stuffed 0xFF00 handled by the reader)
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    reader = _BitReader(data[entropy_start:end])

    def decode_huff(table) -> int:
        ln, code = 0, 0
        while ln < 16:
            code = (code << 1) | reader.read_bit()
            ln += 1
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("invalid Huffman code in entropy stream")

    C = _dct_matrix()
    H8, W8 = -(-h // 8) * 8, -(-w // 8) * 8
    n_blocks_y, n_blocks_x = H8 // 8, W8 // 8
    planes = [np.zeros((H8, W8), dtype=np.float64) for _ in comps]
    preds = [0] * len(comps)
    for by in range(n_blocks_y):
        for bx in range(n_blocks_x):
            for ci, ((cid, tq), (scid, tids)) in enumerate(zip(comps, scan)):
                dc_tbl = huff.get((0, tids >> 4))
                ac_tbl = huff.get((1, tids & 0x0F))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("scan references missing Huffman table")
                zz = np.zeros(64, dtype=np.int64)
                s = decode_huff(dc_tbl)
                preds[ci] += _receive_extend(reader, s)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = decode_huff(ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if rs == 0xF0:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _receive_extend(reader, s)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIGZAG] = zz
                deq = coef.reshape(8, 8) * qt[tq]
                block = C.T @ deq @ C + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        g = np.clip(planes[0], 0, 255)
        rgb = np.stack([g, g, g], axis=2)
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    return rgb, len(planes)


def _jpeg_rgb(data: bytes):
    """Pixel form of ``decode_jpeg`` with the same error wrapping."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"malformed JPEG: {e}") from e


# --------------------------------------------------------------------------
# Video: Y4M (YUV4MPEG2, raw 4:4:4 frames) and AVI-MJPEG (RIFF container,
# one baseline JPEG per frame — decoded by decode_jpeg above). Both are
# real public formats parseable with stdlib+numpy alone; modern
# inter-frame codecs (H.264 etc.) remain out of scope without external
# libraries and are the one stubbed surface left in decode_media.
# --------------------------------------------------------------------------
def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    return np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """YUV4MPEG2 writer: ``frames`` uint8 (n, h, w, 3) RGB or (n, h, w)
    gray → C444 planar full-range YCbCr frames (JFIF matrix; noted in
    the XJFIF param — Y4M's C tag carries the layout, the range rides as
    an extension param)."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim == 3:
        fr = np.stack([fr, fr, fr], axis=-1)
    n, h, w, _ = fr.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444 XJFIF\n".encode()
    out = bytearray(header)
    for i in range(n):
        ycc = np.clip(np.rint(_rgb_to_ycbcr(fr[i].astype(np.float64))), 0, 255)
        planes = ycc.astype(np.uint8)
        out += b"FRAME\n"
        for c in range(3):  # planar Y, Cb, Cr
            out += planes[:, :, c].tobytes()
    return bytes(out)


def _y4m_parse_header(data: bytes) -> tuple[dict, int]:
    end = data.find(b"\n")
    if not data.startswith(b"YUV4MPEG2") or end < 0:
        raise ValueError("not a YUV4MPEG2 payload")
    params: dict[str, str] = {}
    for tok in data[10:end].split(b" "):
        if tok:
            params[chr(tok[0])] = tok[1:].decode()
    if params.get("C", "420jpeg") != "444":
        raise ValueError("only C444 Y4M supported")
    if "W" not in params or "H" not in params:
        raise ValueError("Y4M header missing W/H")
    try:
        int(params["W"]), int(params["H"])
    except ValueError as e:
        raise ValueError(f"bad Y4M dimensions: {e}") from e
    return params, end + 1


def y4m_frames(data: bytes):
    """Yield (h, w, 3) uint8 RGB frames from a C444 Y4M stream."""
    params, pos = _y4m_parse_header(data)
    w, h = int(params["W"]), int(params["H"])
    plane = w * h
    while pos < len(data):
        line_end = data.find(b"\n", pos)
        if line_end < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt FRAME marker")
        pos = line_end + 1
        if pos + 3 * plane > len(data):
            raise ValueError("truncated Y4M frame")
        ycc = np.stack(
            [
                np.frombuffer(data, np.uint8, plane, pos + c * plane).reshape(h, w)
                for c in range(3)
            ],
            axis=-1,
        ).astype(np.float64)
        pos += 3 * plane
        yield np.clip(np.rint(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)


def decode_y4m(data: bytes) -> dict:
    """Real Y4M decode: header parse + per-frame plane extraction +
    YCbCr→RGB; aggregates frame means. Raises ValueError on non-Y4M or
    truncated streams."""
    params, _ = _y4m_parse_header(data)
    w, h = int(params["W"]), int(params["H"])
    num, den = (params.get("F", "25:1").split(":") + ["1"])[:2]
    fps = float(num) / float(den)
    n = 0
    sums = np.zeros(3)
    for fr in y4m_frames(data):
        sums += fr.reshape(-1, 3).mean(axis=0)
        n += 1
    if n == 0:
        raise ValueError("Y4M stream contains no frames")
    means = sums / n
    return {
        "container": "y4m",
        "width": int(w),
        "height": int(h),
        "n_frames": int(n),
        "fps": float(fps),
        "duration_s": float(n / fps) if fps else 0.0,
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Minimal AVI (RIFF) writer for an MJPEG stream: hdrl(avih +
    strl(strh/strf)) + movi LIST of 00dc chunks, one baseline JPEG per
    frame (e.g. from ``encode_jpeg``)."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    n = len(jpeg_frames)
    usec = int(1_000_000 / fps) if fps else 0
    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _avi_walk(data: bytes) -> tuple[float, list[bytes]]:
    """RIFF chunk walk shared by the feature and frame paths: returns
    (fps, per-frame JPEG byte slices from 00dc/00db chunks)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    fps = 0.0
    jpegs: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if tag == b"LIST":
                walk(body_start + 4, body_start + size)
            elif tag == b"avih":
                (usec,) = struct.unpack_from("<I", data, body_start)
                fps = 1_000_000 / usec if usec else 0.0
            elif tag in (b"00dc", b"00db"):
                jpegs.append(data[body_start : body_start + size])
            pos = body_start + size + (size & 1)

    try:
        walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed AVI: {e}") from e
    return fps, jpegs


def avi_mjpeg_frames(data: bytes):
    """Yield (h, w, 3) uint8 RGB frames from an AVI-MJPEG container —
    the AVI twin of ``y4m_frames`` (same dtype/quantization), so frame
    fingerprints are container-independent for identical pixels."""
    _, jpegs = _avi_walk(data)
    if not jpegs:
        raise ValueError("AVI contains no video frames")
    for j in jpegs:
        rgb, _ = _jpeg_rgb(j)
        yield np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def decode_avi_mjpeg(data: bytes) -> dict:
    """Real AVI-MJPEG decode: RIFF chunk walk to the movi LIST, each
    00dc/00db frame decoded by ``decode_jpeg``; frame rate from avih.
    Raises ValueError on non-AVI payloads or non-MJPEG frames."""
    fps, jpegs = _avi_walk(data)
    frames = [decode_jpeg(j) for j in jpegs]
    if not frames:
        raise ValueError("AVI contains no video frames")
    w, h = frames[0]["width"], frames[0]["height"]
    return {
        "container": "avi-mjpeg",
        "width": int(w),
        "height": int(h),
        "n_frames": len(frames),
        "fps": float(fps),
        "duration_s": float(len(frames) / fps) if fps else 0.0,
        "mean_r": float(np.mean([f["mean_r"] for f in frames])),
        "mean_g": float(np.mean([f["mean_g"] for f in frames])),
        "mean_b": float(np.mean([f["mean_b"] for f in frames])),
    }


# --------------------------------------------------------------------------
# IFDV — a minimal INTER-FRAME video container (our own format; the
# public-concept core of MPEG-style temporal compression without external
# libraries): a GOP structure of I-frames (zlib of raw RGB) and P-frames
# (zlib of wrap-around uint8 DELTAS against the previously-decoded frame).
# Lossless by construction (mod-256 delta + mod-256 add is the identity), so codec round-trips are
# bit-checkable and the oracle-checked query (q130) can use closed-form
# payloads. This is NOT H.264 — those bitstreams stay out of scope without
# external decoders — but the decode plumbing (frame reconstruction
# state carried across frames, GOP random-access boundaries) is the real
# inter-frame shape.
#
# Layout: b"IFDV1\n" + <IIHH> (w, h, fps, gop) + per frame:
#   <cI> frame_type (b"I"/b"P"), payload_len, payload
# --------------------------------------------------------------------------
_IFDV_MAGIC = b"IFDV1\n"


def encode_ifdv(frames: np.ndarray, fps: int = 25, gop: int = 8) -> bytes:
    """Encode uint8 (n, h, w, 3) RGB (or (n, h, w) gray) frames: every
    ``gop``-th frame is an I-frame, the rest are wrap-around uint8
    deltas vs the previous frame. On temporally-correlated content the P payloads compress far
    below the I payloads (pinned in tests) — the point of the format."""
    import zlib

    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim == 3:
        fr = np.stack([fr, fr, fr], axis=-1)
    n, h, w, _ = fr.shape
    if gop < 1:
        raise ValueError("gop must be >= 1")
    out = bytearray(_IFDV_MAGIC)
    out += struct.pack("<IIHH", w, h, fps, gop)
    prev: np.ndarray | None = None
    for i in range(n):
        cur = fr[i]
        if i % gop == 0 or prev is None:
            ftype, payload = b"I", zlib.compress(cur.tobytes())
        else:
            # wrap-around uint8 delta: exact under mod-256 arithmetic
            # (reconstruction adds with the same wrap), half the bytes
            # of a sign-carrying int16 delta and friendlier to zlib
            delta = cur - prev  # uint8 subtraction wraps mod 256
            ftype, payload = b"P", zlib.compress(delta.tobytes())
        out += struct.pack("<cI", ftype, len(payload))
        out += payload
        prev = cur
    return bytes(out)


def ifdv_frames(data: bytes):
    """Yield (h, w, 3) uint8 RGB frames — P-frames reconstruct against
    the carried previous-frame state (the inter-frame decode loop);
    delta add wraps mod 256, the exact inverse of the encoder's
    subtraction."""
    import zlib

    if data[: len(_IFDV_MAGIC)] != _IFDV_MAGIC:
        raise ValueError("not an IFDV payload")
    try:
        pos = len(_IFDV_MAGIC)
        w, h, _fps, _gop = struct.unpack_from("<IIHH", data, pos)
        pos += 12
        prev: np.ndarray | None = None
        while pos < len(data):
            ftype, plen = struct.unpack_from("<cI", data, pos)
            pos += 5
            raw = zlib.decompress(data[pos : pos + plen])
            pos += plen
            if ftype == b"I":
                cur = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
            elif ftype == b"P":
                if prev is None:
                    raise ValueError("IFDV P-frame before any I-frame")
                delta = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
                cur = prev + delta  # uint8 addition wraps mod 256 — exact
            else:
                raise ValueError(f"unknown IFDV frame type {ftype!r}")
            prev = cur
            yield cur
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"malformed IFDV: {e}") from e


def decode_ifdv(data: bytes) -> dict:
    """Container-feature form of ``ifdv_frames`` — same dict shape as the
    other video decoders."""
    if data[: len(_IFDV_MAGIC)] != _IFDV_MAGIC:
        raise ValueError("not an IFDV payload")
    try:
        w, h, fps, _gop = struct.unpack_from("<IIHH", data, len(_IFDV_MAGIC))
    except struct.error as e:
        raise ValueError(f"malformed IFDV header: {e}") from e
    n = 0
    sums = np.zeros(3)
    for fr in ifdv_frames(data):
        sums += fr.reshape(-1, 3).mean(axis=0)
        n += 1
    if n == 0:
        raise ValueError("IFDV stream contains no frames")
    means = sums / n
    return {
        "container": "ifdv",
        "width": int(w),
        "height": int(h),
        "n_frames": n,
        "fps": float(fps),
        "duration_s": float(n / fps) if fps else 0.0,
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }


def decode_video(data: bytes) -> dict:
    """Sniff-and-decode video: Y4M, AVI-MJPEG, or IFDV by magic bytes."""
    if data[:9] == b"YUV4MPEG2":
        return decode_y4m(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi_mjpeg(data)
    if data[: len(_IFDV_MAGIC)] == _IFDV_MAGIC:
        return decode_ifdv(data)
    raise ValueError("unsupported video format (Y4M / AVI-MJPEG / IFDV supported)")


def image_pixels(data: bytes) -> np.ndarray:
    """Sniff-and-decode to an RGB uint8 (h, w, 3) array — the pixel form
    of ``decode_image``, shared by the real resize path."""
    if data[:2] == b"BM":
        (_, _, _, _, off) = struct.unpack_from("<2sIHHI", data, 0)
        hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
        if len(data) < 54 or data[:2] != b"BM" or hdr_size < 40 or compression != 0 or bpp not in (24, 32):
            raise ValueError("unsupported BMP")
        h = abs(h_signed)
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
        rows = raw.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
        if h_signed > 0:
            rows = rows[::-1]
        return rows[:, :, :3][:, :, ::-1].copy()  # BGR -> RGB
    if data[:2] == b"P6":
        feats = decode_ppm(data)  # header walk for dims + validation
        w, h = feats["width"], feats["height"]
        # re-walk the header to find the payload offset (same logic)
        pos, fields = 2, []
        while len(fields) < 3:
            while data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while data[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while not data[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
        pos += 1
        return np.frombuffer(data, np.uint8, w * h * 3, pos).reshape(h, w, 3).copy()
    if data[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        rgb, _ = _png_rgb_safe(data)
        return np.clip(rgb, 0, 255).astype(np.uint8)
    if data[:2] == b"\xff\xd8":
        rgb, _ = _jpeg_rgb(data)
        return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    raise ValueError("unsupported image format (BMP/P6-PPM/PNG/JPEG supported)")


def resize_image_bytes(data: bytes, max_dim: int = 64) -> bytes:
    """REAL image resize: decode (any supported format), nearest-neighbor
    downscale so max(h, w) <= max_dim (aspect preserved, never upscales),
    re-encode as PNG. Deterministic — index mapping uses floor sampling.
    """
    px = image_pixels(data)
    h, w = px.shape[:2]
    scale = max(h, w) / max_dim
    if scale > 1.0:
        th, tw = max(1, int(h / scale)), max(1, int(w / scale))
        yi = (np.arange(th) * h // th).astype(np.int64)
        xi = (np.arange(tw) * w // tw).astype(np.int64)
        px = px[yi][:, xi]
    return encode_png(px)
