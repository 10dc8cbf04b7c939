"""Real codec paths (operators/codecs.py + multimodal.audio_features /
image_features): round-trip property tests against numpy ground truth,
plus the Spark mapInPandas path end to end.

These are the promoted fake=False decoders — actual RIFF/BMP/PPM byte
parsing, not the deterministic stub codec decode_media uses for formats
the container has no libraries for.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from feature_store_test_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip(n, ch, rate, bits, seed):
    rng = np.random.default_rng(seed)
    lim = 127 if bits == 8 else 32767
    samples = rng.integers(-lim, lim, size=(n, ch), dtype=np.int64)
    got = decode_wav(encode_wav(samples, sample_rate=rate, bits=bits))
    assert (got["sample_rate"], got["n_channels"], got["bits"]) == (rate, ch, bits)
    assert got["n_samples"] == n
    mono = samples.astype(np.float64).mean(axis=1)
    assert got["rms"] == pytest.approx(np.sqrt(np.mean(mono**2)), abs=1e-9)
    assert got["peak"] == pytest.approx(np.max(np.abs(mono)), abs=1e-9)
    assert got["duration_s"] == pytest.approx(n / rate)


@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_and_ppm_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    for enc, dec in ((encode_bmp, decode_bmp), (encode_ppm, decode_ppm)):
        got = dec(enc(px))
        assert (got["width"], got["height"]) == (w, h)
        assert got["mean_r"] == pytest.approx(px[:, :, 0].mean(), abs=1e-9)
        assert got["mean_g"] == pytest.approx(px[:, :, 1].mean(), abs=1e-9)
        assert got["mean_b"] == pytest.approx(px[:, :, 2].mean(), abs=1e-9)


def test_bmp_row_padding_and_bottom_up():
    # w=3 -> 9-byte raw rows, 3 bytes padding; distinct rows verify the
    # bottom-up unflip and that padding bytes never leak into means
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[0, :, 0] = 255  # top row pure red
    px[1, :, 2] = 255  # bottom row pure blue
    got = decode_bmp(encode_bmp(px))
    assert got["mean_r"] == pytest.approx(255 / 2)
    assert got["mean_b"] == pytest.approx(255 / 2)
    assert got["mean_g"] == 0.0


def test_ppm_comments_and_whitespace():
    px = np.full((2, 2, 3), 7, dtype=np.uint8)
    raw = b"P6 # comment\n# another\n 2\t2\n255\n" + px.tobytes()
    got = decode_ppm(raw)
    assert (got["width"], got["height"]) == (2, 2)
    assert got["mean_r"] == 7.0


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")


def test_spark_audio_and_image_features(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(20):
        wav = encode_wav(
            rng.integers(-1000, 1000, size=(100 + i, 1), dtype=np.int64),
            sample_rate=8000,
        )
        rows.append((i, bytearray(wav)))
    rows.append((99, bytearray(b"garbage-not-a-wav")))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")

    from feature_store_test_spark.operators.multimodal import (
        audio_features,
        image_features,
    )

    out = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert len(out) == 21
    for i in range(20):
        assert out[i]["n_samples"] == 100 + i
        assert out[i]["sample_rate"] == 8000
        assert out[i]["decode_error"] is None
    # malformed blob is data, not an exception
    assert out[99]["decode_error"] is not None and out[99]["n_samples"] is None

    img_rows = []
    for i in range(10):
        px = rng.integers(0, 256, size=(4 + i, 3, 3), dtype=np.uint8)
        enc = encode_bmp(px) if i % 2 == 0 else encode_ppm(px)
        img_rows.append((i, bytearray(enc), px))
    idf = spark.createDataFrame(
        [(i, b) for i, b, _ in img_rows], "doc_id long, blob binary"
    )
    got = {r["doc_id"]: r for r in image_features(idf).collect()}
    for i, _, px in img_rows:
        assert got[i]["height"] == 4 + i
        assert got[i]["mean_g"] == pytest.approx(px[:, :, 1].mean(), abs=1e-9)
        assert got[i]["decode_error"] is None


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    nch=st.sampled_from([0, 3, 4]),  # 0 = grayscale (h, w)
    ft=st.sampled_from(["none", "sub", "up", "average", "paeth", "mixed"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_all_filters(w, h, nch, ft, seed):
    """encode -> decode is exact for every filter type and color layout:
    the unfilter branches (None/Sub/Up/Average/Paeth) must reconstruct
    the precise pixels, verified through the channel means of uint8
    noise (any reconstruction slip moves a mean)."""
    from feature_store_test_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if nch == 0 else (h, w, nch)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_png(encode_png(px, filter_type=ft))
    assert (got["width"], got["height"]) == (w, h)
    if nch == 0:
        exp = [float(px.astype(np.float64).mean())] * 3
        assert got["bpp"] == 8
    else:
        exp = [float(px[:, :, c].astype(np.float64).mean()) for c in range(3)]
        assert got["bpp"] == nch * 8
    for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
        assert got[name] == pytest.approx(exp[c], abs=1e-9)


def test_png_rejects_corruption():
    from feature_store_test_spark.operators.codecs import decode_png, encode_png

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = bytearray(encode_png(px))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + bytes(good[4:]))
    bad = bytearray(good)
    bad[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_png_valid_crc_bad_deflate_is_controlled():
    """Chunk CRCs valid but IDAT deflate stream is garbage/truncated:
    zlib.error must be mapped to ValueError (errors as data), not escape
    and kill the Spark stage."""
    import struct
    import zlib

    from feature_store_test_spark.operators.codecs import decode_png

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    for idat in (b"\x12garbage-not-deflate\x00" * 3,
                 zlib.compress(b"\x00" + b"\x01" * 12 * 4)[:-6]):
        png = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="malformed PNG"):
            decode_png(png)


def test_jpeg_undefined_quant_table_is_controlled():
    """Structurally valid JPEG whose SOF0 references a quant-table id
    that no DQT defined: the KeyError on the table lookup must surface
    as ValueError, not escape the decode_error wrapper."""
    import struct

    from feature_store_test_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    good = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    pos = 2
    while pos + 4 <= len(good):  # rewrite SOF0 component Tq ids to 3
        marker, size = good[pos : pos + 2], struct.unpack_from(">H", good, pos + 2)[0]
        if marker == b"\xff\xc0":
            ncomp = good[pos + 9]
            for c in range(ncomp):
                good[pos + 10 + 3 * c + 2] = 3  # undefined quant table id
            break
        pos += 2 + size
    with pytest.raises(ValueError, match="malformed JPEG"):
        decode_jpeg(bytes(good))


def test_png_palette_decode():
    """Color type 3: indices map through the PLTE chunk."""
    import struct
    import zlib

    from feature_store_test_spark.operators.codecs import decode_png

    rng = np.random.default_rng(11)
    idx = rng.integers(0, 4, size=(3, 5), dtype=np.uint8)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 3, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    exp = pal[idx].astype(np.float64)
    assert got["mean_r"] == pytest.approx(exp[:, :, 0].mean(), abs=1e-9)
    assert got["mean_b"] == pytest.approx(exp[:, :, 2].mean(), abs=1e-9)


def test_spark_image_features_png(spark):
    """image_features decodes real PNG blobs through the Arrow path,
    alongside BMP in the same frame (sniff-and-decode per row)."""
    from feature_store_test_spark.operators.codecs import encode_bmp, encode_png
    from feature_store_test_spark.operators.multimodal import image_features
    from pyspark.sql import types as T

    rng = np.random.default_rng(3)
    p1 = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    p2 = rng.integers(0, 256, size=(4, 7, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(p1, filter_type="mixed"))),
        (2, bytearray(encode_bmp(p2))),
        (3, bytearray(b"nonsense")),
    ]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("blob", T.BinaryType())]
    )
    out = {r["doc_id"]: r for r in image_features(spark.createDataFrame(rows, schema)).collect()}
    assert out[1]["decode_error"] is None
    assert (out[1]["width"], out[1]["height"]) == (9, 6)
    assert out[1]["mean_g"] == pytest.approx(p1[:, :, 1].astype(np.float64).mean())
    assert (out[2]["width"], out[2]["height"]) == (7, 4)
    assert out[3]["decode_error"] is not None and out[3]["width"] is None


@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    gray=st.booleans(),
    quality=st.sampled_from([75, 85, 95]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_smooth(w, h, gray, quality, seed):
    """Baseline JPEG encode -> decode recovers per-channel means within
    quantization error on smooth (low-frequency) images; dimensions and
    channel count are exact. Smooth inputs keep AC quant error small so
    the tolerance can be tight without flaking."""
    from feature_store_test_spark.operators.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    base = rng.integers(40, 216)
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = (base + 0.3 * xx + 0.2 * yy) % 256
    if gray:
        px = smooth.astype(np.uint8)
        exp = [float(px.astype(np.float64).mean())] * 3
    else:
        px = np.stack(
            [smooth, (smooth + 30) % 256, (smooth + 60) % 256], axis=2
        ).astype(np.uint8)
        exp = [float(px[:, :, c].astype(np.float64).mean()) for c in range(3)]
    got = decode_jpeg(encode_jpeg(px, quality=quality))
    assert (got["width"], got["height"]) == (w, h)
    assert got["bpp"] == (8 if gray else 24)
    for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
        assert got[name] == pytest.approx(exp[c], abs=4.0)


def test_jpeg_constant_is_exact():
    """At quality 85 the DC quant step divides the scaled DC exactly, so
    a constant-color image round-trips bit-exact (the q124 oracle leans
    on this closed form)."""
    from feature_store_test_spark.operators.codecs import decode_jpeg, encode_jpeg

    for v in (0, 1, 127, 128, 200, 255):
        px = np.full((19, 13, 3), v, dtype=np.uint8)
        got = decode_jpeg(encode_jpeg(px, quality=85))
        for name in ("mean_r", "mean_g", "mean_b"):
            assert got[name] == pytest.approx(float(v), abs=1e-9), (v, got)


def test_jpeg_rejects_unsupported():
    from feature_store_test_spark.operators.codecs import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01")
    good = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    # flip SOF0 -> SOF2 (progressive)
    i = bytes(good).find(b"\xff\xc0")
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[:-20]))  # truncated entropy/EOI


def test_spark_image_features_jpeg(spark):
    """image_features sniffs and decodes real JPEG blobs in the same
    frame as PNG/BMP rows."""
    from feature_store_test_spark.operators.codecs import encode_jpeg, encode_png
    from feature_store_test_spark.operators.multimodal import image_features
    from pyspark.sql import types as T

    p1 = np.full((10, 12, 3), 99, dtype=np.uint8)
    rng = np.random.default_rng(4)
    p2 = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(p1, quality=85))),
        (2, bytearray(encode_png(p2, filter_type="mixed"))),
    ]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("blob", T.BinaryType())]
    )
    out = {r["doc_id"]: r for r in image_features(spark.createDataFrame(rows, schema)).collect()}
    assert out[1]["decode_error"] is None
    assert (out[1]["width"], out[1]["height"], out[1]["bpp"]) == (12, 10, 24)
    assert out[1]["mean_g"] == pytest.approx(99.0, abs=1e-9)
    assert out[2]["mean_b"] == pytest.approx(p2[:, :, 2].astype(np.float64).mean())


@given(
    n=st.integers(1, 5),
    w=st.integers(2, 16),
    h=st.integers(2, 16),
    fps=st.sampled_from([10, 24, 30]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_y4m_roundtrip(n, w, h, fps, seed):
    """Y4M encode -> decode: exact dims/frame count/duration; channel
    means within the +-1 YCbCr uint8 rounding bound per direction."""
    from feature_store_test_spark.operators.codecs import decode_y4m, encode_y4m

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    got = decode_y4m(encode_y4m(frames, fps=fps))
    assert (got["width"], got["height"], got["n_frames"]) == (w, h, n)
    assert got["duration_s"] == pytest.approx(n / fps)
    exp = frames.astype(np.float64).reshape(-1, 3).mean(axis=0)
    for c, k in enumerate(("mean_r", "mean_g", "mean_b")):
        assert got[k] == pytest.approx(exp[c], abs=2.5)


def test_avi_mjpeg_roundtrip_and_rejects():
    from feature_store_test_spark.operators.codecs import (
        decode_avi_mjpeg,
        decode_video,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    jpgs = [
        encode_jpeg(np.full((8, 10, 3), v, dtype=np.uint8), quality=85)
        for v in (30, 90, 210)
    ]
    avi = encode_avi_mjpeg(jpgs, 10, 8, fps=10)
    got = decode_avi_mjpeg(avi)
    assert got["n_frames"] == 3 and (got["width"], got["height"]) == (10, 8)
    assert got["mean_b"] == pytest.approx(110.0, abs=1e-9)
    assert decode_video(avi)["container"] == "avi-mjpeg"
    with pytest.raises(ValueError, match="video"):
        decode_video(b"\x00not media")
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_mjpeg(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="truncated"):
        from feature_store_test_spark.operators.codecs import decode_y4m, encode_y4m

        decode_y4m(encode_y4m(np.zeros((2, 4, 4), np.uint8))[:-10])


@given(
    prefix=st.sampled_from(
        [
            b"", b"RIFF", b"RIFF1234WAVE", b"RIFF1234AVI ", b"BM", b"P6",
            b"P6\n", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"YUV4MPEG2",
            b"YUV4MPEG2 W4 H4\n", b"YUV4MPEG2 C444\n",
        ]
    ),
    body=st.binary(max_size=80),
)
@settings(max_examples=200, deadline=None)
def test_decoders_fail_controlled_on_junk(prefix, body):
    """Every decoder must reject arbitrary bytes with ValueError (the
    errors-as-data contract) — never an uncontrolled IndexError/KeyError/
    struct.error escaping from a malformed header walk."""
    from feature_store_test_spark.operators.codecs import (
        decode_image,
        decode_video,
        decode_wav,
    )

    data = prefix + body
    for dec in (decode_wav, decode_image, decode_video):
        try:
            dec(data)
        except ValueError:
            pass


def test_wav_truncated_fmt_is_controlled():
    import struct

    from feature_store_test_spark.operators.codecs import decode_wav

    data = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00"
    )
    with pytest.raises(ValueError, match="truncated fmt"):
        decode_wav(data)


def test_ifdv_interframe_roundtrip_and_compression():
    """The IFDV inter-frame container round-trips ARBITRARY content
    losslessly (P-frame = prev + int16 delta is exact), and on
    temporally-correlated frames the P payloads compress well below an
    all-I encoding — the point of temporal compression."""
    from feature_store_test_spark.operators.codecs import (
        decode_ifdv,
        decode_video,
        encode_ifdv,
        ifdv_frames,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    frames = [base]
    for _ in range(7):  # small temporal deltas
        nxt = frames[-1].astype(np.int16) + rng.integers(-2, 3, size=base.shape)
        frames.append(np.clip(nxt, 0, 255).astype(np.uint8))
    clip = np.stack(frames)

    data = encode_ifdv(clip, fps=10, gop=4)
    got = list(ifdv_frames(data))
    assert len(got) == 8
    for a, b in zip(got, clip):
        assert np.array_equal(a, b)  # lossless, including P-frames

    feats = decode_ifdv(data)
    assert feats["container"] == "ifdv" and feats["n_frames"] == 8
    assert feats["width"] == 10 and feats["height"] == 12
    assert feats["mean_r"] == pytest.approx(
        float(np.mean([f[:, :, 0].mean() for f in clip])), abs=1e-9
    )
    assert decode_video(data)["container"] == "ifdv"

    # temporal compression: all-I encoding (gop=1) must be much bigger
    # than the I+P encoding on correlated frames
    all_i = encode_ifdv(clip, fps=10, gop=1)
    assert len(data) < 0.6 * len(all_i), (len(data), len(all_i))


def test_ifdv_rejects_corruption():
    import struct as _struct

    from feature_store_test_spark.operators.codecs import (
        decode_ifdv,
        encode_ifdv,
        ifdv_frames,
    )

    good = encode_ifdv(np.zeros((3, 4, 5, 3), np.uint8), gop=2)
    with pytest.raises(ValueError, match="not an IFDV"):
        decode_ifdv(b"IFDV2\n" + good[6:])
    with pytest.raises(ValueError, match="malformed IFDV"):
        decode_ifdv(good[:8])  # truncated header
    bad = bytearray(good)
    bad[30] ^= 0xFF  # corrupt inside the first zlib payload
    with pytest.raises(ValueError, match="malformed IFDV"):
        list(ifdv_frames(bytes(bad)))
    # a P-frame with no preceding I-frame is a structural error
    hdr = good[: 6 + 12]
    pos = 6 + 12
    (ft, plen) = _struct.unpack_from("<cI", good, pos)
    first_frame = good[pos : pos + 5 + plen]
    p_first = bytearray(hdr) + bytearray(first_frame)
    p_first[len(hdr)] = ord("P")
    with pytest.raises(ValueError, match="malformed IFDV|P-frame before"):
        list(ifdv_frames(bytes(p_first)))


def test_ifdv_frame_fanout_through_decode_media(spark):
    """decode_media's real path fans IFDV clips out frame by frame with
    fingerprints equal to the direct decode loop."""
    import hashlib

    from pyspark.sql import types as T

    from feature_store_test_spark.operators.codecs import encode_ifdv, ifdv_frames
    from feature_store_test_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(9)
    clip = rng.integers(0, 256, size=(4, 6, 7, 3), dtype=np.uint8)
    data = encode_ifdv(clip, fps=5, gop=2)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("blob", T.BinaryType())]
    )
    df = spark.createDataFrame([(1, bytearray(data))], schema)
    rows = decode_media(df, fake=False).orderBy("frame_idx").collect()
    want = [
        (i, hashlib.md5(fr.tobytes()).hexdigest(), fr.size)
        for i, fr in enumerate(ifdv_frames(data))
    ]
    assert [(r["frame_idx"], r["frame_fp"], r["frame_bytes"]) for r in rows] == want
