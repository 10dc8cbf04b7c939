"""Perceptual average-hash + image near-dup (operators/perceptual.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from feature_store_test_spark.operators.codecs import encode_bmp, encode_png
from feature_store_test_spark.operators.perceptual import (
    average_hash_bands,
    perceptual_hash_bands,
    perceptual_near_dups,
)


def _img(seed: int, wh: int = 16) -> np.ndarray:
    y, x = np.ogrid[0:wh, 0:wh]
    base = y * (3 + seed % 7) + x * (5 + seed % 11) + y * x * (1 + seed % 13)
    px = base[:, :, None] + np.arange(3)[None, None, :] * 37
    return (px % 256).astype(np.uint8)


def _hamming(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_hash_is_deterministic_and_16bit_banded():
    h1 = average_hash_bands(_img(1))
    h2 = average_hash_bands(_img(1))
    assert h1 == h2
    assert len(h1) == 4
    assert all(0 <= v < 1 << 16 for v in h1)
    # total set bits: strict > against the mean keeps both classes
    # non-empty on any non-constant image
    total = sum(bin(v).count("1") for v in h1)
    assert 0 < total < 64


def test_brightness_shift_invariance():
    """Adding a constant to every pixel shifts block and global means
    equally — the hash (a mean comparison) must not move. This is the
    property that makes aHash a PERCEPTUAL hash rather than a byte hash
    (re-encoded/re-exposed copies of an image still collide)."""
    px = (_img(7).astype(np.int64) % 200).astype(np.uint8)  # room for +9
    shifted = (px.astype(np.int64) + 9).astype(np.uint8)
    assert average_hash_bands(px) == average_hash_bands(shifted)


def test_single_pixel_perturbation_small_hamming():
    px = _img(3)
    tweaked = px.copy()
    tweaked[4, 4, :] = (tweaked[4, 4, :].astype(np.int64) + 120 % 256).astype(
        np.uint8
    )
    d = _hamming(average_hash_bands(px), average_hash_bands(tweaked))
    assert d <= 2  # one pixel moves at most its own block's bit(s)


def test_different_patterns_far_apart():
    d = _hamming(average_hash_bands(_img(3)), average_hash_bands(_img(4)))
    assert d > 6


def test_non_divisible_dims_supported():
    # 13x11: block boundaries via (y*grid)//h — no divisibility demand
    rng = _img(9)[:13, :11]
    h = average_hash_bands(rng)
    assert len(h) == 4 and all(0 <= v < 1 << 16 for v in h)


def test_hash_bands_through_real_codecs(spark):
    """The Spark stage decodes REAL containers (PNG and BMP) back to the
    same pixels, so both encodings of one image hash identically."""
    px = _img(5)
    rows = [(0, bytearray(encode_png(px, filter_type="mixed"))),
            (1, bytearray(encode_bmp(px)))]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "blob"]),
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("blob", T.BinaryType()),
            ]
        ),
    )
    out = {r["doc_id"]: [r[f"mh{b}"] for b in range(4)]
           for r in perceptual_hash_bands(df).collect()}
    assert out[0] == out[1] == average_hash_bands(px)


def test_near_dups_end_to_end(spark):
    """Two exact copies + one near copy + one far image: pairs among the
    first three only, with hamming 0 for the exact pair."""
    base = _img(11)
    near = base.copy()
    near[2, 2, :] = ((near[2, 2, :].astype(np.int64) + 100) % 256).astype(
        np.uint8
    )
    far = _img(12)
    rows = [
        (0, bytearray(encode_png(base))),
        (1, bytearray(encode_png(base, filter_type="mixed"))),
        (2, bytearray(encode_png(near))),
        (3, bytearray(encode_png(far))),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "blob"]),
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("blob", T.BinaryType()),
            ]
        ),
    )
    from feature_store_test_spark.registry import release_caches

    try:
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in perceptual_near_dups(df, max_hamming=6).collect()
        }
    finally:
        release_caches()
    assert got.get((0, 1)) == 0
    assert (0, 2) in got and got[(0, 2)] <= 2
    assert (1, 2) in got and got[(1, 2)] == got[(0, 2)]
    assert not any(3 in pair for pair in got)
