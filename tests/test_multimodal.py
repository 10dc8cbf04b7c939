"""Multimodal plumbing: binary columns, stub codec, Arrow batch shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.operators.multimodal import (
    blob_meta,
    decode_media,
    extract_features,
    resize_media,
)


def docs_with_blob(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.encode(F.col("text"), "utf-8")
    )


def test_decode_without_codec_is_explicit_stub(spark, sf_dir):
    """Real mode (fake=False) decodes Y4M payloads; any OTHER payload
    hits the clearly-marked NotImplementedError stub inside the stage
    (payload format is only knowable at execution time now that real
    video decode exists)."""
    df = docs_with_blob(spark, sf_dir).limit(3)
    with pytest.raises(Exception, match="fake=True"):
        decode_media(df, fake=False).collect()


def test_fake_codec_frame_fanout(spark, sf_dir):
    df = docs_with_blob(spark, sf_dir)
    frames = decode_media(df, frame_size=256, fake=True)
    assert [f.name for f in frames.schema.fields] == [
        "doc_id", "frame_idx", "frame_fp", "frame_bytes",
    ]
    joined = (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.sum("frame_bytes").alias("total"))
        .join(df.select("doc_id", F.octet_length("blob").alias("n_bytes")), "doc_id")
    )
    bad = joined.where(
        (F.col("total") != F.col("n_bytes"))
        | (F.col("n_frames") != F.ceil(F.col("n_bytes") / 256.0))
    )
    assert bad.count() == 0  # frames tile the blob exactly


def test_extract_features_shape_and_normalization(spark, sf_dir):
    df = docs_with_blob(spark, sf_dir)
    with pytest.raises(NotImplementedError, match="encoder"):
        extract_features(df, fake=False)
    emb = extract_features(df, dim=16, fake=True)
    rows = emb.limit(5).collect()
    for r in rows:
        assert len(r.embedding) == 16
        assert sum(r.embedding) == pytest.approx(1.0)  # normalized histogram
        assert all(v >= 0.0 for v in r.embedding)
    # deterministic: same bytes -> same embedding
    again = {r.doc_id: r.embedding for r in emb.limit(5).collect()}
    assert {r.doc_id: r.embedding for r in rows} == again


def test_resize_media_bounds_and_determinism(spark, sf_dir):
    df = docs_with_blob(spark, sf_dir)
    # real mode on NON-image bytes: errors-as-data, no crash
    real = resize_media(df.limit(3), fake=False).collect()
    assert all(r["resize_error"] is not None and r["resized"] is None for r in real)
    out = resize_media(df, target_bytes=100, fake=True).join(
        df.select("doc_id", F.octet_length("blob").alias("n_bytes")), "doc_id"
    )
    bad = out.where(
        (F.col("resized_bytes") > 100)
        | (F.col("resized_bytes") != F.octet_length("resized"))
        | ((F.col("n_bytes") >= 100) & (F.col("resized_bytes") < 50))
    )
    assert bad.count() == 0


def test_blob_meta_is_jvm_side(spark, sf_dir):
    df = docs_with_blob(spark, sf_dir)
    out = df.select("doc_id", blob_meta("blob").alias("m")).select(
        "doc_id", "m.n_bytes", "m.content_fp", "m.format"
    )
    # no Python eval in the plan: metadata extraction must stay JVM-side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    row = out.orderBy("doc_id").limit(1).collect()[0]
    assert row.n_bytes > 0 and len(row.content_fp) == 32


def test_video_features_and_real_frame_fanout(spark):
    """Y4M and AVI-MJPEG blobs decode for real through video_features;
    decode_media(fake=False) fans a Y4M blob out to one row per ACTUAL
    frame with the md5 of the frame's raw RGB bytes."""
    import hashlib

    import numpy as np
    from pyspark.sql import types as T

    from feature_store_test_spark.operators.codecs import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_y4m,
    )
    from feature_store_test_spark.operators.multimodal import video_features

    frames = np.stack([np.full((6, 8), v, np.uint8) for v in (10, 100, 200)])
    y4m = encode_y4m(frames, fps=10)
    jpgs = [encode_jpeg(np.full((8, 10, 3), v, np.uint8), quality=85) for v in (50, 150)]
    avi = encode_avi_mjpeg(jpgs, 10, 8, fps=5)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("blob", T.BinaryType())]
    )
    df = spark.createDataFrame([(1, bytearray(y4m)), (2, bytearray(avi)), (3, bytearray(b"junk"))], schema)
    out = {r["doc_id"]: r for r in video_features(df).collect()}
    assert out[1]["container"] == "y4m" and out[1]["n_frames"] == 3
    assert out[1]["mean_g"] == pytest.approx((10 + 100 + 200) / 3, abs=1e-9)
    assert out[1]["duration_s"] == pytest.approx(0.3)
    assert out[2]["container"] == "avi-mjpeg" and out[2]["n_frames"] == 2
    assert out[2]["mean_r"] == pytest.approx(100.0, abs=1e-9)
    assert out[2]["fps"] == pytest.approx(5.0)
    assert out[3]["decode_error"] is not None and out[3]["n_frames"] is None

    rows = decode_media(
        df.where(F.col("doc_id") == 1), fake=False
    ).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    # frame fingerprints match the md5 of each decoded frame's RGB bytes
    gray = [np.full((6, 8, 3), v, np.uint8) for v in (10, 100, 200)]
    for r, g in zip(rows, gray):
        assert r["frame_fp"] == hashlib.md5(g.tobytes()).hexdigest()
        assert r["frame_bytes"] == g.size

    # AVI-MJPEG takes the real path too (decode_media's docstring
    # contract): fingerprints match the per-frame JPEG walk that
    # avi_mjpeg_frames/decode_video run over the same payload
    from feature_store_test_spark.operators.codecs import avi_mjpeg_frames

    avi_rows = decode_media(
        df.where(F.col("doc_id") == 2), fake=False
    ).orderBy("frame_idx").collect()
    want = [
        (i, hashlib.md5(fr.tobytes()).hexdigest(), fr.size)
        for i, fr in enumerate(avi_mjpeg_frames(bytes(avi)))
    ]
    assert [(r["frame_idx"], r["frame_fp"], r["frame_bytes"]) for r in avi_rows] == want
    assert len(want) == 2
    # container-independence: identical pixels => identical fingerprints
    # (both paths emit uint8 RGB with the same rint/clip quantization)
    assert all(len(fp) == 32 for _, fp, _ in want)


def test_resize_media_real_images(spark):
    """Real resize: decode (any supported image format), nearest-neighbor
    downscale to max_dim, PNG re-encode — output decodes to the right
    dims, constant-color content survives exactly, small images pass
    through unscaled."""
    import numpy as np
    from pyspark.sql import types as T

    from feature_store_test_spark.operators.codecs import (
        decode_png,
        encode_bmp,
        encode_jpeg,
        encode_png,
    )

    big = np.full((96, 128, 3), 77, dtype=np.uint8)
    rng = np.random.default_rng(9)
    small = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(big, filter_type="mixed"))),
        (2, bytearray(encode_bmp(small))),
        (3, bytearray(encode_jpeg(big, quality=85))),
    ]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("blob", T.BinaryType())]
    )
    out = {
        r["doc_id"]: r
        for r in resize_media(
            spark.createDataFrame(rows, schema), max_dim=32, fake=False
        ).collect()
    }
    assert all(out[i]["resize_error"] is None for i in (1, 2, 3))
    d1 = decode_png(bytes(out[1]["resized"]))
    assert (d1["width"], d1["height"]) == (32, 24)  # aspect preserved
    assert d1["mean_g"] == pytest.approx(77.0, abs=1e-9)  # constant survives
    d2 = decode_png(bytes(out[2]["resized"]))
    assert (d2["width"], d2["height"]) == (12, 10)  # no upscale
    assert d2["mean_r"] == pytest.approx(small[:, :, 0].astype(np.float64).mean())
    d3 = decode_png(bytes(out[3]["resized"]))
    assert (d3["width"], d3["height"]) == (32, 24)
    assert d3["mean_b"] == pytest.approx(77.0, abs=1.0)  # through JPEG loss
