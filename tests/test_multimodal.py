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
    df = docs_with_blob(spark, sf_dir)
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(df, fake=False)


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
    with pytest.raises(NotImplementedError, match="codec"):
        resize_media(df, fake=False)
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
