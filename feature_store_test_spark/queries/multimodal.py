"""Multimodal-column queries (north-star: opaque binary + typed metadata).

The fixture has no real media files, so blobs are derived deterministically
(UTF-8 bytes of document text — pure ASCII, so char offsets == byte
offsets, which the oracle SQL relies on). The *plumbing* under test is
real: binary columns, JVM-side metadata extraction, and the Arrow-batched
mapInPandas frame fan-out with its declared output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.operators.multimodal import blob_meta, decode_media
from feature_store_test_spark.registry import register


def _docs_with_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.withColumn("blob", F.encode(F.col("text"), "utf-8"))


# ---------------------------------------------------------------------------
# Q31 — binary column + JVM-side metadata extraction: the pattern that keeps
# blobs OUT of shuffles (extract small typed metadata first, shuffle that).
# ---------------------------------------------------------------------------
@register(
    "q31_blob_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_fp,   -- md5 over the same UTF-8 bytes
           CASE substr(upper(md5(text)), 1, 1)
                WHEN 'F' THEN 'bucket-f' WHEN '8' THEN 'bucket-8'
                ELSE 'bucket-other' END AS shard
    FROM documents
    """,
    doc="opaque binary column with JVM-side typed metadata (size/fp/shard)",
    tags=("multimodal", "scalar"),
)
def q31_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_blob(spark, sf_dir)
    meta = blob_meta("blob")
    return df.select(
        "doc_id",
        meta["n_bytes"].alias("n_bytes"),
        meta["content_fp"].alias("content_fp"),
        F.when(F.substring(F.upper(meta["content_fp"]), 1, 1) == "F", F.lit("bucket-f"))
        .when(F.substring(F.upper(meta["content_fp"]), 1, 1) == "8", F.lit("bucket-8"))
        .otherwise(F.lit("bucket-other"))
        .alias("shard"),
    )


# ---------------------------------------------------------------------------
# Q32 — frame sampling through the stub codec: mapInPandas fan-out with a
# declared frame schema. The fake codec is a pure function of the bytes, so
# the oracle reproduces it with substr arithmetic (ASCII ⇒ chars == bytes).
# ---------------------------------------------------------------------------
@register(
    "q32_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           md5(substr(text, i * 256 + 1, 256)) AS frame_fp,
           CAST(length(substr(text, i * 256 + 1, 256)) AS INT) AS frame_bytes
    FROM documents, unnest(generate_series(0, (length(text) - 1) // 256)) AS g(i)
    """,
    doc="media frame sampling via Arrow-batched mapInPandas (stub codec)",
    tags=("multimodal", "udf"),
)
def q32_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_blob(spark, sf_dir)
    return decode_media(df, blob_col="blob", id_col="doc_id", frame_size=256, fake=True)
