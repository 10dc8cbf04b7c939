"""Source readers: declared-schema CSV/JSON roundtrips (SURVEY §2.1 S1/S2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.sources import (
    PURCHASES_SCHEMA,
    read_csv,
    read_json,
    stream_source,
)


def purchases(spark, sf_dir):
    return load_table(spark, "events", sf_dir).select(
        F.col("user_id").alias("customer_id"),
        F.col("ts").alias("purchase_timestamp"),
        F.col("value").alias("purchase_value"),
        F.get_json_object("props", "$.k").cast("double").alias("loyalty_score"),
    )


def test_csv_roundtrip_with_reference_timestamp_format(spark, sf_dir, tmp_path):
    """The reference's ISO format (%Y-%m-%dT%H:%M:%S.%fZ) survives a
    write/read cycle with the declared schema — no inference anywhere."""
    src = purchases(spark, sf_dir)
    path = str(tmp_path / "purchases_csv")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    (
        src.withColumn(
            "purchase_timestamp", F.date_format("purchase_timestamp", fmt)
        ).write.option("header", True).csv(path)
    )
    back = read_csv(spark, path, PURCHASES_SCHEMA, timestamp_format=fmt)
    assert back.schema == PURCHASES_SCHEMA
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = purchases(spark, sf_dir)
    path = str(tmp_path / "purchases_json")
    src.write.json(path)
    back = read_json(spark, path, PURCHASES_SCHEMA)
    assert back.schema == PURCHASES_SCHEMA
    assert back.count() == src.count()


def test_stream_source_schema(spark, sf_dir, tmp_path):
    src = purchases(spark, sf_dir)
    path = str(tmp_path / "stream_parquet")
    src.write.parquet(path)
    stream = stream_source(spark, path, PURCHASES_SCHEMA, max_files_per_trigger=1)
    assert stream.isStreaming
    assert stream.schema == PURCHASES_SCHEMA
