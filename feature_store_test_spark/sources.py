"""Batch + streaming source readers (SURVEY §2.1 S1/S2).

The reference loads purchase CSVs with pandas inference
(/root/reference/main.py:98, core/inference.py:81). Engine rule: every read
carries a declared StructType — no ``inferSchema`` in production paths
(inference costs an extra pass at scale and drifts silently).

``read_csv`` covers the reference's historical/inference CSV inputs;
``read_json``/``read_parquet`` round out the batch formats;
``stream_source`` is the streaming twin (same declared schema) feeding the
inference pipeline, with ``maxFilesPerTrigger`` as the micro-batch sizing
knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PURCHASES_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("purchase_timestamp", T.TimestampType()),
        T.StructField("purchase_value", T.DoubleType()),
        T.StructField("loyalty_score", T.DoubleType()),
    ]
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame:
    reader = spark.read.schema(schema).option("header", header)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (+ optionally sorted) catalog table.

    Bucketing is the storage half of a co-located join: two tables
    bucketed by the same key into the same bucket count join with NO
    Exchange — each task reads matching bucket files from both sides
    (and with ``sort_cols`` == join key, no Sort either). At 100 TB this
    turns the recurring fact-to-fact shuffle (the most expensive stage in
    the plan) into a one-off layout cost at write time, exactly like
    clustered/bucketed tables in Hive/Iceberg.
    """
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "csv":
        return reader.option("header", True).csv(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported stream format {fmt!r}")
