"""Streaming dedup (streaming/dedup.py): re-delivered events across
micro-batches are dropped; the surviving set equals the batch distinct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.streaming.dedup import dedup_batch, dedup_stream


def test_stream_dedup_drops_redeliveries_across_batches(spark, sf_dir, tmp_path):
    """Write the same events twice as two files (→ two micro-batches with
    maxFilesPerTrigger=1). The watermarked stream dedup must emit each
    event_id exactly once; totals match the batch distinct."""
    ev = (
        load_table(spark, "events", sf_dir)
        .where(F.col("user_id") < 20)
        .select("event_id", "ts", "user_id", "value")
    )
    src = tmp_path / "dup_src"
    ev.coalesce(1).write.mode("append").parquet(str(src))
    ev.coalesce(1).write.mode("append").parquet(str(src))  # full re-delivery

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(
        str(src)
    )
    out = tmp_path / "dedup_out"
    q = (
        dedup_stream(stream, ["event_id"], ts_col="ts", delay="10 minutes")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(str(out))
    n_expected = ev.count()
    assert got.count() == n_expected
    assert got.select("event_id").distinct().count() == n_expected


def test_batch_dedup_matches_distinct(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id")
    doubled = ev.unionAll(ev)
    assert dedup_batch(doubled, ["event_id"]).count() == ev.count()
