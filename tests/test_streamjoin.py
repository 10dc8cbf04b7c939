"""Stream-stream interval join (streaming/streamjoin.py): two live event
streams correlate within a bounded event-time window, and the streaming
result equals the batch join on the same inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.streaming.streamjoin import interval_join_streams


def _split_events(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).where(F.col("user_id") < 40)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
        "value",
    )
    return clicks, buys


def test_batch_interval_join_semantics(spark, sf_dir):
    """Batch mode: every (click, purchase) pair with same user and
    purchase within 1h after the click — cross-checked against a plain
    join + where."""
    clicks, buys = _split_events(spark, sf_dir)
    got = interval_join_streams(
        clicks, buys, "user_id", left_ts="ts", right_ts="buy_ts", upper="1 hour"
    )
    expected = (
        clicks.join(buys, "user_id")
        .where(
            (F.col("buy_ts") >= F.col("ts"))
            & (F.col("buy_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .count()
    )
    assert got.count() == expected


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Feed both sides as file streams (2 micro-batches each); the
    watermarked stream-stream inner join must emit exactly the batch
    pairs. availableNow drains everything, so no pair is lost to the
    watermark (all data arrives before the final batch closes)."""
    clicks, buys = _split_events(spark, sf_dir)

    csrc, bsrc = tmp_path / "clicks", tmp_path / "buys"
    for half, src in ((clicks, csrc), (buys, bsrc)):
        half.where(F.col("user_id") % 2 == 0).coalesce(1).write.mode("append").parquet(str(src))
        half.where(F.col("user_id") % 2 == 1).coalesce(1).write.mode("append").parquet(str(src))

    cstream = spark.readStream.schema(clicks.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(csrc))
    bstream = spark.readStream.schema(buys.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(bsrc))

    out = tmp_path / "joined"
    q = (
        interval_join_streams(
            cstream, bstream, "user_id", left_ts="ts", right_ts="buy_ts",
            upper="1 hour", watermark="30 days",
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(str(out))
    batch = interval_join_streams(
        clicks, buys, "user_id", left_ts="ts", right_ts="buy_ts", upper="1 hour"
    )
    assert got.count() == batch.count()
    g = {(r.click_id, r.buy_id) for r in got.select("click_id", "buy_id").collect()}
    b = {(r.click_id, r.buy_id) for r in batch.select("click_id", "buy_id").collect()}
    assert g == b


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, sf_dir, tmp_path):
    """leftOuter: clicks with no purchase within the window must still be
    emitted (null buy columns) once the watermark proves no match can
    arrive; availableNow + a final empty-ish batch drains state. Total
    output rows = matched pairs + unmatched clicks."""
    clicks, buys = _split_events(spark, sf_dir)

    csrc, bsrc = tmp_path / "clicks", tmp_path / "buys"
    clicks.coalesce(1).write.mode("append").parquet(str(csrc))
    buys.coalesce(1).write.mode("append").parquet(str(bsrc))

    cstream = spark.readStream.schema(clicks.schema).parquet(str(csrc))
    bstream = spark.readStream.schema(buys.schema).parquet(str(bsrc))

    out = tmp_path / "joined"
    q = (
        interval_join_streams(
            cstream, bstream, "user_id", left_ts="ts", right_ts="buy_ts",
            upper="1 hour", watermark="0 seconds", how="leftOuter",
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(str(out))
    matched = interval_join_streams(
        clicks, buys, "user_id", left_ts="ts", right_ts="buy_ts", upper="1 hour"
    )
    # All matched pairs are present.
    assert got.where(F.col("buy_id").isNotNull()).count() == matched.count()

    # Null-emission contract: an unmatched click is emitted once the global
    # watermark (min over both streams of max event time, delay 0) passes
    # click_ts + upper; clicks closer than `upper` to the end of the stream
    # stay in state — Spark cannot yet prove they will never match.
    unmatched = {
        r.click_id
        for r in clicks.join(
            matched.select("click_id"), "click_id", "left_anti"
        ).collect()
    }
    emitted_nulls = {
        r.click_id for r in got.where(F.col("buy_id").isNull()).collect()
    }
    assert emitted_nulls <= unmatched  # never a false "no match"
    wm = min(
        clicks.agg(F.max("ts")).first()[0], buys.agg(F.max("buy_ts")).first()[0]
    )
    provable = {
        r.click_id
        for r in clicks.where(
            F.col("ts") + F.expr("INTERVAL 1 HOUR") < F.lit(wm)
        ).collect()
    } & unmatched
    assert provable <= emitted_nulls  # everything provably unmatched IS emitted
    assert len(provable) > 0  # the test actually exercises null emission
