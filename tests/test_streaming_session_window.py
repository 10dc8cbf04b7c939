"""Streaming session windows: F.session_window with a watermark must
produce, over a fully-drained file stream, the same sessions as the batch
q48 aggregation — the operator is one definition, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table


def test_streaming_session_window_matches_batch(spark, sf_dir, tmp_path):
    ev = (
        load_table(spark, "events", sf_dir)
        .where(F.col("user_id") < 30)
        .select("user_id", "ts", "value")
    )
    src = tmp_path / "src"
    # two micro-batches, split by hash so each user's rows straddle both —
    # sessions must still assemble correctly across batches
    ev.where(F.crc32(F.col("ts").cast("string")) % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    ev.where(F.crc32(F.col("ts").cast("string")) % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    def sessions(df):
        return df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
        ).select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "0 seconds")
    )
    out = tmp_path / "out"
    q = (
        sessions(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(str(out)).collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessions(ev).collect()
    }
    # append mode emits a session only once the watermark passes its end;
    # with delay 0 the final watermark = max(ts), so every session whose
    # end precedes it is emitted — at most the tail sessions are held back
    assert got <= batch
    held_back = batch - got
    wm = ev.agg(F.max("ts")).first()[0]
    assert all(end >= wm for (_, _, end, _) in held_back)
    assert len(got) >= len(batch) - ev.select("user_id").distinct().count()
