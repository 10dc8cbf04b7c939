"""Checkpoint recovery: a restarted streaming query must resume from its
checkpoint with exactly-once output — already-processed source files are
not re-emitted (file-source offsets) and already-written results are not
duplicated (file-sink _spark_metadata transaction log).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table


def test_file_stream_restart_is_exactly_once(spark, sf_dir, tmp_path):
    ev = (
        load_table(spark, "events", sf_dir)
        .where(F.col("user_id") < 50)
        .select("event_id", "ts", "user_id", "value")
    )
    first = ev.where(F.col("user_id") < 25)
    second = ev.where(F.col("user_id") >= 25)

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(str(src))
        q = (
            stream.withColumn("doubled", F.col("value") * 2)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # phase 1: first batch of files, run to completion, query stops
    first.coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    n_first = spark.read.parquet(str(out)).count()
    assert n_first == first.count()

    # phase 2: more files land; a NEW query object restarts from the same
    # checkpoint — the old files must not be reprocessed
    second.coalesce(1).write.mode("append").parquet(str(src))
    run_once()

    got = spark.read.parquet(str(out))
    assert got.count() == ev.count()  # no loss, no duplication
    assert got.select("event_id").distinct().count() == ev.count()
    # the transform actually ran on both phases
    bad = got.where(F.col("doubled") != F.col("value") * 2).count()
    assert bad == 0
