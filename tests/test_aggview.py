"""Incremental aggregate-view maintenance (store/aggview.py).

The invariant under test: however the history is split across refreshes —
one commit at a time, several at once, across a compaction, after a vacuum
— the materialized state equals a one-shot recompute over the full table.
Decimal sums make that equality exact, not approximate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_test_spark.store import IncrementalAggView, VersionedParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def make(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "t"), SCHEMA)
    view = IncrementalAggView(
        spark, t, str(tmp_path / "view"), key_cols=["k"], measure_cols=["v"]
    )
    return t, view


def recompute(t):
    return (
        t.read()
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,6)")).alias("v_sum"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
    )


def as_sorted_rows(df):
    return sorted(tuple(r) for r in df.select("k", "n_rows", "v_sum", "v_min", "v_max").collect())


def test_refresh_equals_recompute_across_multiple_refreshes(spark, tmp_path):
    t, view = make(spark, tmp_path)
    t.append(spark.createDataFrame([(1, 10.5), (1, 2.25), (2, 7.0)], SCHEMA))
    assert view.refresh() == 1
    assert as_sorted_rows(view.read()) == as_sorted_rows(recompute(t))

    # two more commits folded in one refresh; key 3 is new, key 1 grows
    t.append(spark.createDataFrame([(1, -4.0), (3, 100.0)], SCHEMA))
    t.append(spark.createDataFrame([(2, 0.125)], SCHEMA))
    assert view.refresh() == 3
    assert as_sorted_rows(view.read()) == as_sorted_rows(recompute(t))


def test_refresh_without_new_commits_is_noop(spark, tmp_path):
    t, view = make(spark, tmp_path)
    t.append(spark.createDataFrame([(1, 1.0)], SCHEMA))
    assert view.refresh() == 1
    assert view.refresh() == 1  # idempotent
    assert view.applied_version == 1


def test_read_before_refresh_raises_and_with_avg_derives(spark, tmp_path):
    t, view = make(spark, tmp_path)
    with pytest.raises(ValueError, match="never been refreshed"):
        view.read()
    t.append(spark.createDataFrame([(1, 3.0), (1, 5.0)], SCHEMA))
    view.refresh()
    row = view.read(with_avg=True).where(F.col("k") == 1).collect()[0]
    assert row["v_avg"] == pytest.approx(4.0)


def test_refresh_across_compaction_stays_correct(spark, tmp_path):
    t, view = make(spark, tmp_path)
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], SCHEMA))
    view.refresh()
    t.append(spark.createDataFrame([(1, 10.0)], SCHEMA))
    t.compact()  # rewrites history; changes() falls back to version filter
    t.append(spark.createDataFrame([(2, 20.0)], SCHEMA))
    view.refresh()
    assert as_sorted_rows(view.read()) == as_sorted_rows(recompute(t))


def test_refresh_after_vacuum_falls_back_to_full_recompute(spark, tmp_path):
    t, view = make(spark, tmp_path)
    t.append(spark.createDataFrame([(1, 1.0)], SCHEMA))
    view.refresh()
    t.append(spark.createDataFrame([(1, 2.0)], SCHEMA))
    t.compact()
    t.vacuum()  # pre-compaction commit dirs removed
    t.append(spark.createDataFrame([(2, 9.0)], SCHEMA))
    view.refresh()
    assert as_sorted_rows(view.read()) == as_sorted_rows(recompute(t))


def test_streaming_maintained_view_converges(spark, sf_dir, tmp_path):
    """Structured Streaming maintenance: each micro-batch is committed to
    the table and folded into the view inside foreachBatch — the streaming
    materialized-view pattern. Whatever the batch boundaries, the final
    state equals a batch recompute over everything ingested."""
    from feature_store_test_spark.data import load_table

    ev = (
        load_table(spark, "events", sf_dir)
        .where(F.col("user_id") < 20)
        .select(F.col("user_id").alias("k"), F.col("value").alias("v"))
    )
    src = tmp_path / "src"
    # three files -> three micro-batches with maxFilesPerTrigger=1
    a, b, c = ev.randomSplit([0.4, 0.3, 0.3], seed=7)
    for part in (a, b, c):
        part.coalesce(1).write.mode("append").parquet(str(src))

    t, view = make(spark, tmp_path)

    def fold(batch_df, batch_id):
        t.append(batch_df)
        view.refresh()

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert t.latest_version() >= 2  # really was multiple commits
    assert view.applied_version == t.latest_version()
    assert as_sorted_rows(view.read()) == as_sorted_rows(recompute(t))


def test_rejects_unknown_columns(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "t"), SCHEMA)
    with pytest.raises(ValueError, match="not in table schema"):
        IncrementalAggView(spark, t, str(tmp_path / "v"), ["k"], ["nope"])
