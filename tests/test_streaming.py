"""Streaming inference pipeline (SURVEY §2.9 T1-T3, §3.3).

The load-bearing test: replaying events through the micro-batch pipeline
must converge to EXACTLY the q18 closed-form batch state — the (old+new)/2
chain is independent of batch boundaries because state lives in the
feature table between batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_test_spark.data import load_table
from feature_store_test_spark.ml import LinearScorer
from feature_store_test_spark.store import FeatureStore
from feature_store_test_spark.streaming import InferencePipeline
from tests.test_store import FG_SCHEMA

SCORER = LinearScorer(
    feature_cols=["latest_purchase_value", "avg_purchase_value", "avg_loyalty_score"],
    weights=[0.01, 0.02, 0.5],
    intercept=1.0,
)


def events_as_purchases(spark, sf_dir):
    return load_table(spark, "events", sf_dir).select(
        "event_id",
        F.col("user_id").alias("customer_id"),
        F.col("ts").alias("purchase_timestamp"),
        F.col("value").alias("purchase_value"),
    )


def make_pipeline(spark, tmp_path) -> InferencePipeline:
    store = FeatureStore(spark, str(tmp_path / "store"))
    fg = store.create("inference_fg", FG_SCHEMA, "customer_id", "purchase_timestamp")
    return InferencePipeline(
        spark=spark, feature_group=fg, scorer=SCORER, dlq_path=str(tmp_path / "dlq")
    )


def closed_form_state(spark, sf_dir):
    """q18's (old+new)/2 fold, restricted to purchase_value, per customer."""
    from feature_store_test_spark.queries.feature_parity import q18_incremental_avg

    return {r.user_id: (r.n_events, r.inc_avg_value) for r in q18_incremental_avg(spark, sf_dir).collect()}


def test_multi_batch_replay_matches_closed_form(spark, sf_dir, tmp_path):
    pipe = make_pipeline(spark, tmp_path)
    ev = events_as_purchases(spark, sf_dir)
    # three micro-batches split by time — state must chain across them
    cuts = ["2024-01-11", "2024-01-21"]
    b1 = ev.where(F.col("purchase_timestamp") < cuts[0])
    b2 = ev.where(
        (F.col("purchase_timestamp") >= cuts[0]) & (F.col("purchase_timestamp") < cuts[1])
    )
    b3 = ev.where(F.col("purchase_timestamp") >= cuts[1])
    assert b1.count() > 0 and b2.count() > 0 and b3.count() > 0
    for b in (b1, b2, b3):
        pipe.process_batch(b)

    got = {
        r.customer_id: r.avg_purchase_value
        for r in pipe.feature_group.online_view().collect()
    }
    want = closed_form_state(spark, sf_dir)
    assert set(got) == set(want)
    for cid, (_n, inc_avg) in want.items():
        assert got[cid] == pytest.approx(inc_avg, abs=1e-6), cid


def test_predictions_logged_per_event(spark, sf_dir, tmp_path):
    pipe = make_pipeline(spark, tmp_path)
    ev = events_as_purchases(spark, sf_dir)
    log = pipe.process_batch(ev)
    n = ev.count()
    assert log.count() == n
    # spot-check one first-event prediction: miss defaults (avg_pv=v, als=0)
    first = (
        log.orderBy("purchase_timestamp", "event_id").limit(1).collect()[0]
    )
    assert first.was_new_key
    v = first.purchase_value
    assert first.prediction == pytest.approx(1.0 + 0.01 * v + 0.02 * v + 0.5 * 0.0)


def test_dlq_and_single_retry(spark, tmp_path):
    import datetime as dt

    pipe = make_pipeline(spark, tmp_path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("customer_id", T.LongType()),
            T.StructField("purchase_timestamp", T.TimestampType()),
            T.StructField("purchase_value", T.DoubleType()),
        ]
    )
    good = (1, 1, dt.datetime(2024, 1, 1), 10.0)
    bad = (2, 2, dt.datetime(2024, 1, 1), None)  # null value → DLQ
    pipe.process_batch(spark.createDataFrame([good, bad], schema))
    dlq1 = pipe.dlq.read().collect()
    assert len(dlq1) == 1 and dlq1[0].event_id == 2 and dlq1[0].attempt == 1
    # retry: still invalid → stays failed at attempt 2 (log-only, T3)
    pipe.retry_dlq()
    attempts = sorted(r.attempt for r in pipe.dlq.read().collect())
    assert attempts == [1, 2]
    # good row was processed despite the bad one
    assert pipe.feature_group.exists(1)
    assert not pipe.feature_group.exists(2)


def test_structured_streaming_file_replay(spark, sf_dir, tmp_path):
    """The real readStream → foreachBatch path (availableNow drain)."""
    pipe = make_pipeline(spark, tmp_path)
    ev = events_as_purchases(spark, sf_dir)
    src = str(tmp_path / "stream_src")
    ev.coalesce(1).write.parquet(src)
    pipe.run_stream(src, checkpoint_dir=str(tmp_path / "ckpt"))
    got = {
        r.customer_id: r.avg_purchase_value
        for r in pipe.feature_group.online_view().collect()
    }
    want = closed_form_state(spark, sf_dir)
    assert set(got) == set(want)
    for cid, (_n, inc_avg) in want.items():
        assert got[cid] == pytest.approx(inc_avg, abs=1e-6)


def test_strict_mode_drops_stale_updates_parity_applies_them(spark, tmp_path):
    """§2.13 Q5 / T5: a re-delivered old event must not overwrite newer
    state in strict mode, but must in parity (reference-faithful) mode."""
    import datetime as dt

    schema = (
        "event_id long, customer_id long, "
        "purchase_timestamp timestamp, purchase_value double"
    )
    fresh = spark.createDataFrame([(1, 1, dt.datetime(2024, 1, 10), 100.0)], schema)
    stale = spark.createDataFrame([(2, 1, dt.datetime(2024, 1, 5), 10.0)], schema)

    strict_pipe = make_pipeline(spark, tmp_path / "strict")
    strict_pipe.strict_event_time = True
    strict_pipe.process_batch(fresh)
    log = strict_pipe.process_batch(stale).collect()
    assert log[0].applied is False  # scored but not applied
    rec = strict_pipe.feature_group.online_view(strict_event_time=True).collect()[0]
    assert rec.latest_purchase_value == 100.0
    assert rec.avg_purchase_value == 100.0  # untouched by the stale event

    parity_pipe = make_pipeline(spark, tmp_path / "parity")
    parity_pipe.process_batch(fresh)
    parity_pipe.process_batch(stale)
    rec = parity_pipe.feature_group.online_view().collect()[0]
    assert rec.latest_purchase_value == 10.0  # arrival order wins
    assert rec.avg_purchase_value == (100.0 + 10.0) / 2
