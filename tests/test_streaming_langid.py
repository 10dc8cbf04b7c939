"""Streaming langid twin (streaming/langid.py): batch/stream prediction
parity against the q157 classification half, through the REAL
readStream -> foreachBatch path."""

from __future__ import annotations

from feature_store_test_spark.data import load_table
from feature_store_test_spark.operators.langid import (
    classify_trigrams,
    train_trigram_profiles,
)
from feature_store_test_spark.streaming.langid import StreamingLangId


def _batch_predictions(spark, sf_dir) -> dict:
    docs = load_table(spark, "documents", sf_dir)
    profiles, langs = train_trigram_profiles(docs)
    pred = classify_trigrams(docs, profiles, langs)
    return {r.doc_id: r.predicted_lang for r in pred.collect()}


def test_stream_matches_batch_predictions(spark, sf_dir, tmp_path):
    """Micro-batched classification must equal the one-shot batch run
    row for row: prediction is a pure function of (text, profiles), and
    the stream broadcasts the SAME trained profiles into every batch."""
    docs = load_table(spark, "documents", sf_dir)
    clf = StreamingLangId.train(docs)
    try:
        src = str(tmp_path / "src")
        # 4 files -> maxFilesPerTrigger drains them as separate batches
        docs.select("doc_id", "text").repartition(4).write.parquet(src)
        out: dict = {}

        def sink(batch, batch_id):
            for r in clf.process_batch(batch, batch_id).collect():
                assert r.doc_id not in out  # each doc classified once
                out[r.doc_id] = r.predicted_lang

        schema = spark.read.parquet(src).schema
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert out == _batch_predictions(spark, sf_dir)
    finally:
        clf.close()


def test_process_batch_direct_backfill(spark, sf_dir):
    """Direct (non-stream) invocation — the backfill contract shared
    with NearDupIngest/InferencePipeline — and the short-doc gate."""
    docs = load_table(spark, "documents", sf_dir)
    clf = StreamingLangId.train(docs)
    try:
        tiny = spark.createDataFrame(
            [(900001, "ab")], "doc_id long, text string"
        )
        assert clf.process_batch(tiny).collect() == []  # < one trigram
        sample = docs.select("doc_id", "text").limit(20)
        got = {
            r.doc_id: r.predicted_lang
            for r in clf.process_batch(sample).collect()
        }
        want = _batch_predictions(spark, sf_dir)
        assert got == {k: want[k] for k in got}
        assert len(got) == 20
    finally:
        clf.close()
