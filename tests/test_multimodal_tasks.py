"""python_stage_tasks sizing contract (the knob that serialized the real
codec queries when it first landed without the CPU-bound clamp).

Sizing rules under test:
- file-backed sources size by COMPRESSED bytes (one task per
  ``bytes_per_task``), because cheap per-row Python stages are dominated
  by the fixed Arrow/worker round-trip;
- ``min_tasks`` clamps the floor for CPU-bound decode stages (real
  codecs expand 10-100x per input byte — 1-2 tasks serializes seconds
  of numpy per task);
- non-file plans (local relations) return None so callers leave the
  partitioning alone.
"""

from __future__ import annotations

import os

from feature_store_test_spark.data import load_table
from feature_store_test_spark.operators.multimodal import python_stage_tasks

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_small_file_sizes_to_one_task(spark):
    docs = load_table(spark, "documents", SF)
    # sf0.001 documents.parquet is a few KB — far under one 2MB target
    assert python_stage_tasks(docs) == 1


def test_min_tasks_clamps_cpu_bound_stages(spark):
    docs = load_table(spark, "documents", SF)
    cores = spark.sparkContext.defaultParallelism
    assert python_stage_tasks(docs, min_tasks=cores) == cores


def test_byte_term_dominates_past_the_clamp(spark):
    docs = load_table(spark, "documents", SF)
    total = sum(
        os.path.getsize(f[len("file:"):] if f.startswith("file:") else f)
        for f in docs.inputFiles()
    )
    # tiny bytes_per_task: the byte term exceeds any realistic clamp,
    # exactly the 100 TB regime where min_tasks must be inert
    n = python_stage_tasks(docs, bytes_per_task=64, min_tasks=4)
    assert n == max(4, -(-total // 64))
    assert n > 4


def test_non_file_plans_opt_out(spark):
    local = spark.createDataFrame([(1, b"x")], "doc_id long, blob binary")
    assert python_stage_tasks(local) is None


def test_real_decode_paths_use_every_core(spark):
    """The regression shape itself: a real-decode stage over a small
    file-backed source must not plan fewer tasks than cores."""
    from feature_store_test_spark.operators import multimodal as mm

    docs = load_table(spark, "documents", SF).limit(50)
    # audio_features on arbitrary bytes yields decode_error rows — the
    # partitioning is what's under test, not the decode result
    feats = mm.audio_features(
        docs.selectExpr("doc_id", "cast(text as binary) as blob")
    )
    cores = spark.sparkContext.defaultParallelism
    assert feats.rdd.getNumPartitions() >= min(
        cores, docs.rdd.getNumPartitions()
    ) or feats.rdd.getNumPartitions() == docs.rdd.getNumPartitions()
