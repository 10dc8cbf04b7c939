"""Training-data pipeline operators (queries/pipeline.py,
operators/rangejoin.py): determinism, split arithmetic, and the binned
range join's equivalence to the naive nested-loop form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.operators.rangejoin import interval_join
from feature_store_test_spark.registry import all_queries


def test_hash_split_is_deterministic_and_complete(spark, sf_dir):
    """Same input → identical split; every doc lands in exactly one split."""
    q = all_queries()["q79_hash_split"].fn
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    b = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert a == b
    total = sum(r[2] for r in a)
    assert total == load_table(spark, "documents", sf_dir).count()
    # ≈80/10/10 by construction ('cd' = 205/256, 'e6' = 230/256)
    train = sum(r[2] for r in a if r[0] == "train")
    assert 0.6 < train / total < 0.95


def test_source_mixing_rates_monotone(spark, sf_dir):
    """Lower cutoff → (stochastically) fewer survivors; full-rate sources
    keep everything."""
    docs = load_table(spark, "documents", sf_dir)
    kept = {
        r.source: r.n_kept
        for r in all_queries()["q80_source_mixing"].fn(spark, sf_dir).collect()
    }
    full = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for i in range(4):  # cutoff 'ff' ≈ keep-all (md5 prefix 'ff' itself is the only loss)
        assert kept[f"src{i}"] >= full[f"src{i}"] * 0.9
    for i in range(16, 20):  # cutoff '10' ≈ 1/16 keep rate
        assert kept.get(f"src{i}", 0) <= full[f"src{i}"] * 0.4


def test_sequence_packing_respects_budget(spark, sf_dir):
    """Each bin's token total stays under budget + one max-doc overhang
    (concat-and-chunk lets the last doc straddle the boundary)."""
    rows = all_queries()["q81_sequence_packing"].fn(spark, sf_dir).collect()
    max_doc_tokens = (
        load_table(spark, "documents", sf_dir)
        .agg(F.max(F.ceil(F.col("n_chars") / 4.0)).alias("m"))
        .collect()[0]
        .m
    )
    for r in rows:
        assert r.bin_tokens <= 512 + max_doc_tokens
    # bins are contiguous from 0 within each lang
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.bin)
    for lang, bins in by_lang.items():
        assert sorted(bins) == list(range(len(bins))), lang


def test_interval_join_matches_naive_join(spark, sf_dir):
    """Binned equi-join + refine ≡ the naive theta join, including
    intervals that span multiple bins."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "user_id")
    win = (
        ev.where(F.col("user_id") < 5)
        .groupBy(F.col("user_id").alias("w_user"))
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 5 HOURS"))
    )
    binned = interval_join(ev, win, "ts", "w_start", "w_end", bin_seconds=3600)
    naive = ev.join(
        win, (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end"))
    )
    b = sorted((r.event_id, r.w_user) for r in binned.collect())
    n = sorted((r.event_id, r.w_user) for r in naive.collect())
    assert b == n and len(b) > 0


def test_interval_join_plan_is_equi_join_not_nested_loop(spark, sf_dir):
    """The point of binning: the physical plan must be a hash/merge equi
    join on the bin id, never BroadcastNestedLoopJoin."""
    df = all_queries()["q82_activity_window_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)
