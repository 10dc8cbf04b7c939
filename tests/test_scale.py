"""Scale-mechanism tests: the runtime machinery the 100 TB story leans on
(AQE skew-partition splitting, runtime bloom-filter join pruning) must
actually engage on this Spark build — these pin the confs and plan shapes.

Both mechanisms trigger on *size thresholds* that local toy data never
crosses, so the tests shrink the thresholds to make the machinery fire;
at cluster scale the defaults (256 MB skew threshold, 10 GB bloom
application-side scan) fire on real data with no conf changes.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, pairs: dict[str, str]):
    old: dict[str, str | None] = {}
    for k, v in pairs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """A 90%-one-key join must come out of AQE with the skewed partition
    split (SortMergeJoin(skew=true)) instead of one straggler task owning
    90% of the rows. Thresholds are shrunk so the ~20 MB hot partition
    counts as skewed locally; the 100 TB defaults are 256 MB + 5x median.
    """
    with _confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # the session default allows AQE runtime broadcast conversion
            # (adaptive threshold 64m) which would sidestep the skew split
            # this test pins — disable both tiers
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        },
    ):
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
            F.lpad(F.lit("x"), 100, "x").alias("pad"),
        )
        right = spark.range(50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 185_000  # 180k hot-key rows + 20k tail
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partitions"


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """A selective dimension filter must inject a runtime bloom filter on
    the fact side's join key (bloom_filter_agg on the build side,
    might_contain ahead of the probe-side shuffle) — rows that cannot
    join die at the scan instead of riding the shuffle. Locally the
    10 GB application-side threshold is lowered to 0 to make the rule
    fire on fixture-sized scans.
    """
    with _confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        },
    ):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pt = spark.read.parquet(f"{sf_dir}/part.parquet").where("p_size = 1")
        j = li.join(pt, li.l_partkey == pt.p_partkey).select("l_orderkey", "p_name")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # the bloom probe sits on the fact side, keyed by the join column
        assert "might_contain" in plan and "l_partkey" in plan.split("might_contain")[1][:80]


def test_exact_collapse_correct_without_broadcast(spark, sf_dir):
    """The 100 TB join shape of the exact-collapse pipeline: at fixture
    scale the dup-group map rides broadcast joins, but at corpus scale it
    exceeds the broadcast threshold and every group-map join (rep semi
    join, both expansion sides, the within-group survivor semi join) must
    degrade to shuffle joins with identical results. Disabling both
    broadcast thresholds forces that shape; the collapsed pipeline must
    stay row-identical to the direct (no-collapse) pipeline."""
    from feature_store_test_spark.data import load_table
    from feature_store_test_spark.operators.dedup import minhash_near_dups

    docs = load_table(spark, "documents", sf_dir)
    direct = {
        tuple(r)
        for r in minhash_near_dups(
            docs, "doc_id", "text", threshold=0.5, collapse=False
        ).collect()
    }
    with _confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        collapsed = minhash_near_dups(
            docs, "doc_id", "text", threshold=0.5, collapse=True
        )
        # the forced shape really is broadcast-free
        plan = collapsed._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan and "BroadcastNestedLoop" not in plan
        got = {tuple(r) for r in collapsed.collect()}
    assert got == direct


def test_grid_salted_join_survives_broadcast_off(spark):
    """The grid join's 100 TB shape is a shuffle join on (key, __gb, __gs)
    — the small side is only *mid-size* in the composite-skew scenario,
    so the plan must be correct when nothing can broadcast. Pin: result
    equals the plain join with both broadcast tiers disabled, and the
    executed plan contains no BroadcastExchange."""
    from feature_store_test_spark.operators.skew import grid_salted_join

    with _confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        big = spark.range(50_000).select(
            F.when(F.col("id") < 40_000, F.lit(3)).otherwise(F.col("id") % 20).alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(20).select(
            (F.col("id") % 10).alias("sk"), (F.col("id") * 7).alias("dim")
        )
        got = grid_salted_join(big, small, "k", "sk", n_salt_big=4, n_salt_small=2)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        want = big.join(small, F.col("k") == F.col("sk"), "inner")
        assert sorted((r.payload, r.dim) for r in got.collect()) == sorted(
            (r.payload, r.dim) for r in want.collect()
        )
