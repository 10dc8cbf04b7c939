"""Co-grouped pandas as-of (operators/cogroup.py) must agree row-for-row
with the relational as-of join (operators/asof.py) — same semantics, two
execution strategies (JVM window vs per-key Arrow/pandas).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.operators.asof import asof_join
from feature_store_test_spark.operators.cogroup import cogroup_asof


def _frames(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).where(F.col("user_id") < 60)
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    # dedup right on (key, time): with duplicate timestamps the "which
    # right row wins the tie" choice is engine-internal on both paths, so
    # the equivalence contract is defined on unique (key, time) histories
    right = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("value").alias("click_value"))
    )
    return left, right


def test_cogroup_asof_equals_relational_asof(spark, sf_dir):
    left, right = _frames(spark, sf_dir)
    relational = asof_join(
        left,
        right,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        right_values=["click_value"],
    ).select("user_id", "ts", "purchase_id", "click_value")
    cogrouped = cogroup_asof(
        left,
        right,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        right_values=["click_value"],
    ).select("user_id", "ts", "purchase_id", "click_value")

    key = lambda r: (r.user_id, r.ts, r.purchase_id)  # noqa: E731
    a = sorted(map(tuple, relational.collect()), key=lambda t: t[:3])
    b = sorted(map(tuple, cogrouped.collect()), key=lambda t: t[:3])
    assert len(a) == left.count() == len(b)
    assert a == b


def test_cogroup_asof_null_for_keys_with_no_right_history(spark, sf_dir):
    left, right = _frames(spark, sf_dir)
    only_left_keys = left.join(right, "user_id", "left_anti")
    if only_left_keys.count() == 0:
        # every purchase user also clicked at this SF — synthesize one
        extra = left.limit(1).withColumn("user_id", F.lit(-1))
        left = left.unionByName(extra)
    got = cogroup_asof(
        left, right, "user_id", "ts", "click_ts", ["click_value"]
    )
    no_hist = got.join(right.select("user_id").distinct(), "user_id", "left_anti")
    assert no_hist.count() > 0
    assert no_hist.where(F.col("click_value").isNotNull()).count() == 0
