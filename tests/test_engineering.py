"""Reference-parity assertions ported from /root/reference/tests.py:39-74."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.queries.feature_parity import (
    purchases_from_events,
    q16_engineer_features,
)

EXPECTED_COLS = {
    "customer_id",
    "purchase_timestamp",
    "latest_purchase_value",
    "avg_purchase_value",
    "avg_loyalty_score",
    "latest_loyalty_score",
}


def test_engineered_schema_exact(spark, sf_dir):
    feats = q16_engineer_features(spark, sf_dir)
    assert set(feats.columns) == EXPECTED_COLS


def test_one_row_per_customer(spark, sf_dir):
    """count(*) == countDistinct(key) — reference tests.py:63-71."""
    feats = q16_engineer_features(spark, sf_dir)
    purchases = purchases_from_events(spark, sf_dir)
    n_rows = feats.count()
    n_keys = purchases.select(F.countDistinct("customer_id")).collect()[0][0]
    assert n_rows == n_keys


def test_latest_is_by_event_time_not_row_order(spark, sf_dir):
    """SURVEY §2.13 Q1: latest must follow (ts, id), not input order."""
    purchases = purchases_from_events(spark, sf_dir)
    # reverse the input order completely; result must be unchanged
    from feature_store_test_spark.engineering import engineer_features

    a = engineer_features(
        purchases, "customer_id", "purchase_timestamp",
        ["purchase_value", "loyalty_score"], "event_id",
    )
    b = engineer_features(
        purchases.orderBy(F.col("event_id").desc()), "customer_id",
        "purchase_timestamp", ["purchase_value", "loyalty_score"], "event_id",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
