"""ServingSession: point reads without a Spark job per call.

Parity target: the reference's get_latest_features
(/root/reference/core/feature_store_manager.py:184-204) — single-key reads
answered from an online store in milliseconds. The session must agree
exactly with FeatureGroup.get_latest (the Spark-job point read) and answer
lookups orders of magnitude under the Spark job floor.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from feature_store_test_spark.store import ServingSession
from tests.test_store import FG_SCHEMA, make_fg, row


def test_serving_matches_get_latest(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    fg.ingest(
        spark.createDataFrame(
            [row(i, 1, 10.0 + i, 10.0, 5.0, 5.0) for i in range(20)], FG_SCHEMA
        )
    )
    fg.ingest(spark.createDataFrame([row(3, 2, 99.0, 50.0, 6.0, 7.0)], FG_SCHEMA))
    s = ServingSession(fg)
    assert len(s) == 20
    for key in [0, 3, 7, 19, 42]:  # 42 absent
        assert s.get_record(key) == fg.get_latest(key)
        assert s.exists(key) == fg.exists(key)
    batch = s.get_records([1, 2, 42])
    assert batch[1]["latest_purchase_value"] == 11.0
    assert batch[42] is None


def test_serving_staleness_and_refresh(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    s = ServingSession(fg)
    assert s.get_record(1)["latest_purchase_value"] == 10.0

    # upsert through the feature group; the snapshot is as-of its version
    updates = spark.createDataFrame(
        [(1, row(1, 2, 0, 0, 0, 0)[1], 30.0)],
        "customer_id long, purchase_timestamp timestamp, purchase_value double",
    )
    fg.upsert(updates, {"purchase_value": "purchase_value"})
    assert s.get_record(1)["latest_purchase_value"] == 10.0  # stale by contract
    assert s.refresh() is True
    assert s.get_record(1)["latest_purchase_value"] == fg.get_latest(1)[
        "latest_purchase_value"
    ]
    assert s.refresh() is False  # version unchanged -> no Spark job
    # returned dicts are copies — mutating one must not poison the snapshot
    s.get_record(1)["latest_purchase_value"] = -1.0
    assert s.get_record(1)["latest_purchase_value"] != -1.0


def test_serving_lookup_latency_under_job_floor(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    fg.ingest(
        spark.createDataFrame(
            [row(i, 1, float(i), 10.0, 5.0, 5.0) for i in range(500)], FG_SCHEMA
        )
    )
    s = ServingSession(fg)
    n = 10_000
    t0 = time.perf_counter()
    for i in range(n):
        assert s.get_record(i % 500) is not None
    per_lookup = (time.perf_counter() - t0) / n
    # Spark's per-job floor is ~0.2s; serving reads must be >1000x under it
    assert per_lookup < 1e-4, f"{per_lookup:.2e}s per lookup"
