"""End-to-end reference workflow (main.py parity) through run_workflow."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.queries.feature_parity import purchases_from_events
from feature_store_test_spark.workflow import FG_SCHEMA, run_workflow


def test_full_workflow(spark, sf_dir, tmp_path):
    purchases = purchases_from_events(spark, sf_dir)
    # 70/30 time split like the reference's pre-split inputs (README.md:33-36)
    cut = "2024-01-22"
    historical = purchases.where(F.col("purchase_timestamp") < cut)
    inference = purchases.where(F.col("purchase_timestamp") >= cut).drop(
        "loyalty_score"
    )

    res = run_workflow(spark, historical, inference, str(tmp_path / "wf"))

    # reference tests.py assertions
    assert set(res.engineered.columns) == set(FG_SCHEMA.fieldNames())
    n_hist_keys = historical.select("customer_id").distinct().count()
    assert res.engineered.count() == n_hist_keys
    # training set = full history (Q3 semantics)
    assert res.training_set.count() == n_hist_keys  # one commit so far
    # inference processed every event and updated the store
    assert res.prediction_log.count() == inference.count()
    online = res.feature_group.online_view()
    all_keys = purchases.select("customer_id").distinct().count()
    assert online.count() == all_keys
    # offline history: ingest commit + inference commit
    assert res.feature_group.table.latest_version() == 2
    # model artifact round-trips
    from feature_store_test_spark.ml import load_model

    assert load_model(spark, res.model_path) is not None
