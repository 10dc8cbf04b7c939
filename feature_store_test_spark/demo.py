"""Runnable tour: ``python -m feature_store_test_spark.demo [sf_dir]``.

Runs the reference workflow end-to-end on the smoke fixture, then a handful
of headline queries, printing a compact summary — the quickest way to see
the engine do everything the reference does (and the extensions) in one
sitting.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from feature_store_test_spark.queries.feature_parity import purchases_from_events
    from feature_store_test_spark.registry import all_queries
    from feature_store_test_spark.session import get_spark
    from feature_store_test_spark.workflow import run_workflow

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="fsts_demo_")

    print(f"== reference workflow on {sf_dir} ==")
    purchases = purchases_from_events(spark, sf_dir)
    cut = "2024-01-22"
    res = run_workflow(
        spark,
        historical=purchases.where(F.col("purchase_timestamp") < cut),
        inference_events=purchases.where(F.col("purchase_timestamp") >= cut).drop(
            "loyalty_score"
        ),
        base_path=work,
    )
    print(f"  engineered features : {res.engineered.count()} keys")
    print(f"  training set        : {res.training_set.count()} rows (full history)")
    print(f"  inference predictions: {res.prediction_log.count()} events scored")
    print(f"  online view         : {res.feature_group.online_view().count()} latest records")
    print(f"  offline versions    : {res.feature_group.table.latest_version()} commits")

    print("== headline queries ==")
    specs = all_queries()
    for name in [
        "q01_pricing_summary",
        "q15_asof_join",
        "q21_minhash_near_dups",
        "q28_cosine_topk",
        "q51_data_quality",
    ]:
        df = specs[name].fn(spark, sf_dir)
        print(f"  {name:28s} {df.count():>6} rows — {specs[name].doc}")

    print("done.")


if __name__ == "__main__":
    main()
