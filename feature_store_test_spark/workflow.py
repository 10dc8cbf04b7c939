"""End-to-end reference workflow (/root/reference/main.py:96-134) as one call.

A user of the reference runs: load CSV → engineer features → create feature
group → ingest → build training dataset → train model → run the real-time
inference pipeline. ``run_workflow`` is that exact sequence on this engine —
each stage is the Spark-native module the rest of the package exposes, so
the orchestration is ~40 lines of wiring, not logic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from feature_store_test_spark import ml
from feature_store_test_spark.engineering import engineer_features
from feature_store_test_spark.store import FeatureGroup, FeatureStore
from feature_store_test_spark.streaming import InferencePipeline

FEATURE_GROUP_NAME = "customer_purchase_features"

FG_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("purchase_timestamp", T.TimestampType()),
        T.StructField("latest_purchase_value", T.DoubleType()),
        T.StructField("avg_purchase_value", T.DoubleType()),
        T.StructField("avg_loyalty_score", T.DoubleType()),
        T.StructField("latest_loyalty_score", T.DoubleType()),
    ]
)


@dataclass
class WorkflowResult:
    feature_group: FeatureGroup
    pipeline: InferencePipeline
    engineered: DataFrame
    training_set: DataFrame
    model_path: str
    prediction_log: DataFrame | None


def run_workflow(
    spark: SparkSession,
    historical: DataFrame,
    inference_events: DataFrame | None,
    base_path: str,
    strict_event_time: bool = False,
) -> WorkflowResult:
    """The reference's main.py on Spark.

    historical: columns (event_id, customer_id, purchase_timestamp,
    purchase_value, loyalty_score) — the engineered/training side.
    inference_events: same minus loyalty_score — the streaming side
    (pass None to skip inference).
    """
    # 1. feature engineering (main.py:99; Q1/Q2 fixed)
    engineered = engineer_features(
        historical,
        key="customer_id",
        event_time="purchase_timestamp",
        value_cols=["purchase_value", "loyalty_score"],
        tiebreak="event_id",
    ).select(*FG_SCHEMA.fieldNames())

    # 2. feature group + ingest (main.py:103-113) — one atomic commit
    store = FeatureStore(spark, base_path)
    fg = store.create(
        FEATURE_GROUP_NAME, FG_SCHEMA, "customer_id", "purchase_timestamp"
    )
    fg.ingest(engineered)

    # 3. training dataset via the SQL path (main.py:127) + train (128-130)
    training_set = fg.training_dataset()
    model = ml.train_model(training_set)
    model_path = f"{base_path}/{FEATURE_GROUP_NAME}_model"
    ml.save_model(model, model_path)

    # 4. real-time inference (main.py:133-134)
    pipeline = InferencePipeline(
        spark=spark,
        feature_group=fg,
        scorer=ml.to_linear_scorer(ml.load_model(spark, model_path)),
        dlq_path=f"{base_path}/{FEATURE_GROUP_NAME}_dlq",
        strict_event_time=strict_event_time,
    )
    log = None
    if inference_events is not None:
        log = pipeline.process_batch(inference_events)
        pipeline.retry_dlq()

    return WorkflowResult(
        feature_group=fg,
        pipeline=pipeline,
        engineered=engineered,
        training_set=training_set,
        model_path=model_path,
        prediction_log=log,
    )
