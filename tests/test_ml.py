"""Train / save / load / score (SURVEY §2.12 M2-M3)."""

from __future__ import annotations

import pytest

from feature_store_test_spark.ml import (
    TRAINING_FEATURES,
    load_model,
    save_model,
    score,
    to_linear_scorer,
    train_model,
)
from feature_store_test_spark.queries.feature_parity import q16_engineer_features


@pytest.fixture(scope="module")
def engineered(spark, sf_dir):
    return q16_engineer_features(spark, sf_dir).cache()


def test_train_and_score(spark, engineered):
    model = train_model(engineered)
    scored = score(model, engineered)
    assert "prediction" in scored.columns
    assert scored.count() == engineered.count()
    preds = [r.prediction for r in scored.collect()]
    assert all(p == p for p in preds)  # no NaNs


def test_save_load_roundtrip(spark, engineered, tmp_path):
    model = train_model(engineered)
    path = str(tmp_path / "model")
    save_model(model, path)
    loaded = load_model(spark, path)
    a = [r.prediction for r in score(model, engineered).orderBy("customer_id").collect()]
    b = [r.prediction for r in score(loaded, engineered).orderBy("customer_id").collect()]
    assert a == pytest.approx(b)


def test_random_split_train_holdout(spark, engineered):
    """M1: the reference's offline 70/30 split (README.md:33-36) as
    randomSplit; deterministic under a fixed seed."""
    train, test = engineered.randomSplit([0.7, 0.3], seed=42)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == engineered.count()
    t2, _ = engineered.randomSplit([0.7, 0.3], seed=42)
    assert t2.count() == n_train  # same seed → same split
    model = train_model(train)
    assert score(model, test).count() == n_test


def test_linear_scorer_matches_model(spark, engineered):
    """The exported fold-side scorer reproduces model.transform exactly."""
    model = train_model(engineered)
    scorer = to_linear_scorer(model)
    rows = engineered.orderBy("customer_id").limit(10).collect()
    spark_preds = [
        r.prediction
        for r in score(model, engineered.orderBy("customer_id").limit(10)).collect()
    ]
    for r, sp in zip(rows, spark_preds):
        local = scorer.predict_row({c: getattr(r, c) for c in TRAINING_FEATURES})
        assert local == pytest.approx(sp, rel=1e-9)
