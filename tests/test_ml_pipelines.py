"""ML pipeline smoke tests (SURVEY.md §5.4): fit on the taxi fixture,
metrics in sane bounds, save→load→transform round-trip, seed determinism."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.ml import PipelineModel
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.ml.pipelines import (
    FeatureConfig,
    classification_lr,
    classification_rf,
    fit_and_evaluate_classification,
    fit_and_evaluate_regression,
    regression_lr,
    regression_rf,
    score_with_threshold,
    train_test_split,
)
from nyc_taxi_pyspark_spark.operators.taxi import clean_trips, engineer_features

CFG = FeatureConfig(
    numeric_cols=[
        "trip_distance",
        "fare_amount",
        "duration_min",
        "pickup_hour",
        "pickup_dow",
        "is_weekend",
        "night_flag",
    ],
    categorical_cols=["payment_type"],
)


@pytest.fixture(scope="module")
def featured(trips):
    df = engineer_features(clean_trips(trips)).na.fill({"payment_type": 5})
    return df.cache()


def test_feature_config_schema_tolerance(featured):
    cfg = FeatureConfig(
        numeric_cols=["trip_distance", "nonexistent_col"],
        categorical_cols=["payment_type", "also_missing"],
    ).available(featured)
    assert cfg.numeric_cols == ["trip_distance"]
    assert cfg.categorical_cols == ["payment_type"]


def test_regression_lr_and_roundtrip(featured):
    train, test = train_test_split(featured, "total_amount")
    model, metrics = fit_and_evaluate_regression(
        regression_lr(CFG, "total_amount"), train, test, "total_amount"
    )
    assert metrics["rmse"] > 0
    assert metrics["r2"] > 0.5  # fare is ~linear in distance by construction
    with tempfile.TemporaryDirectory() as d:
        model.write().overwrite().save(d)
        loaded = PipelineModel.load(d)
        a = model.transform(test).agg(F.sum("prediction")).first()[0]
        b = loaded.transform(test).agg(F.sum("prediction")).first()[0]
        assert abs(a - b) < 1e-6


def test_classification_lr_threshold_scoring(featured):
    train, test = train_test_split(featured, "label_tip")
    model, metrics = fit_and_evaluate_classification(
        classification_lr(CFG, "label_tip"), train, test, "label_tip"
    )
    assert 0.5 <= metrics["auc"] <= 1.0
    assert 0.5 <= metrics["accuracy"] <= 1.0
    scored = score_with_threshold(model, test, threshold=0.5)
    r = scored.agg(
        F.min("proba1").alias("lo"),
        F.max("proba1").alias("hi"),
        F.sum((F.col("pred_at_threshold") != F.col("prediction").cast("int")).cast("int")).alias("mismatch"),
    ).first()
    assert 0.0 <= r.lo and r.hi <= 1.0
    assert r.mismatch == 0  # at t=0.5 thresholded == argmax prediction


def test_random_forests_fit(featured):
    train, test = train_test_split(featured, "total_amount")
    _, reg_metrics = fit_and_evaluate_regression(
        regression_rf(CFG, "total_amount"), train, test, "total_amount"
    )
    assert reg_metrics["r2"] > 0.3
    train_c, test_c = train_test_split(featured, "label_tip")
    _, cls_metrics = fit_and_evaluate_classification(
        classification_rf(CFG, "label_tip"), train_c, test_c, "label_tip"
    )
    assert cls_metrics["auc"] >= 0.5


def test_split_deterministic(featured):
    t1, _ = train_test_split(featured, "total_amount")
    t2, _ = train_test_split(featured, "total_amount")
    assert t1.count() == t2.count()
    assert t1.exceptAll(t2).count() == 0


def test_cross_validation_grid_search(spark, trips):
    from nyc_taxi_pyspark_spark.ml.pipelines import (
        FeatureConfig,
        cross_validate_classification,
        train_test_split,
    )
    from nyc_taxi_pyspark_spark.operators.taxi import clean_trips, engineer_features

    feat = engineer_features(clean_trips(trips)).na.fill({"payment_type": 5})
    cfg = FeatureConfig(
        numeric_cols=["trip_distance", "pickup_hour"],
        categorical_cols=["payment_type"],
    )
    train, _ = train_test_split(feat, "label_tip")
    best_model, best, avg_metrics = cross_validate_classification(
        cfg, "label_tip", train, num_folds=2
    )
    # grid is 2x2; the chosen point must come from it and metrics be sane AUCs
    assert best["regParam"] in (0.01, 0.1)
    assert best["elasticNetParam"] in (0.0, 0.5)
    assert len(avg_metrics) == 4
    assert all(0.5 <= m <= 1.0 for m in avg_metrics)
    # deterministic under the fixed seed: rerun picks the same point
    _, best2, _ = cross_validate_classification(cfg, "label_tip", train, num_folds=2)
    assert best2 == best


def test_save_model_with_metrics_artifact_layout(featured, tmp_path):
    """S12 — the reference persists metrics.json beside every saved model
    (spark_jobs/04a_reg_total_lr_PIPE.py:84-87) and the UI reads it back
    (app5.py:172-181): fit -> save_model_with_metrics -> metrics.json
    round-trips, and serve.scoring loads the model from the artifact root."""
    import json
    import os

    from nyc_taxi_pyspark_spark.ml.pipelines import (
        load_saved_metrics,
        save_model_with_metrics,
    )
    from nyc_taxi_pyspark_spark.serve.scoring import load_metrics, load_model

    train, test = train_test_split(featured, "label_tip")
    model, metrics = fit_and_evaluate_classification(
        classification_lr(CFG, "label_tip"), train, test, "label_tip"
    )
    out = str(tmp_path / "artifact")
    model_path = save_model_with_metrics(model, metrics, out)
    assert model_path == os.path.join(out, "model")
    with open(os.path.join(out, "metrics.json"), encoding="utf-8") as f:
        assert json.load(f) == pytest.approx(metrics)
    # reader accepts the artifact root AND the model subdir (app5 looks up)
    assert load_saved_metrics(out) == pytest.approx(metrics)
    assert load_saved_metrics(model_path) == pytest.approx(metrics)
    assert load_metrics(out) == pytest.approx(metrics)
    # layout-tolerant load: artifact root or bare model dir both work
    a = load_model(out).transform(test).agg(F.sum("prediction")).first()[0]
    b = load_model(model_path).transform(test).agg(F.sum("prediction")).first()[0]
    assert a == pytest.approx(b)
    # absent metrics -> soft None, matching the reference UI
    assert load_saved_metrics(str(tmp_path)) is None


def test_native_metrics_match_evaluator_definitions(spark):
    """The DataFrame-only fallback metrics equal the evaluator definitions
    on a hand-checkable frame (AUC = Mann-Whitney midrank form == ROC
    trapezoid with tie grouping; accuracy/rmse/mae/r2 = their formulas)."""
    from pyspark.ml.linalg import Vectors

    from nyc_taxi_pyspark_spark.ml.pipelines import (
        _native_classification_metrics,
        _native_regression_metrics,
    )

    # scores: two positives at .9/.6, two negatives at .6/.2
    # midranks: .2→1, .6→(2+3)/2=2.5, .9→4; R+ = 4 + 2.5 = 6.5
    # AUC = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
    rows = [
        (Vectors.dense([0.1, 0.9]), 1.0, 1),
        (Vectors.dense([0.4, 0.6]), 1.0, 1),
        (Vectors.dense([0.4, 0.6]), 1.0, 0),
        (Vectors.dense([0.8, 0.2]), 0.0, 0),
    ]
    pred = spark.createDataFrame(rows, ["probability", "prediction", "y"])
    m = _native_classification_metrics(pred, "y")
    assert m["auc"] == pytest.approx(0.875)
    assert m["accuracy"] == pytest.approx(0.75)  # row 3 predicted 1, label 0

    reg = spark.createDataFrame(
        [(1.0, 1.5), (2.0, 2.0), (3.0, 2.5)], ["y", "prediction"]
    )
    r = _native_regression_metrics(reg, "y")
    assert r["rmse"] == pytest.approx((0.5**2 * 2 / 3) ** 0.5)
    assert r["mae"] == pytest.approx(1.0 / 3)
    # sst = 2.0, sse = 0.5 -> r2 = 0.75
    assert r["r2"] == pytest.approx(0.75)


def test_evaluate_survives_prior_observation(featured):
    """Spark 4.1 bug regression (round-11): an Observation registered
    BEFORE a pipeline fit poisons the fitted model's DF->RDD path, which
    MLlib's RDD-backed evaluators use — fit_and_evaluate_* must detect the
    specific Task-not-serializable/ObservationManager failure and fall
    back to the native DataFrame metrics, so observe-then-train sessions
    keep working."""
    from pyspark.sql import Observation

    obs = Observation("poison_probe")
    featured.observe(obs, F.count(F.lit(1)).alias("n")).count()
    assert obs.get["n"] > 0

    train, test = train_test_split(featured, "label_tip")
    model, metrics = fit_and_evaluate_classification(
        classification_lr(CFG, "label_tip"), train, test, "label_tip"
    )
    assert 0.5 <= metrics["auc"] <= 1.0
    assert 0.5 <= metrics["accuracy"] <= 1.0
    # the serving path (collect on the transform output) must work too —
    # before the strip_training_summaries fix, EVERY collect/write on a
    # post-observation model's output died, not just the evaluators
    scored = score_with_threshold(model, test, threshold=0.5)
    rows = scored.select("proba1", "pred_at_threshold").limit(5).collect()
    assert len(rows) > 0 and all(0.0 <= r.proba1 <= 1.0 for r in rows)
    train_r, test_r = train_test_split(featured, "total_amount")
    _, reg = fit_and_evaluate_regression(
        regression_lr(CFG, "total_amount"), train_r, test_r, "total_amount"
    )
    assert reg["rmse"] > 0 and reg["r2"] > 0.5


def test_native_auc_partition_invariant(spark):
    """The fallback AUC's ranks are exact integers over distinct scores,
    so the statistic must be bit-identical under any input layout."""
    from pyspark.ml.linalg import Vectors

    from nyc_taxi_pyspark_spark.ml.pipelines import _native_classification_metrics

    import random

    rng = random.Random(7)
    rows = [
        (Vectors.dense([1 - s, s]), float(s >= 0.5), y)
        for s, y in (
            (round(rng.random(), 3), rng.randint(0, 1)) for _ in range(400)
        )
    ]
    base = spark.createDataFrame(rows, ["probability", "prediction", "y"])
    vals = {
        tuple(
            _native_classification_metrics(df, "y").items()
        )
        for df in (base.coalesce(1), base.repartition(17), base.repartition(5, "y"))
    }
    assert len(vals) == 1
