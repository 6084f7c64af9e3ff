"""MLlib pipelines (SURVEY.md §2.11, M1-M13) — parameterized versions of the
reference's four model jobs.

Reference configurations reproduced:
  - preprocessing: StringIndexer(handleInvalid=keep) → OneHotEncoder →
    Imputer(median) → VectorAssembler(handleInvalid=keep) →
    StandardScaler(withMean, withStd)   (spark_jobs/03b_vectorize_scale.py:30-44)
  - LinearRegression maxIter=50 regParam=0.1 elasticNet=0 standardization=False
    (spark_jobs/04a_reg_total_lr_PIPE.py:59-66)
  - LogisticRegression maxIter=50 regParam=0.1 (04b:66)
  - RandomForestRegressor numTrees=60 maxDepth=8 maxBins=32 subsample=0.7
    featureSubsetStrategy=sqrt seed=42 (04c:48-58)
  - RandomForestClassifier numTrees=80 maxDepth=10 (04d:57-60)
  - evaluators: RMSE/MAE/R² and AUC/accuracy (04a:78-80, 04b:77-80)
  - train/test: randomSplit([0.8, 0.2], seed=42) after dropna(label) (M12)
  - thresholded scoring via vector_to_array(probability)[1] (app5.py:406-408)

Scale notes: every fit stage is a constant number of Spark jobs over the
training frame (groupBy for the indexer, percentile for the imputer, stats
for the scaler, L-BFGS/tree passes for the estimators) — nothing here is
driver-bound except the (small) model itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.feature import (
    Imputer,
    OneHotEncoder,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.functions import vector_to_array
from pyspark.ml.regression import LinearRegression, RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


@dataclass
class FeatureConfig:
    numeric_cols: list[str]
    categorical_cols: list[str] = field(default_factory=list)
    impute_strategy: str = "median"
    scale: bool = True

    def available(self, df: DataFrame) -> "FeatureConfig":
        """Schema-tolerant intersection with the frame's columns (the
        reference's feature-list-∩-df.columns idiom, 04b:40-47)."""
        cols = set(df.columns)
        return FeatureConfig(
            numeric_cols=[c for c in self.numeric_cols if c in cols],
            categorical_cols=[c for c in self.categorical_cols if c in cols],
            impute_strategy=self.impute_strategy,
            scale=self.scale,
        )


def preprocessing_stages(cfg: FeatureConfig) -> list:
    """M1-M5 as a stage list."""
    stages = []
    assembled = []
    for c in cfg.categorical_cols:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        )
        stages.append(OneHotEncoder(inputCol=f"{c}_idx", outputCol=f"{c}_ohe"))
        assembled.append(f"{c}_ohe")
    if cfg.numeric_cols:
        stages.append(
            Imputer(
                strategy=cfg.impute_strategy,
                inputCols=cfg.numeric_cols,
                outputCols=[f"{c}_imp" for c in cfg.numeric_cols],
            )
        )
        assembled += [f"{c}_imp" for c in cfg.numeric_cols]
    stages.append(
        VectorAssembler(
            inputCols=assembled, outputCol="features_raw", handleInvalid="keep"
        )
    )
    if cfg.scale:
        stages.append(
            StandardScaler(
                inputCol="features_raw",
                outputCol="features",
                withMean=True,
                withStd=True,
            )
        )
    return stages


def _final_features(cfg: FeatureConfig) -> str:
    return "features" if cfg.scale else "features_raw"


def regression_lr(cfg: FeatureConfig, label: str) -> Pipeline:
    """M6 — the reference's linear-regression pipeline."""
    return Pipeline(
        stages=preprocessing_stages(cfg)
        + [
            LinearRegression(
                featuresCol=_final_features(cfg),
                labelCol=label,
                maxIter=50,
                regParam=0.1,
                elasticNetParam=0.0,
                standardization=False,
            )
        ]
    )


def classification_lr(cfg: FeatureConfig, label: str) -> Pipeline:
    """M7."""
    return Pipeline(
        stages=preprocessing_stages(cfg)
        + [
            LogisticRegression(
                featuresCol=_final_features(cfg),
                labelCol=label,
                maxIter=50,
                regParam=0.1,
            )
        ]
    )


def regression_rf(cfg: FeatureConfig, label: str) -> Pipeline:
    """M8."""
    return Pipeline(
        stages=preprocessing_stages(cfg)
        + [
            RandomForestRegressor(
                featuresCol=_final_features(cfg),
                labelCol=label,
                numTrees=60,
                maxDepth=8,
                maxBins=32,
                subsamplingRate=0.7,
                featureSubsetStrategy="sqrt",
                seed=SEED,
            )
        ]
    )


def classification_rf(cfg: FeatureConfig, label: str) -> Pipeline:
    """M9."""
    return Pipeline(
        stages=preprocessing_stages(cfg)
        + [
            RandomForestClassifier(
                featuresCol=_final_features(cfg),
                labelCol=label,
                numTrees=80,
                maxDepth=10,
                maxBins=32,
                subsamplingRate=0.7,
                featureSubsetStrategy="sqrt",
                seed=SEED,
            )
        ]
    )


def train_test_split(
    df: DataFrame, label: str, weights=(0.8, 0.2), seed: int = SEED
) -> tuple[DataFrame, DataFrame]:
    """M12 — dropna(label) then deterministic randomSplit."""
    clean = df.na.drop(subset=[label])
    train, test = clean.randomSplit(list(weights), seed=seed)
    return train, test


def strip_training_summaries(model: PipelineModel) -> PipelineModel:
    """Drop every stage's JVM-side training summary (in place; returns the
    model for chaining).

    Why this exists (Spark 4.1, pinned by tests/test_ml_pipelines.py::
    test_evaluate_survives_prior_observation): a fitted estimator keeps a
    ``trainingSummary`` holding the SparkSession, and the model's
    prediction UDF lambda captures the model object — so the session rides
    into every task closure of ``model.transform(...)``. That is harmless
    until the session's ``observationManager`` lazy field is initialized
    (the first ``df.observe(Observation(...))`` anywhere in the session),
    after which the manager — non-serializable — makes EVERY collect /
    write / evaluate on the transform output die with ``Task not
    serializable``. Serialization stack:
    ``SparkSession.observationManager ← trainingSummary ←
    LogisticRegressionModel ← ProbabilisticClassificationModel UDF``.
    Stripping the summary (the persisted-model state — save/load drops it
    too) removes the capture; the engine extracts its metrics from the
    held-out frame anyway, never from the training summary."""
    from pyspark.sql import SparkSession

    jvm = SparkSession.getActiveSession()._jvm
    for stage in getattr(model, "stages", []):
        jobj = getattr(stage, "_java_obj", None)
        if jobj is None:
            continue
        try:
            jobj.setSummary(jvm.scala.Option.empty())
        except Exception:  # noqa: BLE001 — stage without a summary slot
            continue
    return model


def _is_observation_closure_bug(exc: Exception) -> bool:
    """Spark 4.1 platform bug (pinned by tests/test_ml_pipelines.py::
    test_evaluate_survives_prior_observation): once any ``Observation`` has
    been registered in the session, a pipeline FIT after it produces a
    model whose transform output fails DF→RDD conversion with
    ``Task not serializable … NotSerializableException: …ObservationManager``
    — which is exactly the path MLlib's RDD-backed evaluators take. The
    observations map is empty at that point (the query completed); the
    poison is the manager's listener, registered on first use and never
    removed, captured into the fit's closure state."""
    s = str(exc)
    return "Task not serializable" in s and "ObservationManager" in s


def _native_regression_metrics(
    pred: DataFrame, label: str
) -> dict[str, float]:
    """DataFrame-only rmse/mae/r2 — the evaluator definitions as plain
    aggregates (one scan, whole-stage codegen, no RDD conversion)."""
    e = F.col("prediction") - F.col(label)
    r = pred.agg(
        F.sqrt(F.avg(e * e)).alias("rmse"),
        F.avg(F.abs(e)).alias("mae"),
        F.sum(e * e).alias("sse"),
        F.sum(F.col(label) * F.col(label)).alias("syy"),
        F.sum(label).alias("sy"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    sst = r["syy"] - r["sy"] * r["sy"] / r["n"]
    return {
        "rmse": float(r["rmse"]),
        "mae": float(r["mae"]),
        "r2": float(1.0 - r["sse"] / sst) if sst > 0 else 0.0,
    }


def _native_classification_metrics(
    pred: DataFrame, label: str
) -> dict[str, float]:
    """DataFrame-only AUC + accuracy. AUC is the exact Mann-Whitney form
    (midranks over distinct scores — identical to the ROC trapezoid with
    tie grouping): rank positives among all scores, AUC =
    (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻). The score is the positive-class
    probability (bounded [0,1]), so the cumulative rank runs two-tier —
    a ≤1025-cell prefix frame plus a PARTITIONED within-cell window —
    never a data-sized single-task window (the stats_mann_whitney
    discipline)."""
    from pyspark.sql import Window

    score = vector_to_array(F.col("probability")).getItem(1)
    lab = (F.col(label) > 0).cast("bigint")
    g = (
        pred.select(score.alias("s"), lab.alias("y"))
        .groupBy("s")
        .agg(F.count("*").alias("cnt"), F.sum("y").alias("cnt_pos"))
        .withColumn("cell", F.floor(F.col("s") * F.lit(1024)).cast("bigint"))
    )
    wb = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, -1)
    cells = (
        g.groupBy("cell")
        .agg(F.sum("cnt").alias("bc"))
        .select("cell", F.coalesce(F.sum("bc").over(wb), F.lit(0)).alias("below"))
    )
    wv = (
        Window.partitionBy("cell")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = g.join(F.broadcast(cells), "cell").select(
        "cnt",
        "cnt_pos",
        (F.col("below") + F.coalesce(F.sum("cnt").over(wv), F.lit(0))).alias("cum"),
    )
    r = ranked.agg(
        F.sum("cnt_pos").alias("np"),
        F.sum(F.col("cnt") - F.col("cnt_pos")).alias("nn"),
        F.sum(
            F.col("cnt_pos") * (F.col("cum") + (F.col("cnt") + 1) / F.lit(2.0))
        ).alias("rpos"),
    ).first()
    auc = (
        (r["rpos"] - r["np"] * (r["np"] + 1) / 2.0) / (r["np"] * r["nn"])
        if r["np"] and r["nn"]
        else 0.5
    )
    acc_row = pred.agg(
        F.avg((F.col("prediction") == F.col(label).cast("double")).cast("double"))
    ).first()
    return {"auc": float(auc), "accuracy": float(acc_row[0])}


def fit_and_evaluate_regression(
    pipeline: Pipeline, train: DataFrame, test: DataFrame, label: str
) -> tuple[PipelineModel, dict[str, float]]:
    model = strip_training_summaries(pipeline.fit(train))
    pred = model.transform(test)
    try:
        metrics = {
            m: RegressionEvaluator(
                labelCol=label, predictionCol="prediction", metricName=m
            ).evaluate(pred)
            for m in ("rmse", "mae", "r2")
        }
    except Exception as exc:  # noqa: BLE001 — Py4J wraps the Spark error
        if not _is_observation_closure_bug(exc):
            raise
        metrics = _native_regression_metrics(pred, label)
    return model, metrics


def fit_and_evaluate_classification(
    pipeline: Pipeline, train: DataFrame, test: DataFrame, label: str
) -> tuple[PipelineModel, dict[str, float]]:
    model = strip_training_summaries(pipeline.fit(train))
    pred = model.transform(test)
    try:
        metrics = {
            "auc": BinaryClassificationEvaluator(
                labelCol=label, metricName="areaUnderROC"
            ).evaluate(pred),
            "accuracy": MulticlassClassificationEvaluator(
                labelCol=label, predictionCol="prediction", metricName="accuracy"
            ).evaluate(pred),
        }
    except Exception as exc:  # noqa: BLE001 — Py4J wraps the Spark error
        if not _is_observation_closure_bug(exc):
            raise
        metrics = _native_classification_metrics(pred, label)
    return model, metrics


def save_model_with_metrics(
    model: PipelineModel, metrics: dict[str, float], out_dir: str
) -> str:
    """S12 — persist the fitted pipeline AND its evaluation metrics in the
    reference's artifact layout (spark_jobs/04a_reg_total_lr_PIPE.py:84-87):
    ``out_dir/model`` (PipelineModel) + ``out_dir/metrics.json``. The UI
    reads the JSON back (app5.py:172-181) — without it a saved model dir
    carries no record of how good the model was.

    Returns the model path (``out_dir/model``).
    """
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    model_path = os.path.join(out_dir, "model")
    model.write().overwrite().save(model_path)
    with open(os.path.join(out_dir, "metrics.json"), "w", encoding="utf-8") as f:
        json.dump(metrics, f, indent=2)
    return model_path


def load_saved_metrics(model_dir: str) -> dict[str, float] | None:
    """Read ``metrics.json`` from a model artifact dir (app5.py:172-181).

    Accepts either the artifact root (``out_dir`` with ``model/`` +
    ``metrics.json``) or the model subdir itself — the JSON is looked up
    beside the given path and one level up. Returns None when absent or
    unreadable, matching the reference UI's soft-fail.
    """
    import json
    import os

    for d in (model_dir, os.path.dirname(os.path.normpath(model_dir))):
        p = os.path.join(d, "metrics.json")
        if os.path.exists(p):
            try:
                with open(p, encoding="utf-8") as f:
                    return json.load(f)
            except Exception:
                return None
    return None


def score_with_threshold(
    model: PipelineModel, df: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """M13 — probability-of-positive + thresholded prediction
    (reference streamlit_app/app5.py:406-408)."""
    pred = model.transform(df)
    proba1 = vector_to_array(F.col("probability")).getItem(1)
    return pred.withColumn("proba1", proba1).withColumn(
        "pred_at_threshold", (F.col("proba1") >= threshold).cast("int")
    )


def cross_validate_classification(
    cfg: FeatureConfig,
    label: str,
    train: DataFrame,
    reg_params: list[float] | None = None,
    elastic_params: list[float] | None = None,
    num_folds: int = 3,
    seed: int = 42,
):
    """Hyperparameter search: seeded k-fold cross-validation over the
    logistic-regression grid (M-ext; the reference hand-picks
    regParam=0.1/maxIter=50 — 04b_cls_tip_lr_PIPE2.py:66 — this closes the
    search loop it leaves open).

    Scale note: CrossValidator fits folds×grid models; `parallelism` lets
    independent fits share the cluster, and each fit is the same shuffle
    plan as a single train — no per-row Python anywhere.

    Returns (best_model, best_params, avg_metrics) where avg_metrics aligns
    with the param grid order.
    """
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    reg_params = reg_params or [0.01, 0.1]
    elastic_params = elastic_params or [0.0, 0.5]
    pipe = classification_lr(cfg, label)
    lr = pipe.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, reg_params)
        .addGrid(lr.elasticNetParam, elastic_params)
        .build()
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(labelCol=label),
        numFolds=num_folds,
        seed=seed,
        parallelism=2,
    )
    model = cv.fit(train)
    strip_training_summaries(model.bestModel)
    best_lr = model.bestModel.stages[-1]
    best = {
        "regParam": best_lr.getRegParam(),
        "elasticNetParam": best_lr.getElasticNetParam(),
    }
    return model.bestModel, best, list(model.avgMetrics)
