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


def fit_and_evaluate_regression(
    pipeline: Pipeline, train: DataFrame, test: DataFrame, label: str
) -> tuple[PipelineModel, dict[str, float]]:
    model = pipeline.fit(train)
    pred = model.transform(test)
    metrics = {
        m: RegressionEvaluator(
            labelCol=label, predictionCol="prediction", metricName=m
        ).evaluate(pred)
        for m in ("rmse", "mae", "r2")
    }
    return model, metrics


def fit_and_evaluate_classification(
    pipeline: Pipeline, train: DataFrame, test: DataFrame, label: str
) -> tuple[PipelineModel, dict[str, float]]:
    model = pipeline.fit(train)
    pred = model.transform(test)
    metrics = {
        "auc": BinaryClassificationEvaluator(
            labelCol=label, metricName="areaUnderROC"
        ).evaluate(pred),
        "accuracy": MulticlassClassificationEvaluator(
            labelCol=label, predictionCol="prediction", metricName="accuracy"
        ).evaluate(pred),
    }
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
    best_lr = model.bestModel.stages[-1]
    best = {
        "regParam": best_lr.getRegParam(),
        "elasticNetParam": best_lr.getElasticNetParam(),
    }
    return model.bestModel, best, list(model.avgMetrics)
