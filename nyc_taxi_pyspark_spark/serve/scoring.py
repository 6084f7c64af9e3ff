"""Batch model scoring surface (SURVEY.md §2.12 V5; reference
streamlit_app/app5.py:347-428): sample → load model → score with threshold →
export.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.ml.pipelines import score_with_threshold


def sample_for_scoring(df: DataFrame, n: int, seed: int = 7) -> DataFrame:
    """The reference's sampling idiom (app5.py:355-367): random order by
    seeded rand, limit, cache for reuse across score + export actions."""
    return df.orderBy(F.rand(seed)).limit(n).cache()


def load_model(path: str) -> PipelineModel:
    return PipelineModel.load(path)


def score_batch(
    model: PipelineModel,
    df: DataFrame,
    threshold: float = 0.5,
    sample_n: int | None = None,
) -> DataFrame:
    scored = df if sample_n is None else sample_for_scoring(df, sample_n)
    if "probability" in [f.name for f in model.transform(scored.limit(0)).schema.fields]:
        return score_with_threshold(model, scored, threshold)
    return model.transform(scored)
