"""Batch model scoring surface (SURVEY.md §2.12 V5; reference
streamlit_app/app5.py:347-428): sample → load model → score with threshold →
export.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.ml.pipelines import score_with_threshold


def sample_for_scoring(
    df: DataFrame,
    n: int,
    seed: int = 7,
    population: int | None = None,
) -> DataFrame:
    """Deterministic UP-TO-n-row sample for scoring, without a global sort.

    Default path: seeded Bernoulli ``sample()`` (a narrow, per-partition
    scan — no shuffle, no global sort) oversampled ~20% above the target
    fraction, then ``limit(n)``. Deterministic for a fixed (seed, input,
    partitioning); at 100 TB it reads the table once and keeps nothing in
    memory. ``population`` sizes the fraction without a count job when the
    caller already knows the table size; otherwise one count scan is paid —
    still linear, still no sort.

    Bernoulli sampling can undershoot: the result has AT MOST n rows (the
    1.2× cushion makes a short batch ~P(Binomial(total, 1.2n/total) < n),
    vanishing for large n, and the cushion disappears entirely once the
    fraction caps at 1.0 — where the result is simply every row). Callers
    that need exact-n must use :func:`sample_for_scoring_compat`, whose
    global sort buys exactness.

    ``sample_for_scoring_compat`` keeps the reference's exact
    ``orderBy(rand(seed)).limit(n)`` idiom (app5.py:355-367), whose global
    sort of the full table is a scale-killer — kept only for row-level
    parity with the reference UI.
    """
    total = population if population is not None else df.count()
    if total <= n:
        return df.cache()
    fraction = min(1.0, 1.2 * n / total)
    return df.sample(fraction=fraction, seed=seed).limit(n).cache()


def sample_for_scoring_compat(df: DataFrame, n: int, seed: int = 7) -> DataFrame:
    """The reference's sampling idiom (app5.py:355-367): random order by
    seeded rand, limit, cache. Exact-n and stable across partitionings, but
    the global sort makes it unusable at scale — prefer
    :func:`sample_for_scoring`."""
    return df.orderBy(F.rand(seed)).limit(n).cache()


def load_model(path: str) -> PipelineModel:
    """Load a PipelineModel from either a bare model dir or the reference's
    artifact layout (``out_dir/model`` + ``out_dir/metrics.json``,
    app5.py:160-169 — the UI appends ``model`` when ``stages/`` lives one
    level down)."""
    import os

    if not os.path.isdir(os.path.join(path, "stages")) and os.path.isdir(
        os.path.join(path, "model", "stages")
    ):
        path = os.path.join(path, "model")
    return PipelineModel.load(path)


def load_metrics(model_dir: str) -> dict | None:
    """metrics.json beside the model, or None (app5.py:172-181)."""
    from nyc_taxi_pyspark_spark.ml.pipelines import load_saved_metrics

    return load_saved_metrics(model_dir)


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
