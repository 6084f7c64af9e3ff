"""Misra-Gries heavy hitters: summary bounds + exact end-to-end result."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.operators.heavy import (
    heavy_hitters_exact,
    misra_gries_partial,
)


def _skewed_items(n: int, seed: int) -> list[str]:
    """Zipf-ish stream: a few hot items over a long uniform tail."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            out.append("hot0")
        elif r < 0.45:
            out.append("hot1")
        elif r < 0.55:
            out.append("hot2")
        else:
            out.append(f"cold{rng.randrange(2000)}")
    return out


def test_mg_partial_size_and_undercount_bounds(spark):
    k = 50
    items = _skewed_items(20_000, seed=7)
    df = spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(8)

    partial = misra_gries_partial(df, "item", k)
    # size bound: <= k candidate rows per partition
    per_part = (
        partial.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    assert all(r["count"] <= k for r in per_part)

    # merged undercount bound: true_count - sum(lb) <= n / k for EVERY item
    merged = {
        r["item"]: r["s"]
        for r in partial.groupBy("item").agg(F.sum("lb").alias("s")).collect()
    }
    truth: dict[str, int] = {}
    for x in items:
        truth[x] = truth.get(x, 0) + 1
    bound = len(items) / k
    for item, cnt in truth.items():
        assert cnt - merged.get(item, 0) <= bound
    # every item above the n/k threshold must survive as a candidate
    for item, cnt in truth.items():
        if cnt > bound:
            assert merged.get(item, 0) > 0


def test_heavy_hitters_exact_matches_bruteforce(spark):
    k = 100
    items = _skewed_items(15_000, seed=11)
    df = spark.createDataFrame([(x,) for x in items], "item string").repartition(6)

    got = [
        (r["item"], r["n_occ"])
        for r in heavy_hitters_exact(df, "item", k).collect()
    ]

    truth: dict[str, int] = {}
    for x in items:
        truth[x] = truth.get(x, 0) + 1
    want = sorted(
        ((i, c) for i, c in truth.items() if c * k > len(items)),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == want
    assert len(want) >= 3  # non-degenerate fixture


def test_heavy_hitters_empty_input(spark):
    df = spark.createDataFrame([], "item string")
    assert heavy_hitters_exact(df, "item", 10).collect() == []
