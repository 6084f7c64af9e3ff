"""Mergeable partial-aggregate states: the merge law under arbitrary splits."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.operators.incremental import (
    finalize_agg_state,
    merge_agg_states,
    partial_agg_state,
)


def _rows(n: int, seed: int):
    rng = random.Random(seed)
    return [
        (f"g{rng.randrange(7)}", round(rng.uniform(-100, 100), 2))
        for _ in range(n)
    ]


def _canon(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: str(t)
    )


def test_merge_law_random_three_way_split(spark):
    rows = _rows(3000, seed=3)
    rng = random.Random(5)
    parts = [[], [], []]
    for r in rows:
        parts[rng.randrange(3)].append(r)
    schema = "g string, v double"
    whole = spark.createDataFrame(rows, schema)
    slices = [spark.createDataFrame(p, schema) for p in parts]

    direct = finalize_agg_state(partial_agg_state(whole, ["g"], "v"))
    merged = finalize_agg_state(
        merge_agg_states(*[partial_agg_state(s, ["g"], "v") for s in slices])
    )
    # bit-exact equality: integer-cents sums make the merge associative,
    # and finalize replays the identical float ops on both paths
    assert _canon(direct) == _canon(merged)


def test_merge_associativity_and_empty_identity(spark):
    schema = "g string, v double"
    a = partial_agg_state(spark.createDataFrame(_rows(500, 1), schema), ["g"], "v")
    b = partial_agg_state(spark.createDataFrame(_rows(400, 2), schema), ["g"], "v")
    c = partial_agg_state(spark.createDataFrame(_rows(300, 4), schema), ["g"], "v")
    left = merge_agg_states(merge_agg_states(a, b), c)
    right = merge_agg_states(a, merge_agg_states(b, c))
    assert _canon(left) == _canon(right)

    empty = partial_agg_state(spark.createDataFrame([], schema), ["g"], "v")
    assert _canon(merge_agg_states(a, empty)) == _canon(a)


def test_null_values_counted_out(spark):
    df = spark.createDataFrame(
        [("g0", 1.0), ("g0", None), ("g1", None)], "g string, v double"
    )
    out = {r["g"]: r for r in finalize_agg_state(
        partial_agg_state(df, ["g"], "v")
    ).collect()}
    assert out["g0"]["n"] == 1 and out["g0"]["sum_v"] == 1.0
    # all-null group: count 0, value stats honestly NULL
    assert out["g1"]["n"] == 0 and out["g1"]["sum_v"] is None
