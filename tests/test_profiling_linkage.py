"""Tests for profiling, consistent sampling, linkage, inverted index, and
the HLL sketch rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.operators.linkage import fuzzy_self_matches, hamming
from nyc_taxi_pyspark_spark.operators.profiling import (
    consistent_sample_per_group,
    consistent_sample_rate,
    profile_columns,
)
from nyc_taxi_pyspark_spark.operators.text import inverted_index


def test_profile_columns_counts_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", None), (3, None, 8.5), (4, "b", 1.25)],
        "id bigint, s string, x double",
    )
    prof = {r["col_name"]: r for r in profile_columns(df, ["s", "x"]).collect()}
    assert prof["s"]["n_rows"] == 4
    assert prof["s"]["n_nulls"] == 1
    assert prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_val"] == "a" and prof["s"]["max_val"] == "b"
    assert prof["x"]["n_nulls"] == 1
    # doubles stringified through DECIMAL(18,2): fixed scale
    assert prof["x"]["min_val"] == "1.25" and prof["x"]["max_val"] == "8.50"


def test_consistent_sample_rate_is_stable_and_subset(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"] for r in consistent_sample_rate(df, "k").collect()}
    b = {r["k"] for r in consistent_sample_rate(df.repartition(7), "k").collect()}
    assert a == b  # partition-layout independent
    assert 2000 / 16 * 0.5 < len(a) < 2000 / 16 * 1.5
    # a wider prefix strictly contains a narrower one (nested subsets)
    wide = {r["k"] for r in consistent_sample_rate(df, "k", "2").collect()}
    assert a < wide


def test_consistent_sample_per_group_exact_k(spark):
    df = spark.createDataFrame(
        [(g, g * 100 + i) for g in range(3) for i in range(20)],
        "g int, k bigint",
    )
    out = consistent_sample_per_group(df, ["g"], "k", 4)
    rows = out.collect()
    assert len(rows) == 12
    again = {(r["g"], r["k"]) for r in consistent_sample_per_group(df.repartition(5), ["g"], "k", 4).collect()}
    assert {(r["g"], r["k"]) for r in rows} == again


def test_hamming_and_fuzzy_matches_recall(spark):
    df = spark.createDataFrame(
        [
            (1, "id-000111222"),
            (2, "id-000111223"),  # 1 diff vs id 1
            (3, "id-000111244"),  # 2 diffs vs both id 1 and id 2
            (4, "id-999999999"),  # far from everything
        ],
        "id bigint, name string",
    )
    out = fuzzy_self_matches(
        df, "id", F.substring(F.col("name"), 4, 9), 9, 2
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["n_diff"] for r in out}
    assert pairs == {(1, 2): 1, (1, 3): 2, (2, 3): 2}
    # hamming is exact per-position
    row = spark.range(1).select(
        hamming(F.lit("abcd"), F.lit("abzz"), 4).alias("d")
    ).collect()[0]
    assert row["d"] == 2


def test_inverted_index_caps_postings_and_orders_by_df(spark):
    docs = spark.createDataFrame(
        [(i, "common alpha" if i % 2 else "common beta") for i in range(10)],
        "doc_id bigint, text string",
    )
    out = inverted_index(docs, top_tokens=3, max_postings=4)
    rows = {r["token"]: r for r in out.collect()}
    assert rows["common"]["df"] == 10
    # capped at 4 postings, smallest ids, sorted
    assert rows["common"]["postings"] == "0,1,2,3"
    assert rows["alpha"]["df"] == 5
    assert rows["alpha"]["postings"] == "1,3,5,7"


def test_hll_union_estimate_close_to_exact(spark):
    from nyc_taxi_pyspark_spark.catalog import QUERIES
    from tests.conftest import SF_DIR

    row = QUERIES["sketch_hll_union_distinct"](spark, SF_DIR).collect()[0]
    assert row["n_types"] >= 1
    exact = row["n_users_exact"]
    assert exact > 0
    assert abs(row["n_users_hll"] - exact) <= max(2, 0.05 * exact)
