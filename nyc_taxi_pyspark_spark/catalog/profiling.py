"""Profiling, consistent sampling, record linkage, index-build, and
mergeable-sketch queries.

Generalizes the reference's dataset-inspection surface (null scan
``spark_jobs/02c_nulls_and_stats.py:31-52``, describe
``spark_jobs/02_clean_eda.py:58-66``, seeded preview sample
``streamlit_app/app5.py:155``) into the table-audit / reproducible-subset
primitives a large-scale training-data pipeline runs first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.operators.linkage import fuzzy_self_matches
from nyc_taxi_pyspark_spark.operators.profiling import (
    consistent_sample_per_group,
    consistent_sample_rate,
    profile_columns,
)
from nyc_taxi_pyspark_spark.operators.text import inverted_index
from nyc_taxi_pyspark_spark.sources.io import load_table, parallelize_scan

_PROFILE_COLS = [
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _profile_oracle() -> str:
    def one(c: str, minmax: str) -> str:
        return f"""
        SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               {minmax}
        FROM orders"""

    parts = [
        one(
            "o_custkey",
            "CAST(MIN(o_custkey) AS VARCHAR) AS min_val, "
            "CAST(MAX(o_custkey) AS VARCHAR) AS max_val",
        ),
        one(
            "o_orderstatus",
            "MIN(o_orderstatus) AS min_val, MAX(o_orderstatus) AS max_val",
        ),
        one(
            "o_totalprice",
            "CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS min_val, "
            "CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS max_val",
        ),
        one(
            "o_orderdate",
            "CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_val, "
            "CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS max_val",
        ),
        one(
            "o_orderpriority",
            "MIN(o_orderpriority) AS min_val, MAX(o_orderpriority) AS max_val",
        ),
    ]
    return " UNION ALL ".join(parts)


@query("profile_orders", oracle=_profile_oracle())
def profile_orders(spark, sf_dir):
    """Single-pass long-form column profiler (ref null scan
    spark_jobs/02c_nulls_and_stats.py:31-52 generalized): one scan, one
    wide agg, Expand for the exact multi-distincts."""
    return profile_columns(load_table(spark, sf_dir, "orders"), _PROFILE_COLS)


@query(
    "consistent_sample_rate",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE md5(CAST(o_orderkey AS VARCHAR)) < '1'
    """,
)
def consistent_sample_rate_q(spark, sf_dir):
    """Deterministic ~1/16 sample by md5(key) prefix — row-local filter,
    no shuffle, stable across engines/partitionings (the reproducible
    counterpart of the reference's seeded sample,
    streamlit_app/app5.py:155)."""
    return consistent_sample_rate(
        load_table(spark, sf_dir, "orders"), "o_orderkey"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "consistent_sample_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey
    FROM (
        SELECT o_orderpriority, o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
               ) AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
)
def consistent_sample_per_group_q(spark, sf_dir):
    """Exactly-k-per-stratum deterministic sample: md5-rank window, one
    shuffle on the stratum key."""
    return consistent_sample_per_group(
        load_table(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        "o_orderkey",
        3,
    ).select("o_orderpriority", "o_orderkey")


def _fuzzy_oracle() -> str:
    diff = " + ".join(
        f"(CASE WHEN substr(a.key,{i},1) <> substr(b.key,{i},1) "
        "THEN 1 ELSE 0 END)"
        for i in range(1, 10)
    )
    return f"""
    WITH k AS (
        -- fixed-width contract (operators.linkage.fuzzy_self_matches
        -- filters length(key) == width): a name too short to yield the
        -- full 9-char key is not a linkage candidate; without the filter
        -- the oracle's out-of-range substr('') pads missing positions as
        -- "equal" and fabricates pairs (round-11 dirty-parity audit)
        SELECT c_custkey AS id, substr(c_name, 10, 9) AS key FROM customer
        WHERE length(substr(c_name, 10, 9)) = 9
    ),
    p AS (
        SELECT a.id AS id_a, b.id AS id_b, CAST({diff} AS INTEGER) AS n_diff
        FROM k a JOIN k b ON a.id < b.id
    )
    SELECT n_diff, COUNT(*) AS n_pairs
    FROM p WHERE n_diff <= 2 GROUP BY n_diff
    """


@query("fuzzy_name_matches", oracle=_fuzzy_oracle())
def fuzzy_name_matches(spark, sf_dir):
    """Record linkage: customer-id pairs within Hamming distance 2 of the
    9-digit name suffix, found by exact pigeonhole stride-banding (3 bands
    -> guaranteed recall, equi-join only — the oracle does the quadratic
    check the engine must never do). Aggregated to (n_diff, n_pairs) so
    the full pair set is verified by count per distance."""
    # round-robin scan is LOAD-BEARING here (r16 A/B: direct 18.8 s vs
    # 3.85 s with it) - the band explode + equi-self-join serializes on
    # a single-partition probe side without the width
    cust = parallelize_scan(load_table(spark, sf_dir, "customer"), spark)
    pairs = fuzzy_self_matches(
        cust, "c_custkey", F.substring(F.col("c_name"), 10, 9), 9, 2
    )
    return (
        pairs.groupBy("n_diff")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("n_diff")
    )


@query(
    "inverted_index_topdf",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   t -> t <> ''))) AS token
        FROM documents
    ),
    agg AS (
        SELECT token, COUNT(*) AS df,
               array_to_string(list_sort(list(doc_id))[1:40], ',') AS postings
        FROM toks GROUP BY token
    )
    SELECT token, df, postings FROM agg ORDER BY df DESC, token LIMIT 20
    """,
)
def inverted_index_topdf(spark, sf_dir):
    """Posting-list index build over documents: one shuffle on token,
    rank-capped postings (bounded memory under stopword skew)."""
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"), spark)
    return inverted_index(docs, top_tokens=20, max_postings=40)


@query("sketch_hll_union_distinct")  # rows-only: HLL estimate is approximate
def sketch_hll_union_distinct(spark, sf_dir):
    """Mergeable-sketch rollup — the 100 TB distinct-count pattern: build
    one Datasketches HLL per event_type partition (map-side mergeable
    state), union-merge the sketches, estimate total distinct users. At
    scale the per-partition sketches are precomputed at ingest and the
    query touches only sketch bytes, never raw rows. Accuracy is asserted
    against the exact distinct in tests (rows-only here: the estimate is
    approximate by design)."""
    # direct scan (r16, guide 2.4): first wide op is the keyed sketch
    # aggregate - the round-robin repartition was a wasted shuffle
    # (interleaved A/B 0.588 -> 0.204 s, rows identical)
    ev = load_table(spark, sf_dir, "events")
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = sketches.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_users_hll"),
    )
    exact = ev.agg(F.count_distinct("user_id").alias("n_users_exact"))
    return merged.crossJoin(exact)
