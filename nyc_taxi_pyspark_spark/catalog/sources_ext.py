"""Extended source/sink queries (§2.1 width): JSON-Lines round-trip.

JSONL is the corpus-interchange format of LLM-data pipelines; the query
proves write → read fidelity by aggregating the re-read copy and checking
it against an oracle that reads the ORIGINAL parquet — any loss or type
drift in the round trip breaks the value hash."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.schemas import TESTDATA_SCHEMAS
from nyc_taxi_pyspark_spark.sources.io import load_table, read_jsonl, write_jsonl

_ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".artifacts",
    "jsonl",
)


@query(
    "jsonl_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars,
           MIN(source) AS min_source
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def jsonl_roundtrip(spark, sf_dir):
    """documents → JSONL sink → JSONL scan (explicit schema) → aggregate.
    The oracle aggregates the original parquet, so the hash only matches if
    the JSONL round trip is lossless."""
    out = os.path.join(_ART, os.path.basename(sf_dir.rstrip("/")), "documents")
    docs = load_table(spark, sf_dir, "documents")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, schema=TESTDATA_SCHEMAS["documents"])
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("sum_ids"),
            F.sum(F.length("text")).alias("sum_text_chars"),
            F.min("source").alias("min_source"),
        )
        .orderBy("lang")
    )


_ZART = os.path.join(os.path.dirname(_ART), "zorder")


@query(
    "zorder_pruned_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents,
           MIN(l_orderkey) AS min_orderkey
    FROM lineitem
    WHERE l_partkey <= 200 AND l_suppkey <= 20
    """,
)
def zorder_pruned_scan(spark, sf_dir):
    """lineitem → Z-order clustered copy (interleaved l_partkey/l_suppkey
    bits) → selective scan on BOTH dimensions → aggregate. The oracle
    aggregates the ORIGINAL table, so the hash only matches if the Z-curve
    rewrite is lossless; the pruning property itself (row-group min/max
    disjointness per dimension) is asserted in tests/test_scale_ops.py. At
    100 TB the same layout makes either predicate a footer-stats skip
    instead of a full scan."""
    import os as _os

    from nyc_taxi_pyspark_spark.operators.storage import write_zorder

    out = _os.path.join(_ZART, _os.path.basename(sf_dir.rstrip("/")), "lineitem")
    li = load_table(spark, sf_dir, "lineitem")
    write_zorder(li, out, ["l_partkey", "l_suppkey"], n_files=8)
    back = spark.read.parquet(out)
    return (
        back.filter((F.col("l_partkey") <= 200) & (F.col("l_suppkey") <= 20))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "price_cents"
            ),
            F.min("l_orderkey").alias("min_orderkey"),
        )
    )


_PART = os.path.join(os.path.dirname(_ART), "partitioned")


@query(
    "partitioned_pruned_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    WHERE year(o_orderdate) = 1995
    """,
)
def partitioned_pruned_scan(spark, sf_dir):
    """orders → Hive-partitioned layout on order year → scan of ONE
    partition directory → aggregate. The oracle runs on the original
    table, so the hash match proves the partitioned rewrite + pruned read
    lossless for the selected slice; tests assert the plan shows the
    predicate as PartitionFilters (directory pruning, zero data files
    listed outside the year)."""
    import os as _os

    from nyc_taxi_pyspark_spark.operators.storage import write_partitioned

    out = _os.path.join(_PART, _os.path.basename(sf_dir.rstrip("/")), "orders")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(
        orders.withColumn("o_year", F.year("o_orderdate")), out, "o_year"
    )
    back = spark.read.parquet(out)
    return back.filter(F.col("o_year") == 1995).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "total_cents"
        ),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


_ORC = os.path.join(os.path.dirname(_ART), "orc")


@query(
    "orc_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
           MIN(o_orderdate) AS first_date
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def orc_roundtrip(spark, sf_dir):
    """orders → ORC sink → ORC scan → aggregate, oracled against the
    ORIGINAL parquet — the hash match proves the ORC round trip lossless
    (types, dates, strings). ORC is the second columnar format large
    Hive-lineage estates feed in; Spark's native reader gives it the same
    pushdown/pruning path as parquet."""
    import os as _os

    out = _os.path.join(_ORC, _os.path.basename(sf_dir.rstrip("/")), "orders")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("sum_keys"),
            F.min("o_orderdate").alias("first_date"),
        )
        .orderBy("o_orderpriority")
    )
