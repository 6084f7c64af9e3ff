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
