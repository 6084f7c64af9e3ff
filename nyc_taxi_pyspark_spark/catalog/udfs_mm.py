"""UDF-surface and multimodal queries (SURVEY.md §2.10; north-star
multimodal extension). These prove the Python paths — row UDF, pandas UDF,
applyInPandas, mapInPandas over binary columns — against the same DuckDB
oracle gate as the native operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.functions.udfs import (
    bucket_distance_udf,
    center_values_per_group,
    fare_per_mile_pandas,
)
from nyc_taxi_pyspark_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
)
from nyc_taxi_pyspark_spark.sources.io import load_table, parallelize_scan


@query(
    "udf_distance_bucket",
    oracle="""
    SELECT CASE WHEN l_quantity >= 10 THEN '>=10mi'
                WHEN l_quantity >= 5 THEN '5-10mi'
                WHEN l_quantity >= 2 THEN '2-5mi'
                WHEN l_quantity >= 1 THEN '1-2mi'
                ELSE '<1mi' END AS bucket,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1
    """,
)
def udf_distance_bucket(spark, sf_dir):
    """U2 — the reference's row-at-a-time bucket UDF
    (spark_jobs/05c_make_report.py:27-36), exercised verbatim through the
    Python-worker path and checked against its native CASE twin."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("bucket", bucket_distance_udf(F.col("l_quantity")))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@query(
    "udf_pandas_ratio",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 0 THEN l_extendedprice / l_quantity END
             AS price_per_unit
    FROM lineitem
    """,
)
def udf_pandas_ratio(spark, sf_dir):
    """Arrow-vectorized pandas UDF (guarded division) — the fast Python
    path; row-level IEEE ops so values are engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fare_per_mile_pandas(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "price_per_unit"
        ),
    )


@query(
    "udf_group_center",
    oracle="""
    SELECT event_id, user_id, value,
           value - (CAST(SUM(try_cast(round(value * 100) as bigint))
                         OVER (PARTITION BY user_id) AS DOUBLE)
                    / 100.0 / COUNT(*) OVER (PARTITION BY user_id)) AS centered
    FROM events
    """,
)
def udf_group_center(spark, sf_dir):
    """U4 — applyInPandas grouped-map (subtract group mean). The mean goes
    through exact integer cents, so the pandas row order doesn't matter and
    the result hash-matches the SQL window twin."""
    # no parallelize_scan: the grouped map hash-partitions on user_id at
    # cluster width itself (functions.udfs._spread_groups); a round-robin
    # repartition here would be a second, wasted exchange of every row
    ev = load_table(spark, sf_dir, "events")
    return center_values_per_group(ev)


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           'blob' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(16 + ((strpos('0123456789abcdef', md5(text)[1:1]) - 1) * 16
                      + strpos('0123456789abcdef', md5(text)[2:2]) - 1) % 240
                AS INTEGER) AS fake_width,
           CAST(16 + ((strpos('0123456789abcdef', md5(text)[3:3]) - 1) * 16
                      + strpos('0123456789abcdef', md5(text)[4:4]) - 1) % 240
                AS INTEGER) AS fake_height
    FROM documents WHERE text IS NOT NULL
    """,
)
def multimodal_features(spark, sf_dir):
    """Binary-column feature extraction via mapInPandas (Arrow batches of
    binary in, typed features out). Decode is the deterministic fake from
    operators.multimodal.decode_stub — the oracle reproduces it from md5."""
    # no parallelize_scan: the stub decode is ~µs of Python per row, so a
    # round-robin exchange of the full payload cost more than the 32-way
    # parallelism bought (A/B 0.49 → 0.28 s). At 100 TB the scan is wide
    # on its own; if a REAL codec lands (per-row decode >> transfer), the
    # single-file local case wants the repartition back.
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(documents_as_media(docs))


@query(
    "multimodal_frames",
    oracle="""
    SELECT media_id,
           CAST(i - 1 AS INTEGER) AS frame_idx,
           CAST((i - 1) * 40 AS BIGINT) AS ts_offset_ms,
           md5(text || '|' || CAST(i - 1 AS VARCHAR)) AS frame_checksum
    FROM (
        SELECT doc_id AS media_id, text,
               unnest(generate_series(1, 1 + octet_length(encode(text)) % 4)) AS i
        FROM documents WHERE text IS NOT NULL
    )
    """,
)
def multimodal_frames(spark, sf_dir):
    """Frame sampling as a row-expanding mapInPandas: each binary blob emits
    1-4 deterministic pseudo-frames (stub decoder discipline) with
    per-frame checksums the oracle re-derives from the same bytes. The
    plumbing under test is the 1:N Arrow batch expansion and the
    no-shuffle frame partitioning."""
    from nyc_taxi_pyspark_spark.operators.multimodal import sample_frames

    # stub frame-sampling is payload-transfer-bound, not Python-bound:
    # same no-repartition reasoning as multimodal_features
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(documents_as_media(docs))


@query(
    "udtf_tokens",
    oracle="""
    SELECT doc_id, w AS token, CAST(i - 1 AS INTEGER) AS idx
    FROM (
        SELECT doc_id,
               unnest(string_split_regex(text, '\\s+')) AS w,
               unnest(generate_series(1, len(string_split_regex(text, '\\s+'))))
                 AS i
        FROM documents
    )
    """,
)
def udtf_tokens(spark, sf_dir):
    """Python UDTF via SQL LATERAL: per-document token rows with positions
    (U4 table-function form). The oracle is DuckDB's parallel unnest; the
    native Spark twin is posexplode(split(...)) — pytest proves UDTF ==
    native."""
    from nyc_taxi_pyspark_spark.functions.udfs import make_tokenize_udtf

    spark.udtf.register("tokenize_udtf", make_tokenize_udtf())
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.token, t.idx "
        "FROM udtf_docs d, LATERAL tokenize_udtf(d.text) t"
    )


_DUCK_FAKE_W = (
    "16 + ((strpos('0123456789abcdef', md5(text)[1:1]) - 1) * 16"
    " + strpos('0123456789abcdef', md5(text)[2:2]) - 1) % 240"
)
_DUCK_FAKE_H = (
    "16 + ((strpos('0123456789abcdef', md5(text)[3:3]) - 1) * 16"
    " + strpos('0123456789abcdef', md5(text)[4:4]) - 1) % 240"
)


@query(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS fake_width,
           CAST(h AS INTEGER) AS fake_height,
           CAST(FLOOR(CAST(w AS DOUBLE) * (224.0 / greatest(w, h)) + 0.5)
                AS INTEGER) AS out_width,
           CAST(FLOOR(CAST(h AS DOUBLE) * (224.0 / greatest(w, h)) + 0.5)
                AS INTEGER) AS out_height,
           greatest(w, h) > 224 AS needs_resample
    FROM (SELECT doc_id, {_DUCK_FAKE_W} AS w, {_DUCK_FAKE_H} AS h
          FROM documents WHERE text IS NOT NULL)
    """,
)
def multimodal_resize(spark, sf_dir):
    """Aspect-preserving resize PLAN over the decoded feature table:
    target geometry as portable column arithmetic (the pixel resample is
    the stubbed codec step, like decode). Proves the decode → plan →
    (batched execute) pipeline split."""
    from nyc_taxi_pyspark_spark.operators.multimodal import with_resize_plan

    # same no-repartition reasoning as multimodal_features
    docs = load_table(spark, sf_dir, "documents")
    return with_resize_plan(extract_features(documents_as_media(docs)))


@query(
    "multimodal_dedup",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id, text FROM documents
        WHERE text IS NOT NULL
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents
        WHERE text IS NOT NULL AND doc_id % 20 = 0
    ),
    g AS (
        SELECT md5(text) AS checksum, COUNT(*) AS n_copies,
               MIN(media_id) AS survivor_id
        FROM media GROUP BY md5(text)
    )
    SELECT COUNT(*) AS n_unique_content,
           CAST(COALESCE(SUM(n_copies), 0) AS BIGINT) AS n_media,
           CAST(COALESCE(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_dup_groups,
           CAST(COALESCE(SUM(n_copies - 1), 0) AS BIGINT) AS n_redundant,
           CAST(MIN(survivor_id) AS BIGINT) AS min_survivor
    FROM g
    """,
)
def multimodal_dedup(spark, sf_dir):
    """Binary content-hash dedup — stage zero of every multimodal pipeline:
    exact duplicate media detected by md5 over the OPAQUE binary column
    (no decode needed), min-id survivor per checksum group. A re-crawled
    stripe (every 20th doc re-ingested under a new media_id) provides the
    planted duplicates; md5 of the UTF-8 bytes equals DuckDB's md5 of the
    text, so the whole pipeline is hash-checked. One scan + one checksum
    shuffle, map-side combined; at 100 TB the checksum is computed at
    ingest and this query touches only the (checksum, id) index."""
    # direct scan (r16, guide 2.4): the md5 checksum is ~us-per-row JVM
    # work feeding a keyed shuffle, so the round-robin repartition cost
    # more than the parallelism it bought (A/B 0.659 -> 0.360 s) - the
    # same trade multimodal_features documented in r15
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs).unionByName(
        documents_as_media(
            docs.filter(F.col("doc_id") % 20 == 0).withColumn(
                "doc_id", F.col("doc_id") + 1000000
            )
        )
    )
    g = media.groupBy(F.md5("content").alias("checksum")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("media_id").alias("survivor_id"),
    )
    # counts coalesce to 0 on an empty corpus (count semantics, not SUM's
    # NULL); min_survivor stays NULL — there is no survivor to name
    return g.agg(
        F.count(F.lit(1)).alias("n_unique_content"),
        F.coalesce(F.sum("n_copies"), F.lit(0))
        .cast("bigint")
        .alias("n_media"),
        F.coalesce(F.sum((F.col("n_copies") > 1).cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_dup_groups"),
        F.coalesce(F.sum(F.col("n_copies") - 1), F.lit(0))
        .cast("bigint")
        .alias("n_redundant"),
        F.min("survivor_id").cast("bigint").alias("min_survivor"),
    )


@query(
    "udf_arrow_center",
    oracle="""
    SELECT event_id, user_id, value,
           value - (CAST(SUM(try_cast(round(value * 100) as bigint))
                         OVER (PARTITION BY user_id) AS DOUBLE)
                    / 100.0 / COUNT(*) OVER (PARTITION BY user_id)) AS centered
    FROM events
    """,
)
def udf_arrow_center(spark, sf_dir):
    """U4 via applyInArrow — the Arrow-native grouped-map (Spark 4): the
    group batch stays a pyarrow.Table end-to-end and the mean runs in
    Arrow compute kernels, skipping the pandas conversion on both edges
    that udf_group_center pays. Same exact-cents arithmetic, same oracle
    — the two Python grouped paths and the SQL window twin are mutually
    bit-identical."""
    from nyc_taxi_pyspark_spark.functions.udfs import (
        center_values_per_group_arrow,
    )

    # same single-exchange shape as udf_group_center (_spread_groups)
    ev = load_table(spark, sf_dir, "events")
    return center_values_per_group_arrow(ev)
