"""Extended source/sink queries (§2.1 width): JSON-Lines round-trip.

JSONL is the corpus-interchange format of LLM-data pipelines; the query
proves write → read fidelity by aggregating the re-read copy and checking
it against an oracle that reads the ORIGINAL parquet — any loss or type
drift in the round trip breaks the value hash."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.operators.integrity import duck_row_hash
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
           CAST(SUM(try_cast(ROUND(l_extendedprice * 100) as bigint)) AS BIGINT)
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
            F.sum(F.round(F.col("l_extendedprice") * 100).try_cast("bigint")).alias(
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
           CAST(COALESCE(SUM(try_cast(ROUND(o_totalprice * 100) as bigint)), 0)
                AS BIGINT) AS total_cents,
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
    with_year = orders.withColumn("o_year", F.year("o_orderdate"))
    write_partitioned(with_year, out, "o_year")
    # explicit schema: an empty source writes zero partition dirs, and a
    # schema-less read of an empty layout cannot infer one
    back = spark.read.schema(with_year.schema).parquet(out)
    return back.filter(F.col("o_year") == 1995).agg(
        F.count("*").alias("n_orders"),
        F.coalesce(
            F.sum(F.round(F.col("o_totalprice") * 100).try_cast("bigint")),
            F.lit(0),
        ).alias("total_cents"),
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


@query(
    "merge_upsert_agg",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey,
               o_totalprice + 1000.0 AS o_totalprice,
               'MERGED' AS o_orderpriority
        FROM orders WHERE o_orderkey % 100 = 0
        UNION ALL
        SELECT 90000000 + r AS o_orderkey,
               1111.5 + r AS o_totalprice,
               'MERGED-NEW' AS o_orderpriority
        FROM (SELECT unnest(generate_series(1, 5)) AS r)
    ),
    merged AS (
        SELECT o.o_orderkey, o.o_totalprice, o.o_orderpriority
        FROM orders o LEFT JOIN updates u ON o.o_orderkey = u.o_orderkey
        WHERE u.o_orderkey IS NULL
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM updates
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(try_cast(ROUND(o_totalprice * 100) as bigint)), 0)
                AS BIGINT) AS total_cents,
           MAX(o_orderkey) AS max_key
    FROM merged
    GROUP BY o_orderpriority
    """,
)
def merge_upsert_agg(spark, sf_dir):
    """MERGE INTO semantics, value-checked: an update batch (price bump +
    priority rewrite for every 100th order, plus 5 brand-new keys) merged
    into orders via the format-agnostic anti-join + union emulation
    (`sources/lakehouse.merge_upsert`); the oracle replays the same merge
    relationally. Updated rows replaced, untouched rows intact, inserts
    present — the trifecta a transactional MERGE guarantees. With Delta or
    Iceberg jars on the classpath the emulation swaps for native MERGE
    INTO with the same observable result."""
    from nyc_taxi_pyspark_spark.sources.lakehouse import merge_upsert

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    existing = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
            F.lit("MERGED").alias("o_orderpriority"),
        )
    )
    new_rows = spark.range(1, 6).select(
        (F.lit(90000000) + F.col("id")).alias("o_orderkey"),
        (F.lit(1111.5) + F.col("id")).cast("double").alias("o_totalprice"),
        F.lit("MERGED-NEW").alias("o_orderpriority"),
    )
    updates = existing.unionByName(new_rows)
    merged = merge_upsert(orders, updates, ["o_orderkey"])
    return merged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).try_cast("bigint")).alias(
            "total_cents"
        ),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "scd2_versions",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_nationkey,
               TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
    ),
    updates AS (
        SELECT c_custkey, c_nationkey + 1 AS c_nationkey
        FROM customer WHERE c_custkey % 50 = 0
    ),
    merged AS (
        SELECT d.c_custkey, d.c_nationkey, d.valid_from,
               CASE WHEN u.c_custkey IS NOT NULL
                    THEN TIMESTAMP '2024-06-01 00:00:00'
                    ELSE d.valid_to END AS valid_to
        FROM dim d LEFT JOIN updates u ON d.c_custkey = u.c_custkey
        UNION ALL
        SELECT c_custkey, c_nationkey,
               TIMESTAMP '2024-06-01 00:00:00', CAST(NULL AS TIMESTAMP)
        FROM updates
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN valid_to IS NULL THEN 1 END) AS BIGINT)
             AS n_open,
           CAST(COUNT(CASE WHEN valid_to IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_closed,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys,
           MAX(valid_from) AS latest_from
    FROM merged
    """,
)
def scd2_versions(spark, sf_dir):
    """SCD type-2 history maintenance, value-checked with a pinned as-of
    timestamp: changed keys get their current row CLOSED (valid_to
    stamped) and a new OPEN version appended; unchanged keys keep a single
    open row. The emulation (`sources/lakehouse.scd2_close_and_insert`) is
    three joins + union — the relational core of what Delta's MERGE ...
    WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT runs."""
    from nyc_taxi_pyspark_spark.sources.lakehouse import scd2_close_and_insert

    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_nationkey",
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = (
        c.filter(F.col("c_custkey") % 50 == 0)
        .select("c_custkey", (F.col("c_nationkey") + 1).alias("c_nationkey"))
    )
    out = scd2_close_and_insert(
        dim, updates, ["c_custkey"], as_of="2024-06-01 00:00:00"
    )
    return out.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("valid_to").isNull(), 1)).alias("n_open"),
        F.count(F.when(F.col("valid_to").isNotNull(), 1)).alias("n_closed"),
        F.countDistinct("c_custkey").alias("n_keys"),
        F.max("valid_from").alias("latest_from"),
    )


@query(
    "orders_content_fingerprint",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           bit_xor({duck_row_hash(
               "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
               " || '|' || o_orderstatus"
               " || '|' || CAST(try_cast(ROUND(o_totalprice * 100) as bigint) AS VARCHAR)"
               " || '|' || strftime(o_orderdate, '%Y-%m-%d')"
               " || '|' || o_orderpriority"
           )}) AS fingerprint
    FROM orders
    """,
)
def orders_content_fingerprint(spark, sf_dir):
    """Order-independent content fingerprint of the orders table — the
    integrity manifest entry a rebuild/compaction/replication audit
    compares. bit_xor of per-row md5-derived BIGINTs is invariant under
    repartitioning and row order (the transformations that must not change
    a dataset) and flips on any value change or row loss; the row count in
    the same result catches xor's duplicate-insertion blind spot. Canonical
    key casts the money column to exact cents and the date to ISO text, so
    both engines hash identical strings. One scan, map-side combined."""
    from nyc_taxi_pyspark_spark.operators.integrity import content_fingerprint

    o = load_table(spark, sf_dir, "orders")
    key = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).try_cast("bigint"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    return content_fingerprint(o, key)


@query(
    "bucketed_join_agg",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_lines,
           CAST(SUM(l.l_orderkey) AS BIGINT) AS sum_keys
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def bucketed_join_agg(spark, sf_dir):
    """Co-located big-big join from bucketed storage: both fact tables are
    written bucketBy(8, orderkey) + sortBy into managed tables, then joined
    WITHOUT any Exchange — the bucket layout IS the shuffle, paid once at
    write time and amortized over every later join (the
    100 TB fact-to-fact pattern; plan-gated shuffle-free in
    tests/test_scale_ops.py::test_bucketed_join_has_no_shuffle). The oracle
    is the plain join on the original parquet, proving the bucketed
    round trip changes nothing."""
    from nyc_taxi_pyspark_spark.operators.storage import (
        bucketed_join,
        write_bucketed,
    )

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_o, t_l = f"cat_orders_b_{tag}", f"cat_lineitem_b_{tag}"
    # saveAsTable's managed location outlives the (in-memory) catalog of a
    # fresh session: DROP clears a registered table, and for a LOCAL
    # warehouse an orphaned location left by a previous process is swept
    # directly. Remote warehouses (hdfs://, s3a://) go through Hadoop's
    # FileSystem API instead — rmtree on a config-derived URI would
    # otherwise silently no-op (or worse, hit an unrelated local path).
    import shutil
    from urllib.parse import urlparse

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    parsed = urlparse(wh)
    is_local = parsed.scheme in ("", "file")
    for t in (t_o, t_l):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        if is_local:
            loc = os.path.join(wh.removeprefix("file:"), t)
            if os.path.isdir(loc):
                shutil.rmtree(loc, ignore_errors=True)
        else:
            jvm = spark._jvm
            jsc = spark._jsc
            path = jvm.org.apache.hadoop.fs.Path(wh + "/" + t)
            fs = path.getFileSystem(jsc.hadoopConfiguration())
            if fs.exists(path):
                fs.delete(path, True)
    write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        t_o,
        "o_orderkey",
        8,
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
        t_l,
        "o_orderkey",
        8,
    )
    joined = bucketed_join(spark, t_o, t_l, "o_orderkey")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "pysource_jsonl_scan",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS min_doc_id
    FROM documents
    WHERE n_chars > 0
    GROUP BY source
    ORDER BY source
    """,
)
def pysource_jsonl_scan(spark, sf_dir):
    """documents → JSONL sink → scan through the CUSTOM Python Data
    Source connector (sources/pydatasource.py) → aggregate. The oracle
    aggregates the original parquet, so the hash only matches if the
    connector's executor-parallel file reads are lossless; the n_chars > 0
    predicate exercises its GreaterThan pushFilters path (row-drop inside
    the source — the post-scan plan keeps only the isnotnull guard, see
    tests/test_pydatasource.py). One InputPartition per file keeps the
    scan parallel at any file count."""
    from nyc_taxi_pyspark_spark.sources.pydatasource import register

    out = os.path.join(
        _ART, os.path.basename(sf_dir.rstrip("/")), "documents"
    )
    docs = load_table(spark, sf_dir, "documents")
    write_jsonl(docs, out)
    register(spark)
    back = (
        spark.read.format("jsonl_files")
        .schema(TESTDATA_SCHEMAS["documents"])
        .load(out)
    )
    return (
        back.filter(F.col("n_chars") > 0)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source")
    )


@query(
    "scan_file_lineage",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_orderkey) AS min_orderkey,
           MAX(l_orderkey) AS max_orderkey
    FROM lineitem
    """,
)
def scan_file_lineage(spark, sf_dir):
    """Row-to-file lineage via Spark's hidden ``_metadata`` column:
    per-file row counts and key ranges without any path bookkeeping in
    the pipeline itself. This is the debugging/audit surface for file-
    level incidents at scale — which files feed a corrupted partition,
    whether a backfill's files landed, per-file row drift after a
    compaction — selected only when asked for, so normal scans pay
    nothing. The oracle pins the expected physical layout (one file per
    driver testdata table) plus content aggregates; a multi-file table
    yields one row per file from the same expression."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("_metadata.file_name").alias("file_name"), "l_orderkey"
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_orderkey").alias("max_orderkey"),
        )
    )
