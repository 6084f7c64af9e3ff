"""Aggregation queries (SURVEY.md §2.4 A1-A13 + §2.7 extensions).

Every double-valued aggregate uses the exact-decimal-sum scheme from
``functions.exact`` so values are order-independent and hash-identical
between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.functions.exact import (
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
)
from nyc_taxi_pyspark_spark.functions.scalar import dow_iso, dow_spark
from nyc_taxi_pyspark_spark.operators.incremental import (
    finalize_agg_state,
    merge_agg_states,
    partial_agg_state,
)
from nyc_taxi_pyspark_spark.operators.aggregates import (
    describe_exact,
    duplicate_group_count,
    null_scan,
    top_k,
)
from nyc_taxi_pyspark_spark.sources.io import load_table


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum('l_quantity', 2)} AS sum_qty,
           {oracle_dsum('l_extendedprice', 2)} AS sum_base_price,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {oracle_davg('l_quantity', 2)} AS avg_qty,
           {oracle_davg('l_extendedprice', 2)} AS avg_price,
           {oracle_davg('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """Flagship query (A5 generalized to the TPC-H Q1 shape): scan → filter →
    8-measure hash aggregate. At scale this is one parquet scan stage with the
    shipdate predicate pushed down, partial aggregation map-side, and a single
    shuffle on the (returnflag, linestatus) keys."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "global_scalar_agg",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    """,
)
def global_scalar_agg(spark, sf_dir):
    """A1 — global scalar aggregate (reference spark_jobs/01_ingest.py:74-80)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_orders"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "multi_measure_agg",
    oracle=f"""
    SELECT COUNT(*) AS n,
           {oracle_dsum('o_totalprice', 2)} AS sum_total,
           {oracle_davg('o_totalprice', 2)} AS avg_total,
           MIN(o_totalprice) AS min_total,
           MAX(o_totalprice) AS max_total
    FROM orders
    """,
)
def multi_measure_agg(spark, sf_dir):
    """A2 — multi-measure global agg (reference spark_jobs/02b_basic_clean.py:70-76)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n"),
        dsum("o_totalprice", 2).alias("sum_total"),
        davg("o_totalprice", 2).alias("avg_total"),
        F.min("o_totalprice").alias("min_total"),
        F.max("o_totalprice").alias("max_total"),
    )


@query(
    "null_scan",
    oracle="""
    SELECT CAST(COALESCE(SUM(CAST(event_id IS NULL AS INT)), 0) AS BIGINT) AS event_id_nulls,
           CAST(COALESCE(SUM(CAST(ts IS NULL AS INT)), 0) AS BIGINT) AS ts_nulls,
           CAST(COALESCE(SUM(CAST(user_id IS NULL AS INT)), 0) AS BIGINT) AS user_id_nulls,
           CAST(COALESCE(SUM(CAST(event_type IS NULL AS INT)), 0) AS BIGINT) AS event_type_nulls,
           CAST(COALESCE(SUM(CAST(value IS NULL AS INT)), 0) AS BIGINT) AS value_nulls,
           CAST(COALESCE(SUM(CAST(props IS NULL AS INT)), 0) AS BIGINT) AS props_nulls
    FROM events
    """,
)
def null_scan_events(spark, sf_dir):
    """A3 — single-pass per-column null scan (reference
    spark_jobs/02_clean_eda.py:77-81; replaces the per-column-job naive form
    at 02c:48 — one scan instead of O(columns) scans)."""
    return null_scan(load_table(spark, sf_dir, "events"))


@query(
    "groupby_count_desc",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY n DESC, o_orderpriority
    """,
)
def groupby_count_desc(spark, sf_dir):
    """A4 — group-by count ordered desc (reference spark_jobs/02b:79-83).
    Key added as deterministic tie-breaker."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "o_orderpriority")
    )


@query(
    "group_by_day",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS order_day,
           COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice', 2)} AS sum_total
    FROM orders
    GROUP BY 1
    """,
)
def group_by_day(spark, sf_dir):
    """A6 — GROUP BY DATE(ts) (reference spark_jobs/02d_sql_aggs.py:54-60)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", 2).alias("sum_total"))
    )


@query(
    "orders_incremental_kpis",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS order_day,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n_orders,
           {oracle_dsum('o_totalprice', 2)} AS sum_price,
           ({oracle_dsum('o_totalprice', 2)} / COUNT(o_totalprice)) AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def orders_incremental_kpis(spark, sf_dir):
    """Incremental aggregate maintenance (operators/incremental.py): the
    daily KPI rollup computed as merge(state(base), state(delta)) over a
    deterministic 90/10 split of orders, then finalized — checked against
    a one-shot GROUP BY oracle of the whole table, so the hash gate proves
    the merge law end-to-end. The state keeps sums as integer cents, so
    merging is associative/commutative integer addition and the result is
    bit-identical however the input is split. In production the base state
    is a persisted table and only the delta is scanned per refresh
    (O(delta), not O(base)); this query recomputes both sides from one
    parquet file only because it must demonstrate the law from scratch."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_day", F.to_date("o_orderdate")
    )
    base = o.where(F.col("o_orderkey") % 10 < 9)
    delta = o.where(F.col("o_orderkey") % 10 >= 9)
    state = merge_agg_states(
        partial_agg_state(base, ["order_day"], "o_totalprice", 2),
        partial_agg_state(delta, ["order_day"], "o_totalprice", 2),
    )
    return (
        finalize_agg_state(state, 2)
        .select(
            "order_day",
            F.col("n").alias("n_orders"),
            F.col("sum_v").alias("sum_price"),
            F.col("avg_v").alias("avg_price"),
            F.col("min_v").alias("min_price"),
            F.col("max_v").alias("max_price"),
        )
        .orderBy("order_day")
    )


@query(
    "group_by_hour",
    oracle=f"""
    SELECT HOUR(ts) AS hr, COUNT(*) AS n, {oracle_davg('value', 2)} AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def group_by_hour(spark, sf_dir):
    """A6 — GROUP BY HOUR(ts) (reference spark_jobs/02d_sql_aggs.py:64-67)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.hour("ts").alias("hr")).agg(
        F.count("*").alias("n"), davg("value", 2).alias("avg_value")
    )


@query(
    "heatmap_dow_hour",
    oracle=f"""
    SELECT dayofweek(ts) + 1 AS dow, HOUR(ts) AS hr,
           COUNT(*) AS n, {oracle_davg('value', 2)} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def heatmap_dow_hour(spark, sf_dir):
    """A7 — DoW×hour heatmap grid (reference spark_jobs/05c_make_report.py:122-129).
    Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday, hence the +1
    in the oracle — the two-convention trap documented in SURVEY §2.8 F4/F5."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        dow_spark("ts").alias("dow"), F.hour("ts").alias("hr")
    ).agg(F.count("*").alias("n"), davg("value", 2).alias("avg_value"))


@query(
    "having_topk",
    oracle=f"""
    SELECT isodow(ts) AS dow_iso, HOUR(ts) AS hr,
           COUNT(*) AS n, {oracle_davg('value', 2)} AS avg_value
    FROM events
    GROUP BY 1, 2
    HAVING COUNT(*) > 5
    ORDER BY avg_value DESC, dow_iso, hr
    LIMIT 10
    """,
)
def having_topk(spark, sf_dir):
    """A8 — HAVING + ORDER BY + LIMIT top-k (reference
    spark_jobs/05a_sql_insights.py:69-81), ISO day-of-week convention (F5).
    Compiles to TakeOrderedAndProject — no global sort."""
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(dow_iso("ts").alias("dow_iso"), F.hour("ts").alias("hr"))
        .agg(F.count("*").alias("n"), davg("value", 2).alias("avg_value"))
        .filter(F.col("n") > 5)
    )
    return top_k(agg, [F.desc("avg_value"), F.col("dow_iso"), F.col("hr")], 10)


@query(
    "duplicate_groups",
    oracle="""
    SELECT COUNT(*) AS dup_groups FROM (
        SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
    )
    """,
)
def duplicate_groups(spark, sf_dir):
    """A11 — duplicate-group detection (reference spark_jobs/02c:70-72)."""
    o = load_table(spark, sf_dir, "orders")
    return duplicate_group_count(o, ["o_custkey"])


_DESCRIBE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _describe_oracle() -> str:
    selects = [
        f"""
        SELECT '{c}' AS column_name, COUNT({c}) AS n,
               {oracle_davg(c, 4)} AS avg_value,
               MIN({c}) AS min_value, MAX({c}) AS max_value
        FROM lineitem
        """
        for c in _DESCRIBE_COLS
    ]
    return " UNION ALL ".join(selects)


@query("describe_stats", oracle=_describe_oracle())
def describe_stats(spark, sf_dir):
    """A10 — deterministic describe() twin: count/avg/min/max per numeric
    column, computed in ONE aggregation pass then unpivoted with stack()."""
    li = load_table(spark, sf_dir, "lineitem")
    return describe_exact(li, _DESCRIBE_COLS)


@query(
    "count_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def count_distinct(spark, sf_dir):
    """Extension (§2.4 gap): exact distinct aggregate. Spark plans this as a
    two-phase expand + aggregate; approx_count_distinct is the 100-TB-scale
    alternative exposed by the engine API."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@query(
    "rollup_sums",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {oracle_dsum('l_quantity', 2)} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_sums(spark, sf_dir):
    """Extension (§2.4 gap): ROLLUP — the heatmap's marginals for free."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity", 2).alias("sum_qty")
    )


@query(
    "cube_sums",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {oracle_dsum('l_quantity', 2)} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_sums(spark, sf_dir):
    """Extension: CUBE over the same keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity", 2).alias("sum_qty")
    )


@query(
    "pivot_linestatus",
    oracle=f"""
    SELECT l_returnflag,
           {oracle_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 2)} AS qty_O,
           {oracle_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 2)} AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark, sf_dir):
    """Extension: pivot with an explicit value list (explicit list avoids the
    extra distinct-values job and keeps the plan static at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity", 2))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
    )


@query(
    "exact_quantiles",
    oracle="""
    SELECT quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           quantile_cont(l_quantity, 0.90) AS p90,
           quantile_cont(l_quantity, 0.99) AS p99
    FROM lineitem
    """,
)
def exact_quantiles_q(spark, sf_dir):
    """A9 — exact interpolated percentiles. The engine also exposes the
    approximate path (approxQuantile / percentile_approx, reference
    spark_jobs/02_clean_eda.py:88-90) which is the 100-TB default; exact is
    used here because approx sketches don't hash-match across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.50)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.expr("percentile(l_quantity, 0.90)").alias("p90"),
        F.expr("percentile(l_quantity, 0.99)").alias("p99"),
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark, sf_dir):
    """O4 — global top-k → TakeOrderedAndProject (per-partition heaps + k-row
    merge; no full sort even at 100 TB)."""
    o = load_table(spark, sf_dir, "orders")
    return top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.col("o_orderkey")],
        10,
    )


@query("approx_quantiles")
def approx_quantiles(spark, sf_dir):
    """A9 — the APPROXIMATE quantile path the reference actually uses
    (approxQuantile / percentile_approx, spark_jobs/02_clean_eda.py:88-90).
    Sketch results can't hash-match another engine ⇒ rows-only check; the
    exact twin (exact_quantiles) carries the value-level oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = li.stat.approxQuantile("l_extendedprice", [0.5, 0.9, 0.99], 0.01)
    if not qs:  # empty input: approxQuantile returns [] -> well-typed empty
        return spark.createDataFrame([], "quantile double, value double")
    return spark.createDataFrame(
        [(0.5, qs[0]), (0.9, qs[1]), (0.99, qs[2])], "quantile double, value double"
    )


@query("approx_count_distinct")
def approx_count_distinct_q(spark, sf_dir):
    """HyperLogLog++ distinct estimate — the 100 TB-scale path for
    cardinality (exact countDistinct shuffles an expand; HLL is one pass,
    constant memory). Sketch value ⇒ rows-only check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count("*").alias("n"),
    )


@query("sampled_agg")
def sampled_agg(spark, sf_dir):
    """O5 — seeded sampling (df.sample) + aggregate. Sample membership
    depends on partitioning ⇒ rows-only check; determinism under a FIXED
    partitioning is covered by tests."""
    o = load_table(spark, sf_dir, "orders")
    return o.sample(fraction=0.1, seed=42).agg(
        F.count("*").alias("n_sampled"),
        dsum("o_totalprice", 2).alias("sum_total"),
    )


@query(
    "grouping_sets_sums",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {oracle_dsum('l_quantity', 2)} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_sums(spark, sf_dir):
    """Extension: explicit GROUPING SETS (the general form of rollup/cube),
    via the SQL front door — one Expand + one aggregate, not three scans."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(try_cast(ROUND(l_quantity * 100.0) as bigint)) AS DOUBLE) / 100.0
                 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query("stratified_sample")
def stratified_sample(spark, sf_dir):
    """O5 width — stratified sampling (``sampleBy``): per-stratum Bernoulli
    fractions, the tool for rebalancing skewed classes in a training-set
    build (e.g. downsample the dominant event type). Sample membership
    depends on partitioning ⇒ rows-only check, like ``sampled_agg``;
    per-stratum rates and determinism under a fixed partitioning are
    pytest-gated."""
    ev = load_table(spark, sf_dir, "events")
    fractions = {"view": 0.1, "click": 0.5, "purchase": 1.0, "error": 1.0,
                 "signup": 0.2}
    return (
        ev.sampleBy("event_type", fractions, seed=42)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"), dsum("value", 2).alias("sum_value"))
    )
