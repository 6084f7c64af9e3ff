"""Window-function queries (SURVEY.md §2.5 extension)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.operators.windows import running_dsum, top_n_per_group
from nyc_taxi_pyspark_spark.sources.io import load_table


@query(
    "window_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS INTEGER) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark, sf_dir):
    """Top-3 orders per customer — 'top-N per group', the query shape the
    reference can only express globally (A8). One shuffle on custkey."""
    o = load_table(spark, sf_dir, "orders")
    return top_n_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=[F.desc("o_totalprice"), F.col("o_orderkey")],
        n=3,
    )


@query(
    "window_lag_gap",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderdate) OVER w AS prev_orderdate,
           CAST(date_diff('day', CAST(LAG(o_orderdate) OVER w AS DATE),
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_gap(spark, sf_dir):
    """lag() analytic: days since the customer's previous order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_orderdate"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).alias("gap_days"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CASE WHEN isfinite(value)
                         THEN CAST(value AS DECIMAL(18,2)) END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
    # the isfinite CASE mirrors Spark's double->decimal cast, which yields
    # NULL on NaN/Inf (SUM then skips it); DuckDB 1.0's cast — even
    # TRY_CAST — errors on NaN instead (dirty-parity audit, round 11)
)
def window_running_sum(spark, sf_dir):
    """Running total per user over event time (decimal-exact, so the value
    is independent of how the window aggregator associates additions)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts", running_dsum("value", w).alias("running_value")
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CASE WHEN isfinite(value)
                         THEN CAST(value AS DECIMAL(18,2)) END) OVER w
                AS DOUBLE)
             / COUNT(value) OVER w AS moving_avg_3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    # isfinite CASE: same dirty-data mirror as window_running_sum
)
def window_moving_avg(spark, sf_dir):
    """3-row moving average per user (rolling frame)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (running_dsum("value", w) / F.count("value").over(w)).alias("moving_avg_3"),
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(RANK() OVER w AS INTEGER) AS price_rank,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS price_dense_rank
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
    """,
)
def window_rank_dense(spark, sf_dir):
    """rank/dense_rank — tie-stable by definition (equal keys get equal
    ranks), so no tie-breaker is needed for determinism."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "window_lead_share",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           LEAD(c_acctbal) OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey) AS next_acctbal,
           c_acctbal / NULLIF(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                OVER (PARTITION BY c_nationkey) AS DOUBLE), 0.0) AS share_of_nation
    FROM customer
    """,
)
def window_lead_share(spark, sf_dir):
    """lead() + partition-total share (unbounded window sum as denominator)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    wall = Window.partitionBy("c_nationkey")
    total = F.sum(F.col("c_acctbal").cast("decimal(18,2)")).over(wall).cast("double")
    share = F.col("c_acctbal") / F.nullif(total, F.lit(0.0))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.lead("c_acctbal").over(w).alias("next_acctbal"),
        share.alias("share_of_nation"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(SUM(try_cast(ROUND(o_totalprice * 100) as bigint))
                OVER (ORDER BY date_diff('day', DATE '1992-01-01',
                                         CAST(o_orderdate AS DATE))
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing7d_cents,
           CAST(COUNT(*)
                OVER (ORDER BY date_diff('day', DATE '1992-01-01',
                                         CAST(o_orderdate AS DATE))
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing7d_orders
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based, vs the moving-average query's ROWS frame):
    trailing-7-day totals keyed on days-since-epoch. RANGE windows over an
    int day index are the portable form — Spark's rangeBetween needs a
    numeric ordering column, and the int key sidesteps both engines'
    interval-frame quirks.

    Scale shape: a RANGE frame's value depends only on the ORDER BY key,
    so the window runs over the per-DAY aggregate (bounded by the
    calendar — ~2 500 rows for the whole TPC-H date range — never by row
    count) and the day-level trailing sums broadcast-join back to the
    rows. The naive form put every base row through one unpartitioned
    WindowExec task; this plan's only window input is the tiny day
    rollup. Identical output: every row of the same day had the
    identical frame anyway. Exact int-cents sums keep the value hash
    order-free."""
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(
        F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
    )
    cents = F.round(F.col("o_totalprice") * 100).try_cast("bigint")
    day_agg = o.groupBy(days.alias("__day")).agg(
        F.sum(cents).alias("__day_cents"),
        F.count("*").alias("__day_orders"),
    )
    wd = Window.orderBy("__day").rangeBetween(-6, 0)
    trailing = day_agg.select(
        "__day",
        F.sum("__day_cents").over(wd).alias("trailing7d_cents"),
        F.sum("__day_orders").over(wd).alias("trailing7d_orders"),
    )
    return (
        o.select("o_orderkey", "o_orderdate", days.alias("__day"))
        .join(F.broadcast(trailing), "__day")
        .select(
            "o_orderkey",
            "o_orderdate",
            "trailing7d_cents",
            "trailing7d_orders",
        )
    )
