"""SQL-string entry point queries (SURVEY.md §3.2, §2.12 V1).

The reference's second lifecycle: register temp views, run SQL text through
``spark.sql`` (spark_jobs/02d_sql_aggs.py, 05a_sql_insights.py; user SQL at
streamlit_app/app5.py:263-271). Same Catalyst plans as the DataFrame
builder — these queries prove the front door end-to-end.
"""

from __future__ import annotations

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.functions.exact import oracle_davg, oracle_dsum
from nyc_taxi_pyspark_spark.sources.io import load_table


def _register(spark, sf_dir, *names):
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "sql_daily_kpis",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS order_day,
           COUNT(*) AS n_orders,
           FLOOR(({oracle_davg('o_totalprice', 2)}) * 100 + 0.5) / 100 AS avg_total
    FROM orders
    GROUP BY 1
    """,
)
def sql_daily_kpis(spark, sf_dir):
    """The 02d daily-KPI SQL shape, verbatim through spark.sql.

    Presentation rounding uses the portable idiom FLOOR(x*100 + 0.5)/100:
    native ROUND(x, 2) diverges across engines when an average lands exactly
    on a half-cent (Java HALF_UP on the shortest decimal repr vs DuckDB's
    binary-nearest — observed on 8 of 1094 groups)."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT CAST(o_orderdate AS DATE) AS order_day,
               COUNT(*) AS n_orders,
               FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(o_totalprice)) * 100 + 0.5) / 100 AS avg_total
        FROM orders
        GROUP BY 1
        """
    )


@query(
    "sql_insight_topk",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           {oracle_dsum('o_totalprice', 2)} AS sum_total
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 10
    ORDER BY sum_total DESC, o_orderpriority
    LIMIT 5
    """,
)
def sql_insight_topk(spark, sf_dir):
    """05a's HAVING + ORDER BY + LIMIT insight shape with a correlated
    EXISTS — SQL front door exercising semi-join planning."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_quantity > 45)
        GROUP BY o_orderpriority
        HAVING COUNT(*) > 10
        ORDER BY sum_total DESC, o_orderpriority
        LIMIT 5
        """
    )


@query(
    "sql_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN json_valid(props) THEN
                    json_extract_string(props, '$.k') END AS BIGINT))
                AS BIGINT)
             AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def sql_json_extract(spark, sf_dir):
    """JSON-string column access (the events.props surface SURVEY §2.8 notes
    as a needed extension): get_json_object → typed aggregate."""
    _register(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k
        FROM events
        GROUP BY event_type
        """
    )


@query(
    "sql_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (
        SELECT c_name, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """,
)
def sql_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 customers
    per nation by balance) — the SQL-surface twin of the rank-window
    top-N: Spark 4 decorrelates the lateral into a partitioned window
    under the hood, so the declarative per-row-subquery form costs the
    same single shuffle as window_topn_per_group. Proves the front door
    accepts the LATERAL idiom users bring from DuckDB/Postgres. Acctbal
    values are 2dp-exact parquet doubles, so ordering and the hash check
    are drift-free; full (balance, name) tiebreaks keep the top-2 sets
    deterministic."""
    _register(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n,
        LATERAL (
            SELECT c_name, c_acctbal FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
        """
    )
