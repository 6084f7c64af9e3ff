"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (pricing_summary — the TPC-H-Q1
shape generalizing the reference's KPI aggregates, SURVEY.md §2.4 A5) at
sf0.001. ``queries()``/``oracle_sql()`` expose the full named-query catalog
from ``nyc_taxi_pyspark_spark.catalog`` — one entry per implemented operator
from SURVEY.md §2, each with a DuckDB oracle twin where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver launches from.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from nyc_taxi_pyspark_spark.catalog import ORACLES, QUERIES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"

# CORRECTNESS_r01 recorded rows for exactly the first 50 registered queries,
# leaving the text/similarity/streaming/taxi/udf/sql families with no driver
# row. Emit the never-checked queries first (registration order within the
# group), then the round-1-green ones ordered flagship-first, so a bounded
# driver run always covers the families with the weakest evidence. All 87
# queries run either way; only the dict order changes.
_R01_CHECKED = [
    # flagship + one representative per round-1-green family first
    "pricing_summary",
    "join_three_way",
    "group_by_day",
    "window_topn_per_group",
    "dedup_keep_first",
    "rollup_sums",
    "having_topk",
    "join_asof",
    "grouping_sets_sums",
    "set_union_distinct",
    "heatmap_dow_hour",
    "exact_quantiles",
    "topk_orders",
    # the rest of the round-1-green set (registration order)
    "cast_projection",
    "derived_columns",
    "filter_battery",
    "null_or_valid",
    "membership_filter",
    "case_buckets",
    "dedup_distinct",
    "null_fill",
    "inline_lookup_table",
    "global_scalar_agg",
    "multi_measure_agg",
    "null_scan",
    "groupby_count_desc",
    "group_by_hour",
    "duplicate_groups",
    "describe_stats",
    "count_distinct",
    "cube_sums",
    "pivot_linestatus",
    "approx_quantiles",
    "approx_count_distinct",
    "sampled_agg",
    "join_lookup_enrich",
    "join_inner_agg",
    "join_left_missing",
    "join_semi",
    "join_anti",
    "join_range_buckets",
    "join_right_outer",
    "join_full_outer",
    "join_cross",
    "window_lag_gap",
    "window_running_sum",
    "window_moving_avg",
    "window_rank_dense",
    "window_lead_share",
    "set_union_all_counts",
]


def _ordered(mapping: dict) -> dict:
    checked = set(_R01_CHECKED)
    head = [n for n in QUERIES if n not in checked]
    tail = [n for n in _R01_CHECKED if n in QUERIES]
    return {n: mapping[n] for n in head + tail if n in mapping}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin per query (omitted ⇒ rows-only check)."""
    return _ordered(ORACLES)
