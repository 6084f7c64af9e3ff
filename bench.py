#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], one cold run + 5 timed runs per query (median —
5 rather than 3 so a single JVM GC/JIT blip cannot shift the median of an
otherwise-stable query), materializing each plan fully through the noop
sink (no collect cost, no pruned work). Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "queries_cold": {...}, "sf": ...}

Cold/warm split (BASELINE.md §5): `queries` (warm medians, gating the 2×
rule) exclude one-time layout builds; `queries_cold` is each query's FIRST
run in the process — for queries that build a session-persisted layout
(text_*_pairs, embed_ann_*) it includes that build, so amortized numbers
are never presented as if they were end-to-end.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "pricing_summary",
    "group_by_day",
    "having_topk",
    "dedup_keep_first",
    "join_three_way",
    "join_asof",
    "window_topn_per_group",
    "rollup_sums",
    # streaming twins
    "stream_session_window",
    # python paths
    "udf_group_center",
    "multimodal_features",
    # text / similarity north star
    "text_minhash_signature",
    "text_near_dup_pairs",
    "text_ngram_jaccard_pairs",
    "text_simhash_pairs",
    "embed_cosine_topk",
    "embed_ann_topk",
    "embed_ann_multiprobe",
    "embed_ivf_topk",
    "grouping_sets_sums",
    "taxi_kpi_by_payment",
    "text_unigram_rarity",
    # round-3 additions (self-baselined in BASELINE.md §5)
    "events_sessionize",
    "text_chunk_dedup",
    "corpus_pack_bins",
    "text_gopher_rules",
    "embed_semantic_dedup",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    from nyc_taxi_pyspark_spark.catalog import QUERIES
    from nyc_taxi_pyspark_spark.session import get_spark

    spark = get_spark("bench")

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))  # cold: JIT, file listing, layout builds
        cold[name] = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        print(
            f"  {name}: {timings[name]}s cold={cold[name]}s "
            f"(runs: {[round(r, 3) for r in runs]})",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
