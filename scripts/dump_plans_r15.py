#!/usr/bin/env python
"""Dump .explain('formatted') for the round-15 optimization targets.

Usage: python scripts/dump_plans_r15.py <suffix> [query ...]
Writes plans/r15/<query>_<suffix>.txt for each target (default: the
round-15 target list). For queries whose build runs driver-side loops
(power iteration, k-core, pagerank), the dump is the FINAL returned
frame's plan — the loop structure is documented in OPTIMIZATION_r15.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_pyspark_spark.catalog import QUERIES  # noqa: E402
from nyc_taxi_pyspark_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TARGETS = [
    "source_syndication_rank",
    "udf_group_center",
    "graph_kcore_membership",
    "embed_power_iteration_pc1",
    "graph_link_prediction",
    "embed_semantic_dedup",
    "text_duplicate_spans",
    "text_novelty_curve",
    "search_hybrid_rrf",
    "text_heavy_hitters",
    "taxi_kpi_by_payment",
    "text_dedup_rate_by_source",
    "tpch_q21_waiting_suppliers",
    "corpus_bloom_prefilter",
    "text_keyphrases_rake",
    "text_ngram_jaccard_pairs",
    "corpus_source_overlap",
    "multimodal_features",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or TARGETS
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans-r15")
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = QUERIES[name](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building {name}: {exc}\n"
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {SF} ({suffix})\n")
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
