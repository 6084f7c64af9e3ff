"""Report artifact surface (SURVEY.md §2.12 V3/V4; reference
spark_jobs/05c_make_report.py:141-183 + streamlit_app/app5.py:311-344).

KPI tables are computed by the operator library and exported one
single-file CSV each under an artifact directory — the reference's report
convention. ``coalesce(1)`` is correct here: these are ≤ a few hundred rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from nyc_taxi_pyspark_spark.sources.io import write_csv_single


def export_reports(
    reports: dict[str, DataFrame], out_dir: str, limit: int | None = None
) -> dict[str, str]:
    """Write each named KPI DataFrame to ``<out_dir>/<name>/`` as a
    single-file CSV; returns name → path."""
    paths = {}
    for name, df in reports.items():
        path = os.path.join(out_dir, name)
        write_csv_single(df, path, limit=limit)
        paths[name] = path
    return paths


def list_reports(out_dir: str) -> list[str]:
    """V4 — artifact directory browsing: single-file-CSV report dirs plus
    image artifacts (the reference UI lists both, app5.py:311-344)."""
    if not os.path.isdir(out_dir):
        return []
    return sorted(
        d
        for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)) or d.endswith(".png")
    )
