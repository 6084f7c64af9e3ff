"""Plot/report image artifacts (SURVEY.md §2.12 V3/V4; reference
``spark_jobs/05b_plots.py:53-125`` bar charts and
``spark_jobs/05c_make_report.py:122-139`` dow×hour heatmap).

The reference renders matplotlib PNGs from small grouped-aggregate tables
and browses them in its UI (``streamlit_app/app5.py:311-344``). The engine
reproduces the artifact contract: aggregate in Spark → collect the ≤ few
hundred result rows via the Arrow sanitizer → render a PNG beside the CSV
export. Rendering prefers matplotlib when available (import-try per the
environment policy) and otherwise falls back to a built-in dependency-free
rasterizer + PNG encoder (stdlib ``zlib``/``struct`` + numpy) — the
artifacts are real, decodable PNGs either way.

Scale note: only aggregated KPI tables (≤ thousands of rows) are ever
collected; the heavy work stays in Spark. Rendering cost is O(pixels).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.sources.io import to_pandas_sanitized

try:  # pragma: no cover - exercised only where matplotlib is installed
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAVE_MPL = True
except Exception:  # pragma: no cover
    _HAVE_MPL = False


# ---------------------------------------------------------------- PNG encoder


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def write_png(path: str, rgb: np.ndarray) -> str:
    """Encode an (H, W, 3) uint8 array as a non-interlaced 8-bit RGB PNG."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("write_png expects an (H, W, 3) uint8 array")
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))
    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", header)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(payload)
    return path


# ------------------------------------------------------- builtin rasterizers

_BG = np.array([255, 255, 255], dtype=np.uint8)
_AXIS = np.array([64, 64, 64], dtype=np.uint8)
_BAR = np.array([70, 120, 190], dtype=np.uint8)

_MARGIN_L, _MARGIN_R, _MARGIN_T, _MARGIN_B = 12, 8, 8, 16


def render_bar(values: list[float], height: int = 240, bar_px: int = 14) -> np.ndarray:
    """Minimal bar-chart raster: axes + one bar per value, linear y scale
    anchored at 0 (negative values clip to the baseline)."""
    n = max(1, len(values))
    width = _MARGIN_L + _MARGIN_R + n * (bar_px + 4)
    img = np.tile(_BG, (height, width, 1))
    top, bottom = _MARGIN_T, height - _MARGIN_B
    vmax = max([v for v in values if v == v] + [0.0]) or 1.0
    for i, v in enumerate(values):
        if v != v:  # NaN
            continue
        frac = min(max(v, 0.0) / vmax, 1.0)
        bh = int(round(frac * (bottom - top)))
        x0 = _MARGIN_L + i * (bar_px + 4) + 2
        img[bottom - bh : bottom, x0 : x0 + bar_px] = _BAR
    img[bottom, _MARGIN_L - 2 : width - _MARGIN_R] = _AXIS  # x axis
    img[top:bottom + 1, _MARGIN_L - 2] = _AXIS  # y axis
    return img


def _colormap(frac: np.ndarray) -> np.ndarray:
    """Blue → yellow → red two-segment linear colormap on [0, 1]."""
    frac = np.clip(frac, 0.0, 1.0)
    lo = np.stack(
        [55 + 200 * (2 * frac), 90 + 150 * (2 * frac), 190 - 140 * (2 * frac)],
        axis=-1,
    )
    hi = np.stack(
        [
            255 * np.ones_like(frac),
            240 - 200 * (2 * frac - 1),
            50 * np.ones_like(frac) - 30 * (2 * frac - 1),
        ],
        axis=-1,
    )
    out = np.where(frac[..., None] < 0.5, lo, hi)
    return np.clip(out, 0, 255).astype(np.uint8)


def render_heatmap(grid: np.ndarray, cell_px: int = 16) -> np.ndarray:
    """Raster a 2-D value grid (NaN → background) as a colored heatmap."""
    finite = grid[np.isfinite(grid)]
    vmax = float(finite.max()) if finite.size else 1.0
    vmin = float(finite.min()) if finite.size else 0.0
    span = (vmax - vmin) or 1.0
    frac = (grid - vmin) / span
    colors = _colormap(np.nan_to_num(frac, nan=0.0))
    colors[~np.isfinite(grid)] = _BG
    img = np.repeat(np.repeat(colors, cell_px, axis=0), cell_px, axis=1)
    pad = np.tile(_BG, (img.shape[0] + 2 * _MARGIN_T, img.shape[1] + 2 * _MARGIN_T, 1))
    pad[_MARGIN_T : _MARGIN_T + img.shape[0], _MARGIN_T : _MARGIN_T + img.shape[1]] = img
    return pad


# ------------------------------------------------------------- artifact API


def save_bar_png(
    pdf: pd.DataFrame, x: str, y: str, path: str, title: str | None = None
) -> str:
    """Bar chart artifact for a small aggregate table (reference
    ``05b_plots.py:24-40`` ``save_bar``)."""
    if _HAVE_MPL:  # pragma: no cover
        fig, ax = plt.subplots(figsize=(8, 4.5))
        ax.bar(pdf[x].astype(str), pdf[y])
        ax.set_title(title or f"{y} by {x}")
        ax.set_xlabel(x)
        ax.set_ylabel(y)
        fig.tight_layout()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path)
        plt.close(fig)
        return path
    return write_png(path, render_bar([float(v) for v in pdf[y]]))


def save_heatmap_png(
    pdf: pd.DataFrame, row: str, col: str, value: str, path: str
) -> str:
    """Heatmap artifact from a long-form (row, col, value) aggregate
    (reference ``05c_make_report.py:122-139`` pivots dow×hour the same way)."""
    pivot = pdf.pivot_table(index=row, columns=col, values=value, aggfunc="sum")
    pivot = pivot.sort_index().sort_index(axis=1)
    grid = pivot.to_numpy(dtype=float)
    if _HAVE_MPL:  # pragma: no cover
        fig, ax = plt.subplots(figsize=(10, 4))
        im = ax.imshow(grid, aspect="auto", cmap="viridis")
        ax.set_xlabel(col)
        ax.set_ylabel(row)
        fig.colorbar(im, ax=ax)
        fig.tight_layout()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path)
        plt.close(fig)
        return path
    return write_png(path, render_heatmap(grid))


def export_plot_reports(featured: DataFrame, out_dir: str) -> dict[str, str]:
    """The reference's four plot shapes as PNG artifacts beside the CSVs:
    trips by day, trips by hour, trips by payment label, dow×hour heatmap
    (``05b_plots.py:53-125``, ``05c_make_report.py:122-139``).

    ``featured`` is a trips table after ``engineer_features`` (needs
    ``pickup_hour``/``pickup_dow``/``payment_type`` columns).
    """
    from nyc_taxi_pyspark_spark.operators.taxi import kpi_heatmap, payment_lookup

    spark = featured.sparkSession
    by_day = (
        featured.groupBy(F.to_date("tpep_pickup_datetime").alias("day"))
        .agg(F.count("*").alias("trips"))
        .orderBy("day")
    )
    by_hour = (
        featured.groupBy("pickup_hour")
        .agg(F.count("*").alias("trips"))
        .orderBy("pickup_hour")
    )
    by_payment = (
        featured.join(F.broadcast(payment_lookup(spark)), "payment_type", "left")
        .groupBy(F.coalesce("payment_label", F.lit("Unknown")).alias("payment_label"))
        .agg(F.count("*").alias("trips"))
        .orderBy(F.desc("trips"), "payment_label")
    )
    heat = kpi_heatmap(featured)

    paths = {
        "trips_by_day": save_bar_png(
            to_pandas_sanitized(by_day), "day", "trips",
            os.path.join(out_dir, "trips_by_day.png"),
        ),
        "trips_by_hour": save_bar_png(
            to_pandas_sanitized(by_hour), "pickup_hour", "trips",
            os.path.join(out_dir, "trips_by_hour.png"),
        ),
        "trips_by_payment": save_bar_png(
            to_pandas_sanitized(by_payment), "payment_label", "trips",
            os.path.join(out_dir, "trips_by_payment.png"),
        ),
        "heatmap_dow_hour": save_heatmap_png(
            to_pandas_sanitized(heat), "pickup_dow", "pickup_hour", "trips",
            os.path.join(out_dir, "heatmap_dow_hour.png"),
        ),
    }
    return paths
