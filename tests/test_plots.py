"""Plot artifact tests: the reference's four plot shapes render as real,
decodable PNGs beside the CSV reports (reference spark_jobs/05b_plots.py,
05c_make_report.py; UI browsing at streamlit_app/app5.py:311-344)."""

from __future__ import annotations

import struct
import tempfile
import zlib

import numpy as np
import pandas as pd

from nyc_taxi_pyspark_spark.serve.plots import (
    export_plot_reports,
    render_bar,
    render_heatmap,
    save_bar_png,
    write_png,
)
from nyc_taxi_pyspark_spark.serve.reports import list_reports


def _decode_png(path: str) -> tuple[int, int, bytes]:
    """Minimal PNG reader: returns (width, height, raw scanline bytes)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", chunk[:10])
            assert (bit_depth, color_type) == (8, 2)  # 8-bit RGB
        elif tag == b"IDAT":
            idat += chunk
        pos += 12 + length
    assert w is not None and idat
    return w, h, zlib.decompress(idat)


def test_png_encoder_roundtrip(tmp_path):
    img = np.zeros((4, 3, 3), dtype=np.uint8)
    img[1, 2] = [10, 20, 30]
    path = write_png(str(tmp_path / "t.png"), img)
    w, h, raw = _decode_png(path)
    assert (w, h) == (3, 4)
    # scanline 1 (filter byte + 3 px), px 2 holds the value
    offset = 1 * (1 + 3 * 3)
    line = raw[offset : offset + 10]
    assert line[0] == 0 and tuple(line[7:10]) == (10, 20, 30)


def test_renderers_shape():
    bar = render_bar([1.0, 5.0, 3.0])
    assert bar.ndim == 3 and bar.dtype == np.uint8
    heat = render_heatmap(np.array([[1.0, 2.0], [3.0, float("nan")]]))
    assert heat.ndim == 3 and heat.dtype == np.uint8


def test_save_bar_png_from_pandas(tmp_path):
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [3.0, 1.0]})
    path = save_bar_png(pdf, "k", "v", str(tmp_path / "bar.png"))
    w, h, _ = _decode_png(path)
    assert w > 0 and h > 0


def test_export_plot_reports_reference_shapes(spark, trips):
    from nyc_taxi_pyspark_spark.operators.taxi import clean_trips, engineer_features

    featured = engineer_features(clean_trips(trips))
    with tempfile.TemporaryDirectory() as d:
        paths = export_plot_reports(featured, d)
        assert set(paths) == {
            "trips_by_day",
            "trips_by_hour",
            "trips_by_payment",
            "heatmap_dow_hour",
        }
        for p in paths.values():
            w, h, raw = _decode_png(p)
            assert w > 20 and h > 20 and len(raw) == h * (1 + 3 * w)
        # the artifact browser lists the PNGs
        listed = list_reports(d)
        assert {"trips_by_day.png", "heatmap_dow_hour.png"} <= set(listed)


def test_render_index_html_embeds_reports(spark, trips, tmp_path):
    from nyc_taxi_pyspark_spark.operators.taxi import (
        clean_trips,
        engineer_features,
        kpi_by_payment,
        payment_lookup,
    )
    from nyc_taxi_pyspark_spark.serve.plots import export_plot_reports
    from nyc_taxi_pyspark_spark.serve.reports import (
        export_reports,
        render_index_html,
    )

    featured = engineer_features(clean_trips(trips))
    out = str(tmp_path / "reports")
    export_reports(
        {"by_payment": kpi_by_payment(featured, payment_lookup(featured.sparkSession))},
        out,
    )
    export_plot_reports(featured, out)
    index = render_index_html(out)
    html_text = open(index).read()
    assert "by_payment" in html_text and "<table>" in html_text
    assert "data:image/png;base64," in html_text  # PNGs embedded inline
