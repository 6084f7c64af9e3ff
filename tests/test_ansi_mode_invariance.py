"""In-suite tripwire for the ANSI-mode invariance axis.

`scripts/layout_invariance_audit.py --ansi` proves the full catalog
returns bit-identical results with `spark.sql.ansi.enabled` on and off
(the off setting is every pre-4.0 cluster still in production); this
subset keeps the representative arithmetic-heavy shapes — exact-cents
folds, quantized similarity kernels, guarded divisions, overflow-prone
integer accumulations — pinned in the default suite.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_pyspark_spark.catalog import QUERIES  # noqa: E402

SF = "/root/testdata/sf0.001"

SUBSET = [
    "pricing_summary",  # exact-cents multi-agg (the flagship fold)
    "text_minhash_signature",  # integer hash lanes (overflow-prone ops)
    "embed_cosine_topk",  # quantized dot-product fold
    "stats_mann_whitney",  # floor-cell quantization + rank arithmetic
    "sql_daily_kpis",  # FLOOR-idiom portable rounding
    "events_cusum_changepoint",  # undivided integer CUSUM argmax
]


def _canon_hash(df) -> str:
    pdf = df.toPandas().reindex(sorted(df.columns), axis=1)

    def cell(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else v.hex()
        return repr(v)

    rows = sorted(
        "|".join(cell(v) for v in rec) for rec in pdf.itertuples(index=False)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def sessions(spark):
    on = spark.newSession()
    on.conf.set("spark.sql.ansi.enabled", "true")
    off = spark.newSession()
    off.conf.set("spark.sql.ansi.enabled", "false")
    return on, off


@pytest.mark.parametrize("name", SUBSET)
def test_result_invariant_to_ansi_mode(sessions, name):
    on, off = sessions
    fn = QUERIES[name]
    assert _canon_hash(fn(on, SF)) == _canon_hash(fn(off, SF))
