"""Whole-catalog DEGENERATE-ROW sweep (round-10 hardening).

The empty-input sweep proves zero-row behavior; this one proves the other
end: tables that exist but contain the rows a 100 TB crawl actually has —
empty and whitespace-only documents, zero-norm embeddings, exact-duplicate
vectors, zero prices / 100 % discounts, dangling foreign keys, tied
timestamps, NULL measure values, malformed JSON props, empty-string
dimension labels. Every registered query must run to completion (NaN/NULL
outputs are honest answers on degenerate data; the documented ValueError
contract for parameter-lookup queries is allowed) — a runtime exception is
a defect. text_sliding_chunks' 'Illegal sequence boundaries' crash on
token-less docs is the class this sweep exists to catch.
"""

from __future__ import annotations

import datetime
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TS = datetime.datetime(2024, 1, 10, 12, 0, 0)


def _t(**cols) -> pa.Table:
    return pa.table(cols)


def _ts_arr(vals):
    return pa.array(vals, type=pa.timestamp("us"))


def write_degenerate_tables(dirpath) -> str:
    """Materialize the 10-table adversarial fixture under ``dirpath``.

    Module-level (not just a fixture) so the dirty-data ORACLE-parity
    audit (scripts/dirty_parity_audit.py) can run check_parity against the
    same fixture the no-crash sweep uses."""
    import pathlib

    d = pathlib.Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)

    def w(name: str, table: pa.Table) -> None:
        ref = pq.read_schema(f"/root/testdata/sf0.001/{name}.parquet")
        table = table.cast(
            pa.schema([ref.field(i) for i in range(len(ref.names))])
        )
        pq.write_table(table, str(d / f"{name}.parquet"))

    w("region", _t(
        r_regionkey=pa.array([0, 1], pa.int32()),
        r_name=["AMERICA", ""],  # empty dimension label
    ))
    w("nation", _t(
        n_nationkey=pa.array([0, 1], pa.int32()),
        n_name=["UNITED STATES", ""],
        n_regionkey=pa.array([0, 1], pa.int32()),
    ))
    w("customer", _t(
        c_custkey=[1, 2, 3],
        c_name=["Customer#1", "", "Customer#3"],
        c_nationkey=pa.array([0, 1, 7], pa.int32()),  # 7: dangling FK
        c_acctbal=[0.0, -999.99, 100.0],
        c_mktsegment=["BUILDING", "", "BUILDING"],  # empty segment
    ))
    w("supplier", _t(
        s_suppkey=[1, 2],
        s_name=["Supplier#1", ""],
        s_nationkey=pa.array([0, 9], pa.int32()),  # 9: dangling FK
        s_acctbal=[-1.0, 0.0],
    ))
    w("part", _t(
        p_partkey=[1, 2, 3],
        p_name=["green part", "", "green part"],
        p_brand=["Brand#1", "", "Brand#1"],
        p_type=["ECONOMY BRASS", "", "PROMO STEEL"],
        p_size=pa.array([0, 1, 50], pa.int32()),  # zero size
        p_retailprice=[0.0, 0.01, 901.0],  # zero price
    ))
    w("orders", _t(
        o_orderkey=[1, 2, 3, 4],
        o_custkey=[1, 1, 3, 99],  # 99: dangling FK; customer 2 orderless
        o_orderstatus=["F", "O", "F", "P"],
        o_totalprice=[0.0, 123.45, 123.45, 1.0],  # zero total; exact tie
        o_orderdate=_ts_arr([_TS, _TS, _TS, _TS]),  # all same day
        o_orderpriority=["1-URGENT", "", "5-LOW", "5-LOW"],
    ))
    # order 4 has NO lineitems; lineitem orderkey 77 dangles; row pair
    # (1,1) duplicates exactly; discount 1.0 zeroes revenue; qty 0
    li_rows = [
        (1, 1, 1, 1, 0.0, 0.0, 1.0, 0.0, "R", "F", _TS),
        (1, 1, 1, 1, 0.0, 0.0, 1.0, 0.0, "R", "F", _TS),
        (2, 2, 2, 1, 1.0, 100.0, 0.0, 0.08, "N", "O", _TS),
        (3, 3, 1, 1, 50.0, 901.0, 0.05, 0.0, "A", "F", _TS),
        (77, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _TS),
    ]
    w("lineitem", _t(
        l_orderkey=[r[0] for r in li_rows],
        l_partkey=[r[1] for r in li_rows],
        l_suppkey=[r[2] for r in li_rows],
        l_linenumber=pa.array([r[3] for r in li_rows], pa.int32()),
        l_quantity=[r[4] for r in li_rows],
        l_extendedprice=[r[5] for r in li_rows],
        l_discount=[r[6] for r in li_rows],
        l_tax=[r[7] for r in li_rows],
        l_returnflag=[r[8] for r in li_rows],
        l_linestatus=[r[9] for r in li_rows],
        l_shipdate=_ts_arr([r[10] for r in li_rows]),
    ))
    # tied timestamps for one user, NULL value, malformed JSON props,
    # a single purchase, an unknown event_type, value 0.0
    ev = [
        (1, _TS, 10, "click", 0.0, '{"k": 1}'),
        (2, _TS, 10, "click", None, "{"),  # NULL measure, broken JSON
        (3, _TS, 10, "error", 5.0, "{}"),
        (4, _TS + datetime.timedelta(seconds=1), 10, "purchase", 9.99, None),
        (5, _TS, 11, "view", 0.0, '{"k": 0}'),
        (6, _TS + datetime.timedelta(hours=40), 11, "mystery", 1.0, "null"),
        (7, _TS + datetime.timedelta(hours=41), 12, None, 2.0, None),
        # non-finite measures: one broken sensor must not abort the job
        (8, _TS + datetime.timedelta(hours=2), 13, "view", float("nan"), "{}"),
        (9, _TS + datetime.timedelta(hours=3), 13, "click", float("inf"), "{}"),
    ]
    w("events", _t(
        event_id=[r[0] for r in ev],
        ts=_ts_arr([r[1] for r in ev]),
        user_id=[r[2] for r in ev],
        event_type=[r[3] for r in ev],
        value=pa.array([r[4] for r in ev], pa.float64()),
        props=[r[5] for r in ev],
    ))
    docs = [
        (1, "", "en", "src0", 0),  # empty text
        (2, "   ", "en", "src0", 3),  # whitespace-only
        (3, "x", "en", "src1", 1),  # single char (below every gram k)
        (4, "word " * 64, "en", "src1", 320),  # one word repeated
        (5, "naïve café über 中文 emoji \U0001f600 text", "zh", "", 30),
        (6, "a" * 5000, "en", "src2", 5000),  # one enormous token
        (7, "the quick brown fox jumps over the lazy dog again and again",
         "", "src2", 60),  # empty lang
        (8, "the quick brown fox jumps over the lazy dog again and again",
         "en", "src3", 60),  # exact dup of 7's text, other source
        (9, None, None, "src3", 0),  # NULL text and lang
    ]
    w("documents", _t(
        doc_id=[r[0] for r in docs],
        text=[r[1] for r in docs],
        lang=[r[2] for r in docs],
        source=[r[3] for r in docs],
        n_chars=[r[4] for r in docs],
    ))
    dim = 64
    unit = [1.0] + [0.0] * (dim - 1)
    vecs = [
        (0, unit, 0),  # the parameter queries look up vec_id=0
        (1, [0.1] * dim, 0),
        (2, [0.0] * dim, 1),  # zero norm: cosine guards must not crash
        (3, [0.1] * dim, 1),  # exact duplicate of 1
        (4, [-1.0] * dim, 2),
        (5, [0.5] * dim, 2),
        (6, [float(i) for i in range(dim)], 0),
        (7, [1e-30] * dim, 1),  # denormal-ish norm
        (8, [float("nan")] + [0.5] * (dim - 1), 0),  # broken encoder output
        # r11 dirty-parity audit additions: ±Inf components previously
        # ABORTED every fold-based similarity query (floor(Inf)=Long.MAX,
        # next ANSI add overflows); all-NaN exercises the all-dirty-vector
        # COALESCE in the oracle accumulator
        (9, [float("inf")] + [0.5] * (dim - 1), 1),
        (10, [float("-inf"), float("inf")] + [0.25] * (dim - 2), 2),
        (11, [float("nan")] * dim, 0),
    ]
    w("embeddings", _t(
        vec_id=[r[0] for r in vecs],
        embedding=pa.array([r[1] for r in vecs], pa.list_(pa.float32())),
        label=pa.array([r[2] for r in vecs], pa.int32()),
    ))
    return str(d)


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    return write_degenerate_tables(tmp_path_factory.mktemp("degensf"))


# the documented clean-failure contract (same set as the empty sweep,
# minus the lookups satisfied by the fixture's vec_id=0)
_ALLOWED_ERRORS = (
    "query vector vec_id=0 not found",
    "no centroid vectors",
    "no PQ seed vectors",
    "no k-means seed vectors",
)


def test_every_query_survives_degenerate_rows(spark, degenerate_sf_dir):
    import __spark_entry__ as entry

    failures = []
    for name, fn in entry.queries().items():
        try:
            fn(spark, degenerate_sf_dir).collect()
        except ValueError as ex:
            if not any(a in str(ex) for a in _ALLOWED_ERRORS):
                failures.append(f"{name}: unexpected ValueError: {ex}")
        except Exception as ex:  # noqa: BLE001 — collecting a report
            failures.append(
                f"{name}: {type(ex).__name__}: "
                f"{str(ex).splitlines()[0][:160]}"
            )
    assert not failures, f"{len(failures)} defects:\n" + "\n".join(failures)


def test_dirty_oracle_parity_representative_subset(degenerate_sf_dir):
    """Cross-engine ORACLE parity on the dirty fixture for the families the
    round-11 audit found divergent (rank/ECDF stats, decimal window sums,
    the fold-based embedding family) plus their neighbors — the in-suite
    tripwire for NULL/NaN/Inf-handling asymmetries between the Spark plan
    and its DuckDB oracle. The full-catalog version is
    scripts/dirty_parity_audit.py (audit artifact, run per round)."""
    import subprocess

    subset = [
        "stats_mann_whitney", "stats_ks_test", "window_running_sum",
        "window_moving_avg", "embed_norms", "embed_cosine_topk",
        "embed_lsh_buckets", "embed_near_dup_pairs", "embed_knn_join",
        "embed_dim_stats", "embed_outlier_docs", "embed_power_iteration_pc1",
        "embed_centroid_drift", "embed_ann_int8", "embed_semantic_dedup",
        "search_hybrid_rrf", "udf_group_center", "stream_stateful_totals",
        "exact_quantiles", "events_value_winsorized",
        "events_distribution_drift", "histogram_totalprice",
    ]
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "scripts",
                "check_parity.py",
            ),
            degenerate_sf_dir,
            *subset,
        ],
        capture_output=True,
        text=True,
        timeout=1200,
        env={
            **os.environ,
            "PYTHONPATH": os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        },
    )
    bad = [
        ln
        for ln in proc.stdout.splitlines()
        if ln.startswith("FAIL") or ln.startswith("      ")
    ]
    assert f"{len(subset)} pass, 0 fail" in proc.stdout, (
        "dirty-data oracle divergence:\n" + "\n".join(bad[:40])
        + "\n" + proc.stdout[-800:] + proc.stderr[-400:]
    )
