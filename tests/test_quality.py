"""Tests for the data-quality audit, table diff, and group-mean imputation
operators (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.operators.quality import (
    dq_audit,
    fill_group_mean,
    key_sequence_gaps,
    table_diff,
)
from nyc_taxi_pyspark_spark.operators.skew import salted_aggregate


def test_dq_audit_counts_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (3, None, 2.0), (3, "a", 0.0)],
        "id bigint, s string, x double",
    )
    rep = {
        r["constraint"]: r
        for r in dq_audit(
            df,
            checks=[
                ("s_not_null", F.col("s").isNotNull()),
                ("x_positive", F.col("x") > 0),
            ],
            unique_keys=[("id_unique", ["id"])],
        ).collect()
    }
    assert rep["s_not_null"]["n_rows"] == 4
    assert rep["s_not_null"]["n_violations"] == 1
    assert not rep["s_not_null"]["passed"]
    assert rep["x_positive"]["n_violations"] == 2  # -1.0 and 0.0
    assert rep["id_unique"]["n_violations"] == 1  # id=3 twice
    # a passing constraint reports passed=True
    ok = dq_audit(df, checks=[("id_not_null", F.col("id").isNotNull())])
    row = ok.collect()[0]
    assert row["passed"] and row["n_violations"] == 0


def test_table_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0), (4, None, 40.0)],
        "k bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "y", 20.0), (3, "z", 99.0), (4, None, 40.0), (5, "w", 50.0)],
        "k bigint, s string, v double",
    )
    out = {
        r["k"]: r["status"]
        for r in table_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert out == {
        1: "removed",
        2: "same",
        3: "changed",
        4: "same",  # null-safe compare: None == None is same, not changed
        5: "added",
    }


def test_dq_audit_empty_input_reports_zero_violations(spark):
    df = spark.createDataFrame([], "id bigint, x double")
    rows = dq_audit(
        df, checks=[("x_positive", F.col("x") > 0)]
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # SUM over zero rows is NULL; the audit must still report a verdict
    assert r["n_rows"] == 0
    assert r["n_violations"] == 0
    assert r["passed"] is True


def test_table_diff_null_keyed_rows_report_their_own_side(spark):
    # a NULL key never joins: the old-side row must be 'removed' and the
    # new-side row 'added', not both 'added' (the key-null-check bug)
    old = spark.createDataFrame(
        [(None, "x", 1.0), (1, "y", 2.0)], "k bigint, s string, v double"
    )
    new = spark.createDataFrame(
        [(None, "z", 3.0), (1, "y", 2.0)], "k bigint, s string, v double"
    )
    rows = table_diff(old, new, ["k"], ["s", "v"]).collect()
    statuses = sorted(
        r["status"] for r in rows if r["k"] is None
    )
    assert statuses == ["added", "removed"]
    assert [r["status"] for r in rows if r["k"] == 1] == ["same"]


def test_key_sequence_gaps_matches_global_lead_across_boundaries(spark):
    # keys with gaps placed so that (at 8 range partitions over 0..4000)
    # several gaps straddle partition boundaries; compare against the
    # naive global-LEAD form
    present = [
        k
        for k in range(0, 4001)
        if not (500 <= k < 510 or k % 997 == 0 or 2999 <= k <= 3001)
    ]
    df = spark.createDataFrame([(k,) for k in present], "k bigint")
    got = sorted(
        map(tuple, key_sequence_gaps(df.repartition(8), "k").collect())
    )
    expect = []
    for a, b in zip(present, present[1:]):
        if b - a > 1:
            expect.append((a + 1, b - 1, b - a - 1))
    assert got == sorted(expect)
    # layout-independent: different input partitioning, same gaps
    again = sorted(
        map(tuple, key_sequence_gaps(df.repartition(1), "k").collect())
    )
    assert again == got


def test_fill_group_mean_imputes_group_mean_only_for_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None)],
        "g string, v double",
    )
    rows = fill_group_mean(df, ["g"], "v").collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["g"], []).append(r["v"])
    assert sorted(by_group["a"]) == [1.0, 2.0, 3.0]  # null -> mean(1,3)=2
    assert sorted(by_group["b"]) == [10.0, 10.0]
    # layout-independence: same result after repartition
    rows2 = fill_group_mean(df.repartition(5), ["g"], "v").collect()
    assert sorted((r["g"], r["v"]) for r in rows2) == sorted(
        (r["g"], r["v"]) for r in rows
    )


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [("k%d" % (i % 3), float(i)) for i in range(300)],
        "k string, v double",
    )
    cents = F.round(F.col("v") * 100).cast("bigint")
    salted = salted_aggregate(
        df,
        keys=["k"],
        measures={"pn": F.count(F.lit(1)), "pc": F.sum(cents)},
        finals={
            "n": F.sum("pn"),
            "s": F.sum("pc").cast("double") / F.lit(100.0),
        },
        n_salt=8,
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents).cast("double") / F.lit(100.0)).alias("s"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_dsum_wide_matches_dsum_and_is_layout_independent(spark):
    from nyc_taxi_pyspark_spark.functions.exact import dsum, dsum_wide

    df = spark.createDataFrame(
        [(float(i) + 0.25,) for i in range(1, 4001)], "v double"
    )
    a = df.agg(dsum("v", 2).alias("s"), dsum_wide("v", 2).alias("w")).collect()[0]
    assert a["s"] == a["w"]  # same value in non-overflow range
    b = df.repartition(13).agg(dsum_wide("v", 2).alias("w")).collect()[0]
    assert a["w"] == b["w"]  # partition-layout independent
    # squared-moment shape: large per-row cents still exact
    sq = df.selectExpr("v * v AS v2")
    c = sq.agg(dsum_wide("v2", 4).alias("w")).collect()[0]["w"]
    exact = sum(round((i + 0.25) ** 2 * 10**4) for i in range(1, 4001)) / 10**4
    assert abs(c - exact) < 1e-6


def test_dsum_wide_sign_safe_and_oracle_twin_agrees_on_negatives(spark):
    import duckdb
    import pandas as pd

    from nyc_taxi_pyspark_spark.functions.exact import (
        dsum_wide,
        oracle_dsum_wide,
    )

    # mixed-sign values: the hi*W + lo recombination must reconstruct the
    # exact total on BOTH engines (DuckDB's % takes the dividend's sign;
    # the oracle twin's pmod idiom compensates)
    vals = [((-1) ** i) * (i + 0.25) * 12345.0 for i in range(1, 2001)]
    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    got = sdf.agg(dsum_wide("v", 2).alias("w")).collect()[0]["w"]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    want = con.execute(
        f"SELECT {oracle_dsum_wide('v', 2)} AS w FROM t"
    ).fetchone()[0]
    assert got == want  # bit-identical
    exact = sum(round(v * 100) for v in vals) / 100.0
    assert abs(got - exact) < 1e-6


def test_weighted_sample_exact_k_deterministic_and_weight_biased(spark):
    from nyc_taxi_pyspark_spark.operators.corpus import weighted_sample

    # 200 light items (w=1) + 200 heavy items (w=20)
    df = spark.createDataFrame(
        [(f"l{i}", 1.0) for i in range(200)]
        + [(f"h{i}", 20.0) for i in range(200)],
        "id string, w double",
    )
    out = weighted_sample(df, "id", F.col("w"), 40).collect()
    assert len(out) == 40  # exact k
    heavy = sum(1 for r in out if r["id"].startswith("h"))
    assert heavy >= 30  # 20x weight dominates the draw
    # deterministic and layout-independent
    again = weighted_sample(df.repartition(7), "id", F.col("w"), 40).collect()
    assert sorted(r["id"] for r in again) == sorted(r["id"] for r in out)


def test_pagerank_int_matches_python_mirror_and_is_deterministic(spark):
    from nyc_taxi_pyspark_spark.operators.graph import PR_SCALE, pagerank_int

    edge_list = [
        ("a", "b", 2), ("b", "a", 2), ("b", "c", 1),
        ("c", "b", 1), ("a", "c", 3), ("c", "a", 3),
    ]  # d and e isolated (dangling)
    node_list = ["a", "b", "c", "d", "e"]
    edges = spark.createDataFrame(edge_list, "src string, dst string, w bigint")
    nodes = spark.createDataFrame([(n,) for n in node_list], "node string")
    K, D = 4, 85
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_int(edges, nodes, 5, iterations=K,
                              damping_pct=D).collect()
    }

    # pure-Python mirror of the exact integer update rule
    out_w = {}
    for s, _, w in edge_list:
        out_w[s] = out_w.get(s, 0) + w
    rank = {n: PR_SCALE // 5 for n in node_list}
    base = ((100 - D) * PR_SCALE) // 100 // 5
    for _ in range(K):
        in_w = {n: 0 for n in node_list}
        for s, d, w in edge_list:
            in_w[d] += (rank[s] * w) // out_w[s]
        dang = sum(rank[n] for n in node_list if n not in out_w)
        rank = {
            n: base + (D * (in_w[n] + dang // 5)) // 100 for n in node_list
        }
    assert got == rank
    # dangling nodes share only the teleport + dangling mass
    assert got["d"] == got["e"] < min(got["a"], got["b"], got["c"])
    # deterministic across partitionings
    again = {
        r["node"]: r["rank_micro"]
        for r in pagerank_int(edges.repartition(7), nodes.repartition(3), 5,
                              iterations=K, damping_pct=D).collect()
    }
    assert again == got


def test_key_sequence_gaps_pins_one_partitioning(spark):
    # the LEAD branch and the boundary-min branch must consume the SAME
    # pid->range mapping; the operator pins it with an eager
    # localCheckpoint, which shows up as a lineage-cut ExistingRDD scan
    # (twice: once per branch) instead of two independent range exchanges
    df = spark.range(0, 100).selectExpr("id as k")
    plan = (
        key_sequence_gaps(df, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ExistingRDD" in plan, plan
    assert "rangepartitioning" not in plan.lower(), (
        "range exchange survived below the checkpoint — branches may "
        "observe different boundary placements:\n" + plan
    )


def test_iterative_durable_checkpoint_mode(spark, tmp_path):
    # checkpoint_dir switches the per-iteration lineage cut from
    # executor-pinned localCheckpoint to reliable checkpoint(): results
    # must be bit-identical, real rdd-* checkpoint data must land in the
    # dir (the durability proof — executor loss costs a reread, not the
    # run), and the returned plan must still be lineage-cut.
    from nyc_taxi_pyspark_spark.operators.graph import pagerank_int
    from nyc_taxi_pyspark_spark.operators.text import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 3)],
        "src string, dst string, w bigint",
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "node string"
    )
    local = {
        r["node"]: r["rank_micro"]
        for r in pagerank_int(edges, nodes, 4, iterations=3).collect()
    }
    ckpt = str(tmp_path / "pr_ckpt")
    durable_df = pagerank_int(
        edges, nodes, 4, iterations=3, checkpoint_dir=ckpt
    )
    durable = {r["node"]: r["rank_micro"] for r in durable_df.collect()}
    assert durable == local
    import glob

    written = glob.glob(f"{ckpt}/*/rdd-*")
    assert written, "reliable checkpoint wrote no rdd-* data"
    plan = durable_df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan  # lineage cut survived into the plan

    pair_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "doc_a bigint, doc_b bigint"
    )
    for fn in (connected_components, connected_components_star):
        base = sorted(
            map(tuple, fn(pair_edges).collect())
        )
        dur = sorted(
            map(
                tuple,
                fn(
                    pair_edges,
                    checkpoint_dir=str(tmp_path / fn.__name__),
                ).collect(),
            )
        )
        assert dur == base
        assert glob.glob(f"{tmp_path / fn.__name__}/*/rdd-*")


def test_key_sequence_gaps_durable_checkpoint_mode(spark, tmp_path):
    import glob

    df = spark.createDataFrame(
        [(k,) for k in (1, 2, 5, 6, 9)], "k bigint"
    )
    base = sorted(map(tuple, key_sequence_gaps(df, "k").collect()))
    ckpt = str(tmp_path / "gaps_ckpt")
    dur = sorted(
        map(
            tuple,
            key_sequence_gaps(df, "k", checkpoint_dir=ckpt).collect(),
        )
    )
    assert dur == base == [(3, 4, 2), (7, 8, 2)]
    assert glob.glob(f"{ckpt}/*/rdd-*")


def test_triangle_counts_known_graph_and_layout_invariance(spark):
    from nyc_taxi_pyspark_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, every node in 3) + pendant 4-5
    # + disjoint triangle {6,7,8} (each node in 1) + isolated edge 9-10.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (6, 7), (6, 8), (7, 8), (9, 10)],
        "u bigint, v bigint",
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}
    # sum of per-node counts = 3 x global triangle count (4 + 1 = 5)
    assert sum(got.values()) == 3 * 5
    # pendant/isolated nodes don't appear; layout does not change counts
    again = {
        r["node"]: r["triangles"]
        for r in triangle_counts(edges.repartition(7)).collect()
    }
    assert again == got


def test_triangle_counts_empty_and_triangle_free(spark):
    from nyc_taxi_pyspark_spark.operators.graph import triangle_counts

    empty = spark.createDataFrame([], "u bigint, v bigint")
    assert triangle_counts(empty).count() == 0
    # star graph: many wedges, zero triangles (orientation must not
    # fabricate closures)
    star = spark.createDataFrame(
        [(1, n) for n in range(2, 12)], "u bigint, v bigint"
    )
    assert triangle_counts(star).count() == 0


def _py_kcore_peel(edge_list, k, rounds):
    """Driver-side mirror of kcore_peel for property testing."""
    adj = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for _ in range(rounds):
        drop = {n for n, nb in adj.items() if len(nb) < k}
        if not drop:
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
        adj = {n: nb for n, nb in adj.items() if True}
    return {n: len(nb) for n, nb in adj.items() if nb}


def test_kcore_peel_known_graph_and_python_mirror(spark):
    from nyc_taxi_pyspark_spark.operators.graph import kcore_peel

    # K4 {1,2,3,4} + pendant 4-5 + path 6-7-8: the 3-core is exactly K4
    # (pendant and path peel away; peeling 5 drops 4's degree to 3, which
    # still survives k=3).
    el = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
          (4, 5), (6, 7), (7, 8)]
    edges = spark.createDataFrame(el, "u bigint, v bigint")
    got = {
        r["node"]: r["core_degree"]
        for r in kcore_peel(edges, k=3, rounds=4).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # bounded-round mirror equality on a seeded random graph, several k,
    # including rounds too small to reach the fixpoint (the contract is
    # the R-round peel, not the fixpoint)
    import random

    rng = random.Random(42)
    el = list({tuple(sorted(rng.sample(range(30), 2))) for _ in range(120)})
    edges = spark.createDataFrame(el, "u bigint, v bigint")
    for k in (2, 4, 6):
        for rounds in (1, 2, 4):
            want = _py_kcore_peel(el, k, rounds)
            got = {
                r["node"]: r["core_degree"]
                for r in kcore_peel(
                    edges.repartition(5), k=k, rounds=rounds
                ).collect()
            }
            assert got == want, (k, rounds)


def test_kcore_peel_empty_and_degenerate(spark):
    from nyc_taxi_pyspark_spark.operators.graph import kcore_peel

    empty = spark.createDataFrame([], "u bigint, v bigint")
    assert kcore_peel(empty, k=2, rounds=3).count() == 0
    # k above the max degree peels everything
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "u bigint, v bigint"
    )
    assert kcore_peel(tri, k=5, rounds=3).count() == 0
    # k=1 keeps every non-isolated node untouched
    got = {r["node"]: r["core_degree"]
           for r in kcore_peel(tri, k=1, rounds=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_mann_whitney_closed_form(spark, tmp_path):
    """Tiny arms with hand-computable ranks: click=[1,2,3], error=[4,5,6]
    gives U_click=0 (total separation) and rank-biserial -1; a fully
    interleaved tie case gives U = n1*n2/2 and z = 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from nyc_taxi_pyspark_spark.catalog.quality import stats_mann_whitney

    def mk(dirname, vals_a, vals_b):
        d = tmp_path / dirname
        d.mkdir()
        rows = [("click", v) for v in vals_a] + [("error", v) for v in vals_b]
        tbl = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([float(r[1]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, str(d / "events.parquet"))
        return str(d)

    r = stats_mann_whitney(spark, mk("sep", [1, 2, 3], [4, 5, 6])).first()
    assert (r["n_click"], r["n_error"]) == (3, 3)
    assert r["u_click"] == 0.0 and r["u_error"] == 9.0
    assert r["rank_biserial"] == -1.0 and r["z_stat"] < 0

    r = stats_mann_whitney(
        spark, mk("tied", [1, 1, 2, 2], [1, 1, 2, 2])
    ).first()
    assert r["u_click"] == r["u_error"] == 8.0
    assert r["z_stat"] == 0.0 and r["rank_biserial"] == 0.0


def test_part_skyline_matches_bruteforce(spark, tmp_path):
    """The bucketed two-tier skyline must equal the O(n²) dominance
    definition, including duplicated (price, size) points (ties — all
    survive) and points straddling the $100 cell boundary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nyc_taxi_pyspark_spark.catalog.quality import part_skyline

    # deterministic scatter incl. duplicates + cell-boundary prices
    pts = []
    seed = 1234567
    for i in range(300):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        price = (seed % 40000) / 100.0  # $0–$400, spans 4 cells
        size = 1 + (seed // 7) % 50
        pts.append((i, price, size))
    pts += [(300, 100.00, 30), (301, 100.00, 30), (302, 99.99, 30),
            (303, 200.00, 50), (304, 200.00, 50)]
    tbl = pa.table(
        {
            "p_partkey": pa.array([i for i, _, _ in pts], pa.int64()),
            "p_name": pa.array([f"p{i}" for i, _, _ in pts]),
            "p_brand": pa.array(["b"] * len(pts)),
            "p_type": pa.array(["t"] * len(pts)),
            "p_size": pa.array([s for _, _, s in pts], pa.int32()),
            "p_retailprice": pa.array([p for _, p, _ in pts], pa.float64()),
        }
    )
    d = tmp_path / "sky"
    d.mkdir()
    pq.write_table(tbl, str(d / "part.parquet"))

    cents = [(i, round(p * 100), s) for i, p, s in pts]
    frontier = [
        (i, s, c)
        for i, c, s in cents
        if not any(
            (qc <= c and qs >= s and (qc < c or qs > s))
            for _, qc, qs in cents
        )
    ]
    expect = sorted(frontier, key=lambda r: (r[2], r[0]))
    got = [
        (r["p_partkey"], r["p_size"], r["price_cents"])
        for r in part_skyline(spark, str(d)).collect()
    ]
    assert got == expect
    # tie semantics: duplicated frontier points both survive iff either does
    keys = {k for k, _, _ in got}
    assert (300 in keys) == (301 in keys)


def _write_customers(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "c_custkey": pa.array(range(len(rows)), pa.int64()),
            "c_name": pa.array([f"c{i}" for i in range(len(rows))]),
            "c_nationkey": pa.array([n for n, _, _ in rows], pa.int32()),
            "c_acctbal": pa.array([b for _, b, _ in rows], pa.float64()),
            "c_mktsegment": pa.array([s for _, _, s in rows]),
        }
    )
    d = tmp_path / "priv"
    d.mkdir(exist_ok=True)
    pq.write_table(tbl, str(d / "customer.parquet"))
    return str(d)


def test_k_anonymity_histogram_and_negative_bands(spark, tmp_path):
    """A singleton class is at risk, a 6-member class is not, and negative
    balances band by floor (−500 → band −1, not 0)."""
    from nyc_taxi_pyspark_spark.catalog.quality import privacy_k_anonymity

    rows = [(1, 500.0, "A")] * 6  # class (1, band 0): size 6
    rows += [(2, 1500.0, "B")]    # class (2, band 1): singleton
    rows += [(2, -500.0, "B")]    # class (2, band -1): singleton (floor!)
    d = _write_customers(tmp_path, rows)
    out = {r["class_size"]: r for r in privacy_k_anonymity(spark, d).collect()}
    assert out[1]["n_classes"] == 2 and out[1]["at_risk"] == 1
    assert out[6]["n_classes"] == 1 and out[6]["at_risk"] == 0
    assert out[1]["n_rows"] == 2 and out[6]["n_rows"] == 6


def test_l_diversity_flags_homogeneous_class_first(spark, tmp_path):
    """A big single-segment class must rank ahead of a small diverse one:
    order is (l asc, class_n desc)."""
    from nyc_taxi_pyspark_spark.catalog.quality import privacy_l_diversity

    rows = [(1, 100.0, "A")] * 10          # l=1, n=10 — homogeneity leak
    rows += [(2, 100.0, "A"), (2, 200.0, "B"), (2, 300.0, "C")]  # l=3, n=3
    d = _write_customers(tmp_path, rows)
    out = privacy_l_diversity(spark, d).collect()
    assert (out[0]["c_nationkey"], out[0]["l"], out[0]["class_n"]) == (1, 1, 10)
    assert out[1]["l"] == 3


def test_link_prediction_closes_the_open_wedge(spark, tmp_path):
    """Path 1—2—3: the only predicted links are (1,3) and (3,1), each with
    one common neighbor; adjacent pairs never appear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nyc_taxi_pyspark_spark.catalog.quality import graph_link_prediction

    orders = [(10, 1), (10, 2), (20, 2), (20, 3)]
    tbl = pa.table(
        {
            "l_orderkey": pa.array([o for o, _ in orders], pa.int64()),
            "l_partkey": pa.array([p for _, p in orders], pa.int64()),
        }
    )
    d = tmp_path / "lp"
    d.mkdir()
    pq.write_table(tbl, str(d / "lineitem.parquet"))
    out = [
        (r["seed"], r["cand"], r["common_neighbors"])
        for r in graph_link_prediction(spark, str(d)).collect()
    ]
    assert out == [(1, 3, 1), (3, 1, 1)]


def _write_events_values(tmp_path, name, rows):
    """rows: (user_id, event_type, value) triples, timestamps synthetic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir(exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(range(len(rows)), pa.timestamp("us")),
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_type": pa.array([t for _, t, _ in rows]),
            "value": pa.array([v for _, _, v in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_anova_planted_groups_exact_f(spark, tmp_path):
    """Two groups {8,12} and {18,22}: SSB=100, SSW=16, F=(100/1)/(16/2)
    = 12.5 exactly (cents-exact moments, dyadic arithmetic)."""
    from nyc_taxi_pyspark_spark.catalog.quality import stats_anova_oneway

    rows = [(1, "a", 8.0), (1, "a", 12.0), (2, "b", 18.0), (2, "b", 22.0)]
    d = _write_events_values(tmp_path, "anova", rows)
    r = stats_anova_oneway(spark, d).first()
    assert (r["k_groups"], r["n_rows"]) == (2, 4)
    assert r["ss_between"] == 100.0 and r["ss_within"] == 16.0
    assert r["f_stat"] == 12.5


def test_anova_degenerate_single_group_null_f(spark, tmp_path):
    """One group (k=1): SS_between 0, F honestly NULL — no ANSI error."""
    from nyc_taxi_pyspark_spark.catalog.quality import stats_anova_oneway

    rows = [(1, "a", 8.0), (1, "a", 12.0)]
    d = _write_events_values(tmp_path, "anova1", rows)
    r = stats_anova_oneway(spark, d).first()
    assert r["k_groups"] == 1 and r["f_stat"] is None


def test_brand_modularity_perfect_partition(spark, tmp_path):
    """Two same-brand triangles with no cross edges: each term is
    3/6 − (6/12)² = 0.25, Q = 0.5 exactly (dyadic arithmetic)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nyc_taxi_pyspark_spark.catalog.quality import graph_brand_modularity

    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
            "l_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "p_name": pa.array([f"p{i}" for i in range(6)]),
            "p_brand": pa.array(["A", "A", "A", "B", "B", "B"]),
            "p_type": pa.array(["t"] * 6),
            "p_size": pa.array([1] * 6, pa.int32()),
            "p_retailprice": pa.array([1.0] * 6, pa.float64()),
        }
    )
    d = tmp_path / "mod"
    d.mkdir()
    pq.write_table(li, str(d / "lineitem.parquet"))
    pq.write_table(part, str(d / "part.parquet"))
    rows = graph_brand_modularity(spark, str(d)).collect()
    assert [(r["p_brand"], r["within_edges"], r["degree_sum"]) for r in rows] \
        == [("A", 3, 6), ("B", 3, 6)]
    for r in rows:
        assert r["term"] == 0.25
        assert r["q_total"] == 0.5


def test_neyman_allocation_exact_sum_and_variance_bias(spark, tmp_path):
    """Allocations sum to the budget exactly, and the high-variance
    stratum out-earns its proportional share; degenerate strata get 0."""
    from nyc_taxi_pyspark_spark.catalog.quality import (
        _NEYMAN_BUDGET,
        sample_neyman_allocation,
    )

    rows = []
    # stratum 'low': 100 rows, tight around 50 (stddev small)
    rows += [(1, "low", 50.0 + (i % 2) * 0.5) for i in range(100)]
    # stratum 'high': 100 rows, spread 0..99 (stddev large)
    rows += [(2, "high", float(i)) for i in range(100)]
    # degenerate singleton stratum
    rows += [(3, "one", 42.0)]
    d = _write_events_values(tmp_path, "neyman", rows)
    out = {r["event_type"]: r for r in sample_neyman_allocation(spark, d).collect()}
    assert sum(r["alloc"] for r in out.values()) == _NEYMAN_BUDGET
    assert out["one"]["alloc"] == 0 and out["one"]["stddev"] is None
    # equal N, far larger S → 'high' takes the lion's share
    assert out["high"]["alloc"] > 0.9 * _NEYMAN_BUDGET
    assert out["high"]["alloc"] + out["low"]["alloc"] == _NEYMAN_BUDGET


def test_gini_closed_forms(spark, tmp_path):
    """Equal revenues → Gini 0; one customer owns everything → (n−1)/n."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nyc_taxi_pyspark_spark.catalog.quality import orders_gini_concentration

    def write(name, prices_by_cust):
        d = tmp_path / name
        d.mkdir()
        ck = [c for c, _ in prices_by_cust]
        tp = [p for _, p in prices_by_cust]
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(len(ck)), pa.int64()),
                    "o_custkey": pa.array(ck, pa.int64()),
                    "o_totalprice": pa.array(tp, pa.float64()),
                }
            ),
            str(d / "orders.parquet"),
        )
        return str(d)

    eq = orders_gini_concentration(
        spark, write("g_eq", [(1, 10.0), (2, 10.0), (3, 10.0), (4, 10.0)])
    ).first()
    assert eq["gini"] == 0.0
    one = orders_gini_concentration(
        spark, write("g_one", [(1, 0.0), (2, 0.0), (3, 0.0), (4, 100.0)])
    ).first()
    assert one["gini"] == 0.75  # (n-1)/n, dyadic-exact


def test_ks_test_hand_computed(spark, tmp_path):
    """click={1,2}, error={2,3}: ECDF gap peaks at value 1 with
    |1·2 − 0·2|/4 = 0.5."""
    from nyc_taxi_pyspark_spark.catalog.quality import stats_ks_test

    rows = [(1, "click", 1.0), (1, "click", 2.0),
            (2, "error", 2.0), (2, "error", 3.0),
            (3, "view", 99.0)]  # other types ignored
    d = _write_events_values(tmp_path, "ks", rows)
    r = stats_ks_test(spark, d).first()
    assert (r["at_value"], r["d_numerator"], r["d_denominator"]) == (1.0, 2, 4)
    assert r["d_stat"] == 0.5


def test_rank_stats_dirty_values_match_oracle_and_clean_subset(spark, tmp_path):
    """Dirty-data contract for the rank/ECDF statistics (round-11 ADVICE):
    NULL/NaN/Inf measures are excluded SYMMETRICALLY in both engines, so on
    a table with dirty rows (a) Spark equals the DuckDB oracle and (b) both
    equal the same query on the clean subset — dirty rows have no effect."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nyc_taxi_pyspark_spark.catalog import ORACLES
    from nyc_taxi_pyspark_spark.catalog.quality import (
        stats_ks_test,
        stats_mann_whitney,
    )

    clean = [("click", 1.0), ("click", 2.5), ("click", 7.0),
             ("error", 2.5), ("error", 4.0), ("error", 9.0), ("error", 1.5)]
    dirty = [("click", None), ("error", float("nan")), ("click", float("inf")),
             ("error", float("-inf"))]

    def mk(dirname, rows):
        d = tmp_path / dirname
        d.mkdir()
        tbl = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(tbl, str(d / "events.parquet"))
        return str(d)

    dirty_dir, clean_dir = mk("dirty", clean + dirty), mk("clean", clean)

    for name, fn in (("stats_mann_whitney", stats_mann_whitney),
                     ("stats_ks_test", stats_ks_test)):
        got = fn(spark, dirty_dir).first().asDict()
        want_clean = fn(spark, clean_dir).first().asDict()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{dirty_dir}/events.parquet'"
        )
        oracle = con.execute(ORACLES[name]).fetchdf().iloc[0].to_dict()
        con.close()
        assert set(got) == set(oracle) == set(want_clean), name
        for k in got:
            assert got[k] == pytest.approx(oracle[k], rel=1e-12), (name, k)
            assert got[k] == pytest.approx(want_clean[k], rel=1e-12), (name, k)
