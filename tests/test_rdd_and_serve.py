"""RDD compatibility demo (cross-API consistency, the reference's own
practice at spark_jobs/01_ingest.py:40-47 vs 74-80) + serve surfaces."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.operators.rdd_demo import (
    native_count_by_key,
    native_filter_count,
    native_sum_max,
    rdd_count_by_key,
    rdd_extend_schema,
    rdd_filter_count,
    rdd_sum_max,
)
from nyc_taxi_pyspark_spark.serve.reports import export_reports, list_reports
from nyc_taxi_pyspark_spark.sources.io import load_table, read_csv, write_csv_single

SF = "/root/testdata/sf0.001"


def test_rdd_vs_native_consistency(spark):
    df = load_table(spark, SF, "orders").select("o_totalprice", "o_orderpriority")
    assert rdd_filter_count(df, "o_totalprice", 200000.0) == native_filter_count(
        df, "o_totalprice", 200000.0
    )
    rs, rm = rdd_sum_max(df, "o_totalprice")
    ns, nm = native_sum_max(df, "o_totalprice")
    assert math.isclose(rs, ns, rel_tol=1e-9) and rm == nm
    assert rdd_count_by_key(df, "o_orderpriority") == native_count_by_key(
        df, "o_orderpriority"
    )


def test_rdd_extend_schema_matches_withcolumn(spark):
    df = load_table(spark, SF, "nation")
    ext = rdd_extend_schema(df, "key_is_even", lambda r: int(r.n_nationkey % 2 == 0))
    native = df.withColumn("key_is_even", (F.col("n_nationkey") % 2 == 0).cast("int"))
    assert {tuple(r) for r in ext.collect()} == {tuple(r) for r in native.collect()}


def test_report_export_roundtrip(spark):
    kpi = (
        load_table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    with tempfile.TemporaryDirectory() as d:
        paths = export_reports({"orders_by_priority": kpi}, d)
        assert list_reports(d) == ["orders_by_priority"]
        back = read_csv(spark, paths["orders_by_priority"], infer=True)
        assert back.count() == kpi.count()
        got = {(r.o_orderpriority, r.n) for r in back.collect()}
        want = {(r.o_orderpriority, r.n) for r in kpi.collect()}
        assert got == want


def test_csv_sink_single_file(spark):
    df = load_table(spark, SF, "region")
    with tempfile.TemporaryDirectory() as d:
        write_csv_single(df, f"{d}/out", limit=3)
        import glob

        parts = glob.glob(f"{d}/out/part-*.csv")
        assert len(parts) == 1  # coalesce(1) single-file contract
        assert read_csv(spark, f"{d}/out", infer=True).count() == 3


def test_scoring_surface(spark, trips):
    from nyc_taxi_pyspark_spark.ml.pipelines import (
        FeatureConfig,
        classification_lr,
        train_test_split,
    )
    from nyc_taxi_pyspark_spark.operators.taxi import clean_trips, engineer_features
    from nyc_taxi_pyspark_spark.serve.scoring import load_model, sample_for_scoring, score_batch

    feat = engineer_features(clean_trips(trips)).na.fill({"payment_type": 5})
    cfg = FeatureConfig(
        numeric_cols=["trip_distance", "pickup_hour"], categorical_cols=["payment_type"]
    )
    train, test = train_test_split(feat, "label_tip")
    model = classification_lr(cfg, "label_tip").fit(train)
    with tempfile.TemporaryDirectory() as d:
        model.write().overwrite().save(d)
        loaded = load_model(d)
        scored = score_batch(loaded, test, threshold=0.6, sample_n=50)
        rows = scored.select("proba1", "pred_at_threshold").collect()
        assert 0 < len(rows) <= 50
        assert all(0.0 <= r.proba1 <= 1.0 for r in rows)
    # the sampling idiom is deterministic under a fixed seed & partitioning
    s1 = {r.VendorID for r in sample_for_scoring(trips.select("VendorID"), 20).collect()}
    s2 = {r.VendorID for r in sample_for_scoring(trips.select("VendorID"), 20).collect()}
    assert s1 == s2


def test_sampling_paths_scale_and_compat(spark, trips):
    from nyc_taxi_pyspark_spark.plans.explain import formatted_plan
    from nyc_taxi_pyspark_spark.serve.scoring import (
        sample_for_scoring,
        sample_for_scoring_compat,
    )

    src = trips.select("VendorID", "trip_distance")
    n_src = src.count()

    # default path: no global Sort anywhere in the plan (the compat idiom's
    # orderBy(rand) global sort is the 100 TB scale-killer)
    s = sample_for_scoring(src, 20, population=n_src)
    plan = formatted_plan(s)
    assert "Sort" not in plan
    rows = s.collect()
    assert 0 < len(rows) <= 20
    # deterministic for fixed seed + input
    again = sample_for_scoring(src, 20, population=n_src).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    # n >= population degenerates to the full table
    assert sample_for_scoring(src, n_src + 10, population=n_src).count() == n_src

    # compat path: exact n, deterministic, reference idiom
    c1 = sample_for_scoring_compat(src, 20)
    assert c1.count() == 20
    c2 = sample_for_scoring_compat(src, 20)
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))


def test_udtf_matches_native_posexplode(spark):
    from nyc_taxi_pyspark_spark.functions.udfs import make_tokenize_udtf

    spark.udtf.register("tok_t", make_tokenize_udtf())
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, "x"), (3, None)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("tok_docs")
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT d.doc_id, t.token, t.idx FROM tok_docs d, "
            "LATERAL tok_t(d.text) t"
        ).collect()
    }
    native = {
        tuple(r)
        for r in df.select(
            "doc_id", F.posexplode(F.split("text", r"\s+")).alias("idx", "token")
        )
        .select("doc_id", "token", "idx")
        .collect()
    }
    assert got == native and (1, "c", 2) in got  # \s+ consumes the run


def test_engine_parameterized_sql(spark):
    from nyc_taxi_pyspark_spark.serve.engine import Engine

    eng = Engine(spark, "/root/testdata/sf0.001")
    df = eng.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority = :prio"
        "  AND o_totalprice > :floor",
        params={"prio": "1-URGENT", "floor": 1000.0},
    )
    n = df.collect()[0].n
    want = eng.sql(
        "SELECT COUNT(*) AS n FROM orders"
        " WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 1000.0"
    ).collect()[0].n
    assert n == want > 0
    # the binding is a VALUE, not spliced text: a quote in the parameter
    # cannot terminate the literal / inject SQL
    assert (
        eng.sql(
            "SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority = :prio",
            params={"prio": "x' OR '1'='1"},
        ).collect()[0].n
        == 0
    )
