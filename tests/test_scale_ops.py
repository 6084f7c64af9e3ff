"""Scale-operator tests: bucketed joins (no shuffle), skew salting
(exact results), stateful streaming (state across micro-batches)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.functions.exact import dsum
from nyc_taxi_pyspark_spark.operators.skew import salted_aggregate, salted_join
from nyc_taxi_pyspark_spark.operators.storage import bucketed_join, write_bucketed
from nyc_taxi_pyspark_spark.plans.explain import shuffle_count
from nyc_taxi_pyspark_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    import shutil

    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write_bucketed(o, "t_orders_b", "o_orderkey", 4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_lineitem_b", "o_orderkey", 4
    )
    joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
    # co-located buckets: the join itself introduces no Exchange
    assert shuffle_count(joined) == 0
    plain = o.join(li, o.o_orderkey == li.l_orderkey)
    assert joined.count() == plain.count()


def test_salted_aggregate_exact(spark):
    ev = load_table(spark, SF, "events")
    plain = {
        (r.event_type, r.n, r.s)
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value", 2).alias("s"))
        .collect()
    }
    salted = salted_aggregate(
        ev,
        keys=["event_type"],
        measures={
            "pn": F.count("*"),
            "pc": F.sum(F.round(F.col("value") * 100).cast("bigint")),
        },
        finals={
            "n": F.sum("pn"),
            "s": (F.sum("pc").cast("double") / 100.0),
        },
        n_salt=8,
    )
    got = {(r.event_type, r.n, r.s) for r in salted.collect()}
    assert got == plain


def test_salted_join_equals_plain_join(spark):
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    plain = c.join(n, "c_nationkey").select("c_custkey", "n_name")
    salted = salted_join(c, n, "c_nationkey", n_salt=4).select("c_custkey", "n_name")
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_stateful_running_totals_across_batches(spark):
    from nyc_taxi_pyspark_spark.schemas import TESTDATA_SCHEMAS
    from nyc_taxi_pyspark_spark.streaming.stateful import running_totals_per_user

    ev = load_table(spark, SF, "events").limit(200).cache()
    d = tempfile.mkdtemp(prefix="stateful_")
    # two files → with maxFilesPerTrigger=1, two micro-batches → state must carry
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(f"{d}/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(f"{d}/a.parquet")

    stream = (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{d}/a.parquet")
    )
    q = (
        running_totals_per_user(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.lastProgress is None or q.recentProgress  # ran at least one batch
    finally:
        q.stop()
    # memory sink in update mode appends every emitted update; the LAST row
    # per user is the final state
    out = spark.sql(
        """
        SELECT user_id, n_events, sum_value_cents FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
            FROM stateful_out
        ) WHERE rn = 1
        """
    )
    want = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_cents"),
        )
    )
    got_rows = {tuple(r) for r in out.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows


def test_clustered_write_prunes_row_groups(spark):
    """Range-clustered layout: each file/row group covers a disjoint key
    slice, so a point predicate's min/max-qualified row groups are a small
    fraction of the total — the stats a 100 TB scan skips by."""
    import pyarrow.parquet as pq

    from nyc_taxi_pyspark_spark.operators.storage import write_clustered

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_by_date"
        write_clustered(orders, path, "o_orderdate", n_files=8)

        import glob

        files = sorted(glob.glob(f"{path}/*.parquet"))
        assert len(files) >= 4  # range repartition produced real spread

        ranges = []
        probe = None
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("o_orderdate")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                assert st.has_min_max  # sorted write must emit stats
                ranges.append((st.min, st.max))
                probe = probe or st.min
        # disjointness: row-group ranges may touch at file boundaries but
        # not properly overlap
        ranges.sort()
        overlaps = sum(
            1 for (a, b) in zip(ranges, ranges[1:]) if a[1] > b[0]
        )
        assert overlaps == 0
        # a point predicate qualifies at most 2 of the >=4 row groups
        hit = sum(1 for lo, hi in ranges if lo <= probe <= hi)
        assert hit <= 2

        # and the clustered copy is the same table
        clustered = spark.read.parquet(path)
        assert clustered.count() == orders.count()
        a = clustered.agg(dsum(F.col("o_totalprice")).alias("s")).collect()
        b = orders.agg(dsum(F.col("o_totalprice")).alias("s")).collect()
        assert a == b


def test_zorder_write_prunes_both_dimensions(spark):
    """Z-curve layout: a narrow range predicate on EITHER interleaved
    column qualifies only a minority of row groups — the property
    single-column range clustering cannot give the second column."""
    import glob

    import pyarrow.parquet as pq

    from nyc_taxi_pyspark_spark.operators.storage import write_zorder

    from nyc_taxi_pyspark_spark.operators.storage import write_clustered

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")

    def qualified_fraction(files, col, lo, hi):
        total = hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                assert st.has_min_max
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit / total

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/li_z"
        write_zorder(li, path, ["l_partkey", "l_suppkey"], n_files=16)
        files = sorted(glob.glob(f"{path}/*.parquet"))
        assert len(files) >= 8
        # single-column counterfactual: range-clustered on l_partkey only
        cpath = f"{d}/li_c"
        write_clustered(li, cpath, "l_partkey", n_files=16)
        cfiles = sorted(glob.glob(f"{cpath}/*.parquet"))

        # ~1/16 of each key domain. Thresholds are loose because
        # repartitionByRange boundary sampling varies run-to-run; the
        # comparative assertion (z-order prunes the SECOND dimension,
        # single-column clustering does not) is the load-bearing one.
        pmin, pmax = li.agg(F.min("l_partkey"), F.max("l_partkey")).head()
        smin, smax = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).head()
        pspan = (pmax - pmin) // 16 or 1
        sspan = (smax - smin) // 16 or 1
        z_part = qualified_fraction(files, "l_partkey", pmin, pmin + pspan)
        z_supp = qualified_fraction(files, "l_suppkey", smin, smin + sspan)
        c_supp = qualified_fraction(cfiles, "l_suppkey", smin, smin + sspan)
        assert z_part < 0.8 and z_supp < 0.8
        assert z_supp < c_supp  # the second dim actually gained pruning
        assert c_supp > 0.9  # ...which range clustering alone cannot give

        # the z-ordered copy is still the same table
        back = spark.read.parquet(path)
        assert back.count() == li.count()
        a = back.agg(dsum(F.col("l_extendedprice"), 2).alias("s")).collect()
        b = li.agg(dsum(F.col("l_extendedprice"), 2).alias("s")).collect()
        assert a == b


def test_partitioned_write_prunes_directories(spark):
    """Partition-key filter must appear as PartitionFilters (directory
    pruning) in the scan, and only the matching directory's files load."""
    from nyc_taxi_pyspark_spark.operators.storage import write_partitioned

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_part"
        write_partitioned(
            orders.withColumn("o_year", F.year("o_orderdate")), path, "o_year"
        )
        back = spark.read.parquet(path).filter(F.col("o_year") == 1995)
        plan = back._jdf.queryExecution().executedPlan().toString()
        # the year predicate must land in PartitionFilters (directory
        # pruning), not PushedFilters / post-scan Filter
        part_section = plan.split("PartitionFilters:", 1)
        assert len(part_section) == 2 and "1995" in part_section[1].split("]", 1)[0]
        n_direct = orders.filter(F.year("o_orderdate") == 1995).count()
        assert back.count() == n_direct > 0


def test_compact_files_reduces_file_count_losslessly(spark):
    from nyc_taxi_pyspark_spark.operators.storage import compact_files

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    with tempfile.TemporaryDirectory() as d:
        frag = f"{d}/frag"
        orders.repartition(64).write.parquet(frag)
        assert len(spark.read.parquet(frag).inputFiles()) >= 32
        n_files = compact_files(spark, frag, target_rows_per_file=1000)
        out = f"{frag}_compacted"
        back = spark.read.parquet(out)
        assert len(back.inputFiles()) == n_files <= 2
        assert back.count() == orders.count()
        a = back.agg(dsum(F.col("o_totalprice"), 2).alias("s")).collect()
        b = orders.agg(dsum(F.col("o_totalprice"), 2).alias("s")).collect()
        assert a == b


def test_content_fingerprint_invariance_and_sensitivity(spark):
    """The fingerprint must be invariant under repartitioning and row order
    (the transformations that must NOT change a dataset) and flip on any
    value change or row loss."""
    from nyc_taxi_pyspark_spark.operators.integrity import content_fingerprint

    rows = [(i, f"v{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id INT, v STRING")
    key = F.concat_ws("|", F.col("id"), F.col("v"))

    base = content_fingerprint(df, key).first()
    assert base.n_rows == 100

    repart = content_fingerprint(df.repartition(7), key).first()
    reordered = content_fingerprint(
        spark.createDataFrame(list(reversed(rows)), "id INT, v STRING"), key
    ).first()
    assert repart == base and reordered == base

    mutated = spark.createDataFrame(
        [(i, "CHANGED" if i == 42 else f"v{i}") for i in range(100)],
        "id INT, v STRING",
    )
    assert content_fingerprint(mutated, key).first().fingerprint != base.fingerprint

    dropped = content_fingerprint(df.filter("id <> 7"), key).first()
    assert dropped.fingerprint != base.fingerprint and dropped.n_rows == 99
