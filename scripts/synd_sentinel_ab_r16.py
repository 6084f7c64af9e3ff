import os, sys, time, statistics
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window
from pyspark.sql import functions as F
from nyc_taxi_pyspark_spark.session import get_spark
from nyc_taxi_pyspark_spark.catalog import QUERIES
from nyc_taxi_pyspark_spark.catalog.text import _SYNDICATION_CACHE, _SYNDICATION_N
from nyc_taxi_pyspark_spark.operators.iterative import cut_lineage

PR_SCALE = 10**12
SF = "/root/testdata/sf0.1"
spark = get_spark("synd-ab")
def mat(df): df.write.format("noop").mode("overwrite").save()
q = QUERIES["source_syndication_rank"]
mat(q(spark, SF))  # build layouts
g = _SYNDICATION_CACHE.get_or_build(spark, SF, lambda: None)
edges = g.filter(~F.col("is_node")).select("src", "dst", "w").coalesce(1)
nodes = g.filter(F.col("is_node")).select(F.col("src").alias("node")).coalesce(1)
n_nodes = _SYNDICATION_N.get_or_build(spark, SF, lambda: None)
print("n_nodes", n_nodes, flush=True)
damping_pct, iterations = 85, 5

def old_pr():
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    base = F.lit(((100 - damping_pct) * PR_SCALE) // 100 // n_nodes)
    ranks = nodes.select(F.col("node"), F.lit(PR_SCALE // n_nodes).alias("ru"))
    for _ in range(iterations):
        with_out = ranks.join(out_w, ranks["node"] == out_w["src"], "left").select(
            ranks["node"].alias("node"), "ru", "out_w")
        contrib = (with_out.filter(F.col("out_w").isNotNull())
            .join(edges, with_out["node"] == edges["src"])
            .select(F.col("dst").alias("node"), F.expr("(ru * w) div out_w").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("in_w")))
        dangling = with_out.agg(F.coalesce(
            F.sum(F.when(F.col("out_w").isNull(), F.col("ru"))), F.lit(0)).alias("__dang"))
        ranks = (nodes.join(contrib, "node", "left").join(F.broadcast(dangling))
            .select("node", (base + F.expr(
                f"({damping_pct} * (coalesce(in_w, 0) + (__dang div {n_nodes}))) div 100")).alias("ru")))
        ranks = cut_lineage(ranks, None)
    return ranks.select("node", F.col("ru").alias("rank_micro"),
        (F.col("ru").cast("double") / F.lit(float(PR_SCALE))).alias("rank"))

def sentinel_pr():
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    base = F.lit(((100 - damping_pct) * PR_SCALE) // 100 // n_nodes)
    ranks = nodes.select(F.col("node"), F.lit(PR_SCALE // n_nodes).alias("ru"))
    wall = Window.partitionBy()
    for _ in range(iterations):
        with_out = ranks.join(out_w, ranks["node"] == out_w["src"], "left").select(
            ranks["node"].alias("node"), "ru", "out_w")
        contrib_rows = (with_out.filter(F.col("out_w").isNotNull())
            .join(edges, with_out["node"] == edges["src"])
            .select(F.col("dst").alias("node"), F.expr("(ru * w) div out_w").alias("c")))
        dang_rows = with_out.filter(F.col("out_w").isNull()).select(
            F.lit(None).cast(nodes.schema["node"].dataType).alias("node"),
            F.col("ru").alias("c"))
        zero_rows = nodes.select("node", F.lit(0).cast("long").alias("c"))
        agged = (contrib_rows.unionAll(dang_rows).unionAll(zero_rows)
            .groupBy("node").agg(F.sum("c").alias("in_w")))
        ranks = (agged.withColumn("__dang", F.coalesce(
                F.max(F.when(F.col("node").isNull(), F.col("in_w"))).over(wall), F.lit(0)))
            .filter(F.col("node").isNotNull())
            .select("node", (base + F.expr(
                f"({damping_pct} * (in_w + (__dang div {n_nodes}))) div 100")).alias("ru")))
        ranks = cut_lineage(ranks, None)
    return ranks.select("node", F.col("ru").alias("rank_micro"),
        (F.col("ru").cast("double") / F.lit(float(PR_SCALE))).alias("rank"))

a = sorted((r["node"], r["rank_micro"]) for r in old_pr().collect())
b = sorted((r["node"], r["rank_micro"]) for r in sentinel_pr().collect())
print("match:", a == b, len(a), flush=True)

def t(fn):
    t0 = time.perf_counter()
    mat(fn().orderBy(F.desc("rank_micro"), "node"))
    return time.perf_counter() - t0
t(old_pr); t(sentinel_pr)
olds, news = [], []
for i in range(7):
    olds.append(t(old_pr)); news.append(t(sentinel_pr))
print("old      median", round(statistics.median(olds),3), sorted(round(x,3) for x in olds))
print("sentinel median", round(statistics.median(news),3), sorted(round(x,3) for x in news))
spark.stop()
