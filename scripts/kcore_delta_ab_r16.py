import os, sys, time, statistics
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nyc_taxi_pyspark_spark.session import get_spark
from nyc_taxi_pyspark_spark.catalog.quality import _COPURCHASE_CACHE, _KCORE_DEG_CACHE, _KCORE_K
from nyc_taxi_pyspark_spark.catalog import QUERIES

SF = "/root/testdata/sf0.1"
spark = get_spark("kcore-ab4")
def mat(df): df.write.format("noop").mode("overwrite").save()
q = QUERIES["graph_kcore_membership"]
mat(q(spark, SF))
edges = _COPURCHASE_CACHE.get_or_build(spark, SF, lambda: None)
deg = _KCORE_DEG_CACHE.get_or_build(spark, SF, lambda: None)
k = _KCORE_K.get_or_build(spark, SF, lambda: None)
sym = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
    edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))

def old_peel(rounds, eager=True):
    def restricted_deg(alive):
        live = sym
        if alive is not None:
            hint = F.broadcast(alive)
            live = live.join(hint, "node", "left_semi").join(
                hint.select(F.col("node").alias("nbr")), "nbr", "left_semi")
        return live.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    alive = None
    for i in range(rounds):
        d = deg if i == 0 else restricted_deg(alive)
        alive = d.filter(F.col("deg") >= k).select("node")
        alive = alive.localCheckpoint(eager=eager)
    return restricted_deg(alive).select("node", F.col("deg").cast("bigint").alias("core_degree"))

def fold_peel(rounds, eager=True):
    d = deg
    for i in range(rounds):
        removed_nbr = d.filter(F.col("deg") < k).select(F.col("node").alias("nbr"))
        neg = (sym.join(F.broadcast(removed_nbr), "nbr", "left_semi")
               .select("node", F.lit(-1).cast("long").alias("c"), F.lit(0).alias("b")))
        base = d.filter(F.col("deg") >= k).select(
            "node", F.col("deg").cast("long").alias("c"), F.lit(1).alias("b"))
        d = (base.unionAll(neg).groupBy("node")
             .agg(F.sum("c").alias("deg"), F.max("b").alias("bb"))
             .filter(F.col("bb") == 1).select("node", "deg"))
        d = d.localCheckpoint(eager=eager)
    return d.filter(F.col("deg") >= 1).select("node", F.col("deg").cast("bigint").alias("core_degree"))

def tail(fn):
    t0 = time.perf_counter()
    df = fn().orderBy(F.desc("core_degree"), "node").limit(50)
    mat(df)
    return time.perf_counter() - t0

want = {(r["node"], r["core_degree"]) for r in old_peel(4).collect()}
for name, fn in [("old-lazy", lambda: old_peel(4, eager=False)),
                 ("fold-lazy", lambda: fold_peel(4, eager=False))]:
    got = {(r["node"], r["core_degree"]) for r in fn().collect()}
    print(name, "match:", got == want, flush=True)

variants = {
    "old-eager ": lambda: old_peel(4, True),
    "old-lazy  ": lambda: old_peel(4, False),
    "fold-eager": lambda: fold_peel(4, True),
    "fold-lazy ": lambda: fold_peel(4, False),
}
for fn in variants.values(): tail(fn)  # warmup
res = {n: [] for n in variants}
for i in range(6):
    for n, fn in variants.items():
        res[n].append(tail(fn))
for n, xs in res.items():
    print(n, round(statistics.median(xs),3), sorted(round(x,3) for x in xs), flush=True)
spark.stop()
