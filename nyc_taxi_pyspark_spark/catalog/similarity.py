"""Similarity-search queries over ``embeddings`` (north-star extension).

Oracle twins are generated from the same deterministic hyperplane constants
as the Spark operators (md5-parity signs — no RNG), so Spark, DuckDB and the
Python generator agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.operators.similarity import (
    DIM,
    N_PLANES,
    ann_topk_lsh,
    cosine,
    cosine_topk,
    hyperplane_signs,
    l2_norm,
    lsh_bucket,
)
from nyc_taxi_pyspark_spark.sources.io import load_table, parallelize_scan


def _emb(spark, sf_dir):
    return parallelize_scan(load_table(spark, sf_dir, "embeddings"), spark)


_SIGNS = hyperplane_signs()

_DUCK_X = "CAST(e.embedding[i] AS DOUBLE)"


def _duck_acc(expr: str) -> str:
    """Integer micro-quantized sum — mirrors operators.similarity._dsum_terms."""
    return f"(CAST(SUM(CAST(FLOOR(({expr}) * 1e14) AS BIGINT)) AS DOUBLE) / 1e14)"


@query(
    "embed_norms",
    oracle=f"""
    SELECT e.vec_id,
           CAST(64 AS INTEGER) AS dim,
           SQRT({_duck_acc(f'{_DUCK_X} * {_DUCK_X}')}) AS l2_norm
    FROM embeddings e, generate_series(1, {DIM}) AS g(i)
    GROUP BY e.vec_id
    """,
)
def embed_norms(spark, sf_dir):
    """Vector norms — row-level array fold in decimal (order-independent)."""
    e = _emb(spark, sf_dir)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        l2_norm(F.col("embedding")).alias("l2_norm"),
    )


_COSINE_CTE = f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    sims AS (
        SELECT e.vec_id,
               {_duck_acc(f'{_DUCK_X} * CAST(q.qe[i] AS DOUBLE)')}
                 / (SQRT({_duck_acc(f'{_DUCK_X} * {_DUCK_X}')})
                    * SQRT({_duck_acc('CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)')}))
                 AS cosine_sim
        FROM embeddings e, q, generate_series(1, {DIM}) AS g(i)
        GROUP BY e.vec_id
    )
"""


@query(
    "embed_cosine_topk",
    oracle=_COSINE_CTE
    + """
    SELECT vec_id, cosine_sim FROM sims
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
)
def embed_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-k vs the vec_id=0 query vector: scan +
    TakeOrderedAndProject, no shuffle — the exact baseline."""
    e = _emb(spark, sf_dir)
    qvec = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )
    corpus = e.crossJoin(F.broadcast(qvec))
    sim = cosine(F.col("embedding"), F.col("query_vec")).alias("cosine_sim")
    return (
        corpus.select("vec_id", sim)
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(10)
    )


def _duck_bucket_cte() -> str:
    plane_sums = ", ".join(
        _duck_acc(f"{_DUCK_X} * ({_SIGNS[j]})[i]") + f" AS s{j}"
        for j in range(N_PLANES)
    )
    bits = " || ".join(
        f"CASE WHEN s{j} > 0 THEN '1' ELSE '0' END" for j in range(N_PLANES)
    )
    return f"""
    WITH proj AS (
        SELECT e.vec_id, {plane_sums}
        FROM embeddings e, generate_series(1, {DIM}) AS g(i)
        GROUP BY e.vec_id
    ),
    buckets AS (SELECT vec_id, {bits} AS bucket FROM proj)
    """


@query(
    "embed_lsh_buckets",
    oracle=_duck_bucket_cte()
    + """
    SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
    FROM buckets GROUP BY bucket
    """,
)
def embed_lsh_buckets(spark, sf_dir):
    """Hyperplane-LSH bucket histogram — the partitioning layout the ANN
    path prunes against. At scale `bucket` is a write-time partition column."""
    e = _emb(spark, sf_dir)
    b = e.select("vec_id", lsh_bucket(F.col("embedding")).alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


@query(
    "embed_ann_topk",
    oracle=_duck_bucket_cte()
    + f"""
    , q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0),
    sims AS (
        SELECT e.vec_id,
               {_duck_acc(f'{_DUCK_X} * CAST(q.qe[i] AS DOUBLE)')}
                 / (SQRT({_duck_acc(f'{_DUCK_X} * {_DUCK_X}')})
                    * SQRT({_duck_acc('CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)')}))
                 AS cosine_sim
        FROM embeddings e, q, generate_series(1, {DIM}) AS g(i)
        WHERE e.vec_id IN (SELECT b.vec_id FROM buckets b, qb WHERE b.bucket = qb.qbucket)
        GROUP BY e.vec_id
    )
    SELECT vec_id, cosine_sim FROM sims
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
)
def embed_ann_topk(spark, sf_dir):
    """ANN top-k: exact cosine restricted to the query's LSH bucket —
    scan prunes to ~1/2^8 of the corpus when bucket is a partition column."""
    e = _emb(spark, sf_dir)
    qrow = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec"),
        lsh_bucket(F.col("embedding")).alias("query_bucket"),
    )
    corpus = e.crossJoin(F.broadcast(qrow))
    return ann_topk_lsh(
        corpus,
        F.col("query_vec"),
        F.col("query_bucket"),
        k=10,
    )


@query(
    "embed_label_stats",
    oracle=f"""
    WITH norms AS (
        SELECT e.vec_id,
               SQRT({_duck_acc(f'{_DUCK_X} * {_DUCK_X}')}) AS nrm
        FROM embeddings e, generate_series(1, {DIM}) AS g(i)
        GROUP BY e.vec_id
    )
    SELECT em.label, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(n2.nrm * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
             / COUNT(*) AS avg_norm
    FROM embeddings em JOIN norms n2 ON em.vec_id = n2.vec_id
    GROUP BY em.label
    """,
)
def embed_label_stats(spark, sf_dir):
    """Per-label vector stats. Norms are irrational doubles, so averaging
    goes through micro-quantization (floor(x·1e9) → integer sum): casting an
    arbitrary double to decimal hits rounding-mode divergence between
    engines (Java HALF_UP on the shortest repr vs binary-nearest), while
    floor of the same double is bit-identical everywhere."""
    e = _emb(spark, sf_dir)
    nrm = l2_norm(F.col("embedding"))
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.floor(F.col("nrm") * 1e9)).cast("double")
                / 1e9
                / F.count("*")
            ).alias("avg_norm"),
        )
    )


@query(
    "embed_near_dup_pairs",
    oracle=_duck_bucket_cte()
    + f"""
    , cands AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           {_duck_acc('CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)')}
             / (SQRT({_duck_acc('CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE)')})
                * SQRT({_duck_acc('CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)')}))
             AS cosine_sim
    FROM cands c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b,
    generate_series(1, {DIM}) AS g(i)
    GROUP BY c.id_a, c.id_b
    HAVING cosine_sim >= 0.9
    """,
)
def embed_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate detection at corpus scale: LSH-bucket
    equi-join generates candidates (never a crossJoin), exact cosine ≥ 0.9
    verifies. This corpus has no planted embedding dups — the pipeline's
    correctness is exactly that it returns none without scanning n² pairs."""
    from nyc_taxi_pyspark_spark.operators.similarity import (
        bucket_join_candidates,
        cosine,
    )

    cands = bucket_join_candidates(_emb(spark, sf_dir))
    sim = cosine(F.col("vec_a"), F.col("vec_b")).alias("cosine_sim")
    return (
        cands.select("id_a", "id_b", sim)
        .filter(F.col("cosine_sim") >= 0.9)
    )


def _duck_hamming_leq1(a: str, b: str) -> str:
    terms = " + ".join(
        f"CASE WHEN {a}[{j+1}:{j+1}] <> {b}[{j+1}:{j+1}] THEN 1 ELSE 0 END"
        for j in range(N_PLANES)
    )
    return f"(({terms}) <= 1)"


@query(
    "embed_ann_multiprobe",
    oracle=_duck_bucket_cte()
    + f"""
    , q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0),
    probed AS (
        SELECT b.vec_id FROM buckets b, qb
        WHERE {_duck_hamming_leq1('b.bucket', 'qb.qbucket')}
    ),
    sims AS (
        SELECT e.vec_id,
               {_duck_acc(f'{_DUCK_X} * CAST(q.qe[i] AS DOUBLE)')}
                 / (SQRT({_duck_acc(f'{_DUCK_X} * {_DUCK_X}')})
                    * SQRT({_duck_acc('CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)')}))
                 AS cosine_sim
        FROM embeddings e, q, generate_series(1, {DIM}) AS g(i)
        WHERE e.vec_id IN (SELECT vec_id FROM probed)
        GROUP BY e.vec_id
    )
    SELECT vec_id, cosine_sim FROM sims
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
)
def embed_ann_multiprobe(spark, sf_dir):
    """Multi-probe ANN top-k: query bucket + Hamming-1 neighbors (9/256
    buckets) — the recall/cost dial between `embed_ann_topk` (1 bucket) and
    `embed_cosine_topk` (full scan)."""
    from nyc_taxi_pyspark_spark.operators.similarity import ann_topk_multiprobe

    e = _emb(spark, sf_dir)
    qrow = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec"),
        lsh_bucket(F.col("embedding")).alias("query_bucket"),
    )
    corpus = e.crossJoin(F.broadcast(qrow))
    return ann_topk_multiprobe(corpus, F.col("query_vec"), F.col("query_bucket"), k=10)
