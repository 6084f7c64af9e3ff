"""Graph analytics over DataFrame edge lists.

Complements the dedup family's connected components (operators/text.py)
with weighted PageRank — the domain-centrality signal crawl-curation
pipelines (CommonCrawl-derived corpora) use to rank sources before
sampling. Everything is expressed as joins + keyed aggregates, so each
iteration is O(edges) shuffle work at any scale; the only driver-side
value is the node count (one aggregate, same parameter discipline as the
catalog's inlined corpus sizes).

Determinism: ranks are kept in integer micro-units (SCALE = 1e12) and
every update uses integer division (truncating on non-negative values,
identical in Spark's ``div`` and DuckDB's ``//``), so K iterations
produce bit-identical ranks on any engine and any partitioning — the
same discipline as functions/exact.py, applied to an iterative
algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.operators.iterative import cut_lineage

PR_SCALE = 10**12


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame,
    n_nodes: int,
    iterations: int = 5,
    damping_pct: int = 85,
    checkpoint: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted PageRank in exact integer micro-units.

    ``edges``: (src, dst, w) directed weighted edges (symmetrize upstream
    for an undirected graph). ``nodes``: (node) — every rankable node,
    including isolated ones. ``n_nodes`` must equal nodes' row count
    (inlined as a literal so the per-iteration arithmetic stays
    integer-exact).

    Update rule per iteration, all in int64 micro-units::

        contrib(u→v) = (rank_u * w_uv) div out_w_u
        dangling     = Σ rank_u over nodes with no out-edges
        rank'_v      = ((100-d)*SCALE div 100) div n
                       + (d * (Σ contrib(·→v) + dangling div n)) div 100

    Truncating integer division loses at most n·K micro-units of mass —
    deterministic, mirrored in the oracle twin. Returns (node, rank_micro,
    rank) with rank = rank_micro / SCALE as double.

    ``checkpoint`` (default on) cuts the rank frame's lineage after each
    iteration — the standard iterative-DataFrame discipline: without a
    lineage cut, every iteration doubles plan references back through the
    edge pipeline and Catalyst analysis time explodes (measured 48 s → ~2 s
    on a 20-node graph). Pass False only for plan-inspection of a single
    symbolic iteration. ``checkpoint_dir`` selects the cut strategy
    (operators/iterative.py): None → localCheckpoint (executor-pinned,
    lost on executor failure — local-mode default); a durable URI →
    reliable ``checkpoint``, the 1000-executor mode where one executor
    loss costs a reread instead of the whole run.
    """
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    base = F.lit(((100 - damping_pct) * PR_SCALE) // 100 // n_nodes)
    ranks = nodes.select(
        F.col("node"), F.lit(PR_SCALE // n_nodes).alias("ru")
    )
    for _ in range(iterations):
        with_out = ranks.join(
            out_w, ranks["node"] == out_w["src"], "left"
        ).select(ranks["node"].alias("node"), "ru", "out_w")
        contrib = (
            with_out.filter(F.col("out_w").isNotNull())
            .join(edges, with_out["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(ru * w) div out_w").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_w"))
        )
        dangling = with_out.agg(
            F.coalesce(
                F.sum(F.when(F.col("out_w").isNull(), F.col("ru"))),
                F.lit(0),
            ).alias("__dang")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(dangling))
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"({damping_pct} * (coalesce(in_w, 0)"
                        f" + (__dang div {n_nodes}))) div 100"
                    )
                ).alias("ru"),
            )
        )
        if checkpoint:
            ranks = cut_lineage(ranks, checkpoint_dir)
    return ranks.select(
        "node",
        F.col("ru").alias("rank_micro"),
        (F.col("ru").cast("double") / F.lit(float(PR_SCALE))).alias("rank"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts via the degree-ordered node-iterator.

    ``edges``: undirected simple edges as (u, v) with u < v and no
    duplicates (dedup upstream — the builder owns the graph layout).

    The classic MapReduce/Spark triangle algorithm (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11):

    1. degree per node (one keyed aggregate over both endpoints);
    2. orient every edge from the (degree, id)-smaller endpoint to the
       larger — a total order, so each triangle {a<b<c} survives as
       exactly one oriented wedge a→b→c closed by a→c;
    3. wedge join (oriented ⋈ oriented on mid-node) + closing equi-join.

    Orientation is what makes this scale: out-degrees under the
    (degree, id) order are bounded by O(√m), so the wedge join emits
    O(m^1.5) rows worst-case instead of Σdeg² — a hub node with a
    million neighbors contributes NOTHING as a wedge midpoint unless the
    spokes themselves are high-degree. All joins are equi-joins
    (shuffle- or broadcast-able); no driver-side state at all.

    Returns (node, triangles) — one row per node that participates in at
    least one triangle; each triangle contributes 1 to all three corners,
    so Σ triangles = 3 × the global triangle count.
    """
    both = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = both.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # each triangle credits all three corners: ONE explode over the joined
    # frame, not a 3-way union of projections — the union form references
    # the tri subtree three times, which triples the printed/analyzed plan
    # (edges appears 5x under oriented, so 3 x 3 x 5 = 45 subtree copies;
    # measured 184 statically-planned exchanges vs 64 with the explode).
    # Runtime work was always deduplicated by exchange reuse; the explode
    # keeps Catalyst analysis O(plan) as the operator composes.
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("triangles")
    )


def oracle_pagerank_cte(
    edges_cte: str,
    nodes_cte: str,
    n_nodes_expr: str,
    iterations: int = 5,
    damping_pct: int = 85,
) -> str:
    """DuckDB CTE chain mirroring :func:`pagerank_int` op-for-op.

    ``edges_cte``/``nodes_cte`` are CTE NAMES already defined upstream with
    columns (src, dst, w) and (node); ``n_nodes_expr`` is an SQL literal.
    Emits CTEs ``outw, r0, c1, r1, ..., r{K}`` — select from ``r{K}``.
    """
    d = damping_pct
    base = f"(({100 - d} * {PR_SCALE}) // 100) // {n_nodes_expr}"
    parts = [
        f"outw AS (SELECT src, SUM(w) AS out_w FROM {edges_cte} GROUP BY src)",
        f"r0 AS (SELECT node, CAST({PR_SCALE} // {n_nodes_expr} AS BIGINT)"
        f" AS ru FROM {nodes_cte})",
    ]
    for t in range(1, iterations + 1):
        prev = f"r{t - 1}"
        parts.append(
            f"""c{t} AS (
        SELECT e.dst AS node, SUM((r.ru * e.w) // o.out_w) AS in_w
        FROM {edges_cte} e
        JOIN {prev} r ON r.node = e.src
        JOIN outw o ON o.src = e.src
        GROUP BY e.dst
    )"""
        )
        parts.append(
            f"""d{t} AS (
        SELECT COALESCE(SUM(ru), 0) AS dang FROM {prev}
        WHERE node NOT IN (SELECT src FROM outw)
    )"""
        )
        parts.append(
            f"""r{t} AS (
        SELECT n.node,
               CAST({base}
                    + ({d} * (COALESCE(c.in_w, 0)
                              + ((SELECT dang FROM d{t}) // {n_nodes_expr})))
                      // 100 AS BIGINT) AS ru
        FROM {nodes_cte} n LEFT JOIN c{t} c ON c.node = n.node
    )"""
        )
    return ",\n    ".join(parts)


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    checkpoint: bool = True,
    checkpoint_dir: str | None = None,
    broadcast_keep: bool = True,
    first_round_deg: DataFrame | None = None,
) -> DataFrame:
    """Bounded-round k-core peel: iteratively delete nodes of degree < k.

    ``edges``: undirected simple edges as (u, v), u < v, deduplicated.
    After ``rounds`` peels, returns (node, core_degree) for the surviving
    subgraph — the standard density filter for community mining and
    spam/bot-ring triage (the k-core contains every k+1-clique and every
    community with minimum internal degree k).

    Bounding the round count is the deliberate semantics choice: the exact
    k-core is the fixpoint, but fixpoint iteration count is data-dependent
    (worst case the graph's degeneracy ordering length), which a
    declarative oracle cannot mirror. A fixed R-round peel is identical on
    both engines and converges in practice within a few rounds on bounded-
    degree graphs.

    Shuffle-and-state discipline — the key design point: the filtered
    edge set is NEVER materialized. Iterative state is the alive NODE
    set, always no larger than the node catalog (orders of magnitude
    below the edge count on any co-occurrence graph). Each round
    recomputes restricted degrees with one map-side pass over the
    original symmetric edge view — two broadcast semi-joins against the
    alive set — plus one map-side-combined degree aggregate whose output
    is again node-catalog-sized; the per-round lineage cut checkpoints
    only that tiny node frame (without it, round t's broadcast build
    would recursively nest rounds 1..t-1's builds — measured exponential
    blowup). Callers should persist ``edges``: it is scanned R+1 times.
    If the node catalog ever outgrows broadcast range,
    ``broadcast_keep=False`` falls back to shuffled semi-joins.
    ``checkpoint_dir`` follows :func:`pagerank_int`'s durability
    discipline (localCheckpoint locally, durable URI at cluster scale).
    ``first_round_deg`` lets a caller that already computed the FULL
    degree frame (e.g. to derive an adaptive k from it) hand it in so
    round 1 reuses it instead of re-scanning the edge view.
    """
    sym = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionAll(edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))

    def restricted_deg(alive) -> DataFrame:
        live = sym
        if alive is not None:
            hint = F.broadcast(alive) if broadcast_keep else alive
            live = live.join(hint, "node", "left_semi").join(
                hint.select(F.col("node").alias("nbr")), "nbr", "left_semi"
            )
        return live.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    alive = None  # round 1 sees the whole graph: skip the semi-joins
    for i in range(rounds):
        deg = (
            first_round_deg
            if i == 0 and first_round_deg is not None
            else restricted_deg(alive)
        )
        alive = deg.filter(F.col("deg") >= k).select("node")
        if checkpoint:
            alive = cut_lineage(alive, checkpoint_dir)
    return restricted_deg(alive).select(
        "node", F.col("deg").cast("bigint").alias("core_degree")
    )


def oracle_kcore_cte(edges_cte: str, k_expr: str, rounds: int) -> str:
    """DuckDB CTE chain mirroring :func:`kcore_peel` round-for-round.

    ``edges_cte`` is a CTE name with columns (u, v); ``k_expr`` an SQL
    scalar expression. Emits ``sym0 .. sym{R}`` — select the final degree
    count from ``sym{R}``.
    """
    parts = [
        f"""sym0 AS (
        SELECT u AS node, v AS nbr FROM {edges_cte}
        UNION ALL SELECT v, u FROM {edges_cte}
    )"""
    ]
    for t in range(1, rounds + 1):
        prev = f"sym{t - 1}"
        parts.append(
            f"""keep{t} AS (
        SELECT node FROM (
            SELECT node, COUNT(*) AS deg FROM {prev} GROUP BY node
        ) WHERE deg >= ({k_expr})
    )"""
        )
        parts.append(
            f"""sym{t} AS (
        SELECT s.node, s.nbr FROM {prev} s
        WHERE s.node IN (SELECT node FROM keep{t})
          AND s.nbr IN (SELECT node FROM keep{t})
    )"""
        )
    return ",\n    ".join(parts)
