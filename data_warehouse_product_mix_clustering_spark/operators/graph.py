"""Iterative graph analytics on DataFrames: PageRank.

Second member of the engine's iterative family (next to
``operators/dedup.py::connected_components``): power iteration expressed
as join + aggregate per step, no GraphX/GraphFrames dependency, no
driver-side adjacency. Reference anchor: none (the reference has no
graph surface; SURVEY §2.9 notes its GAT model is dead code) — this is
beyond-reference capability for co-occurrence/importance analytics over
warehouse-derived graphs (e.g. the basket co-purchase graph).

Scale shape per iteration: one shuffle to aggregate rank contributions
by destination (edges pre-grouped by source with out-degree attached so
the join is 1:1 per edge), dangling-node mass folded back uniformly (a
1-row aggregate, broadcast), and each iteration's vector materialized
with localCheckpoint — it is consumed twice (residual + next step) and
the cut keeps iteration k from being a k-deep plan. Convergence is
driver-checked on the L1 residual — a tiny 1-row aggregate per check,
not a collect of the rank vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 40,
) -> tuple[DataFrame, int, float]:
    """PageRank over a directed edge list → ((node, rank), iterations,
    final L1 residual). Ranks sum to 1 (dangling mass redistributed
    uniformly); duplicate edges count once.

    Iterates until the L1 residual drops below ``tol`` or ``max_iter``
    is hit — callers wanting a hard convergence guarantee check the
    returned residual. Deterministic up to double reassociation across
    partitions (≈1e-14 per sum): same edges ⇒ same ranks at any
    comparison tolerance ≥1e-12.
    """
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).distinct()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    outdeg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    # (src, dst, deg) — materialized once; every iteration reuses it
    adj = e.join(outdeg, "__s").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    it, resid = 0, float("inf")
    check_every = 5
    while it < max_iter and resid > tol:
        contrib = (
            adj.join(ranks, adj["__s"] == ranks["node"])
            .select("__d", (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("__d")
            .agg(F.sum("__c").alias("__in"))
        )
        # Dangling mass: 1 − Σ(linked contributions) is exactly the rank
        # sitting on nodes with no out-edges; spread it uniformly so the
        # vector keeps summing to 1. Carried as an IN-PLAN broadcast
        # scalar — no driver action per iteration.
        dangling = F.broadcast(
            contrib.agg(
                ((1.0 - F.coalesce(F.sum("__in"), F.lit(0.0))) / n).alias("__dg")
            )
        )
        new_ranks = (
            nodes.join(contrib, nodes["node"] == contrib["__d"], "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__dg"))
                ).alias("rank"),
            )
        )
        it += 1
        # Each iteration's vector is consumed twice (next step's
        # contributions reference it twice — the plan SIZE doubles per
        # un-cut level, so anything short of a per-iteration cut turns
        # analysis exponential; measured 14× slower with an every-8
        # cut). localCheckpoint each step keeps plan size constant; the
        # superseded vector's blocks are reclaimed by the ContextCleaner
        # as soon as Python drops the last reference on reassignment
        # below (refcount → py4j detach → JVM GC), so live storage stays
        # a handful of vectors rather than O(iterations) in practice.
        # LAZY since r19: between residual checks no action runs, so an
        # eager checkpoint was one driver job per iteration whose only
        # purpose was materialization; the every-check_every residual
        # action computes the ≤check_every-deep chain in ONE job,
        # materializing each link's blocks along the way (plan
        # truncation happens at wrap time either way, so analysis cost
        # stays constant; un-materialized links stay JVM-reachable from
        # their successor RDDs, so cleanup cannot outrun the chain).
        new_ranks = new_ranks.localCheckpoint(eager=False)
        if it % check_every == 0 or it == max_iter:
            resid = (
                new_ranks.join(
                    ranks.select("node", F.col("rank").alias("__old")), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
                .first()[0]
            )
        ranks = new_ranks
    return ranks.select("node", "rank"), it, float(resid)


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count + global clustering coefficient of an
    undirected graph, via DEGREE-ORIENTED wedge closure (compact-forward)
    — the third iterative/graph family member next to connected
    components and PageRank.

    The naive 3-way edge self-join on ``a < b < c`` explodes on hubs (a
    degree-d vertex contributes d² wedge rows). Orienting every edge
    from its lower to its higher endpoint under the total order
    (degree asc, id asc) caps each vertex's out-degree at O(√|E|), so
    the wedge join is bounded regardless of skew — the standard
    distributed-triangle result, and the whole plan is three hash joins
    + aggregations (no iteration, no driver loop).

    Returns ONE row: (n_nodes, n_edges, n_triangles, n_wedges,
    global_clustering) where ``global_clustering`` = 3·T / wedges
    (wedges = Σ_v C(deg v, 2), 0-safe) rounded to 6dp. Input edges may
    carry duplicates or self-loops; both are dropped first.
    """
    e = (
        edges.select(F.col(src).alias("__a"), F.col(dst).alias("__b"))
        .filter(F.col("__a") != F.col("__b"))
        .select(
            F.least("__a", "__b").alias("__u"), F.greatest("__a", "__b").alias("__v")
        )
        .distinct()
        .localCheckpoint(eager=True)  # degrees + orientation + closure all read it
    )
    deg = (
        e.select(F.col("__u").alias("__n"))
        .unionByName(e.select(F.col("__v").alias("__n")))
        .groupBy("__n")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    du = deg.select(F.col("__n").alias("__u"), F.col("__d").alias("__du"))
    dv = deg.select(F.col("__n").alias("__v"), F.col("__d").alias("__dv"))
    # orient low → high under (degree, id); ties broken by id so the
    # order is total and every edge gets exactly one direction
    lower_first = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (F.col("__u") < F.col("__v"))
    )
    oriented = (
        e.join(du, "__u")
        .join(dv, "__v")
        .select(
            F.when(lower_first, F.col("__u")).otherwise(F.col("__v")).alias("__s"),
            F.when(lower_first, F.col("__v")).otherwise(F.col("__u")).alias("__t"),
            F.when(lower_first, F.col("__dv")).otherwise(F.col("__du")).alias("__dt"),
        )
    )
    o1 = oriented.select(F.col("__s"), F.col("__t").alias("__x"), F.col("__dt").alias("__dx"))
    o2 = oriented.select(F.col("__s"), F.col("__t").alias("__y"), F.col("__dt").alias("__dy"))
    # wedges out of the LOW vertex, ordered so each unordered pair forms
    # once; (x, y) ordered by the same (degree, id) total order
    wedge = o1.join(o2, "__s").filter(
        (F.col("__dx") < F.col("__dy"))
        | ((F.col("__dx") == F.col("__dy")) & (F.col("__x") < F.col("__y")))
    )
    closing = oriented.select(
        F.col("__s").alias("__x"), F.col("__t").alias("__y")
    )
    tri = wedge.join(closing, ["__x", "__y"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    counts = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).crossJoin(
        deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.coalesce(F.sum(F.expr("__d * (__d - 1) / 2")), F.lit(0.0))
            .cast("long")
            .alias("n_wedges"),
        )
    )
    return counts.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(0.0))
            + 1e-9,
            6,
        ).alias("global_clustering"),
    )
