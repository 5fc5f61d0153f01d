"""Iterative graph analytics: fixed-point PageRank.

PageRank (Page et al. 1999) in EXACT integer fixed-point arithmetic:
ranks are scaled to ``scale`` (default 1e15) and every per-iteration op
is integer — contribution = r DIV outdeg, damping = (num * x) DIV den,
teleport a precomputed integer constant. Integer sums are
order-independent, so the result is bitwise identical across
partitionings, engines, and retries — unlike float PageRank, whose
per-vertex sums depend on shuffle arrival order. The cost is bounded
mass leakage from the floor divisions (< outdeg ulps of 1e-15 per
vertex per iteration), far below any ranking-relevant signal.

Spark-first shape (mirrors operators/components.py):
- one shuffle join per iteration (ranks ⋈ edges on src) + one groupBy
  dst — both keyed shuffles Catalyst plans with map-side partial sums;
- the rank frontier is localCheckpointed per iteration to truncate
  lineage (10 iterations would otherwise nest 10 shuffles deep in one
  plan);
- driver state is scalar-only (the dangling-mass total), the same
  bounded-collect contract the connected-components loop uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**15


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    damping: tuple[int, int] = (85, 100),
    scale: int = PR_SCALE,
    id_col: str = "id",
) -> DataFrame:
    """Ranks after ``n_iter`` power iterations; returns (id, r) with
    ``r`` the fixed-point rank (true rank ≈ r / scale).

    ``vertices`` must contain every edge endpoint; ``edges`` is the
    DIRECTED edge list (pass both directions for undirected graphs).
    Recurrence (all integer):

        teleport  = ((den - num) * (scale DIV n)) DIV den
        inflow(v) = Σ_{u→v} (r(u) DIV outdeg(u)) + dangling DIV n
        r'(v)     = teleport + (num * inflow(v)) DIV den
    """
    dnum, dden = damping
    n = vertices.count()
    if n == 0:
        return vertices.select(
            F.col(id_col).alias("id"), F.lit(0).cast("long").alias("r")
        )
    # the edge list is consumed every iteration — materialize it (and
    # the degree table) ONCE instead of re-running its upstream plan
    # n_iter times
    edges = edges.select("src", "dst").localCheckpoint()
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg")
    ).localCheckpoint()
    teleport = ((dden - dnum) * (scale // n)) // dden
    ids = vertices.select(F.col(id_col).alias("id")).localCheckpoint()
    # a dangling vertex is one with no out-edges: cheaper to detect by
    # comparing counts of two already-checkpointed tables than to
    # materialize the anti-join — the anti-join is only built when
    # dangling vertices actually exist (never, for undirected graphs)
    any_dangling = outdeg.count() != n
    dangling_ids = (
        ids.join(outdeg, ids.id == outdeg.src, "left_anti").localCheckpoint()
        if any_dangling
        else None
    )
    ranks = ids.select(
        "id", F.lit(scale // n).cast("long").alias("r")
    ).localCheckpoint()
    # Checkpoint cadence: materializing ranks EVERY round costs one
    # eager job per iteration (~half the loop's wall time at sf0.1 —
    # measured 7.4s -> 4.2s on the co-purchase graph); chaining a few
    # rounds lazily lets AQE pipeline them, while a bounded cadence
    # keeps plan depth (and Catalyst optimization time) flat for large
    # n_iter. With dangling vertices each round already runs an action
    # (the dangling-mass collect), so lineage must truncate every round
    # or the chain recomputes inside the collect.
    ckpt_every = 1 if any_dangling else 3
    for it in range(n_iter):
        if any_dangling:
            dangling = (
                ranks.join(dangling_ids.select("id"), "id", "left_semi")
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long"))
                .collect()[0][0]
            )
        else:
            dangling = 0
        share = dangling // n
        # per-VERTEX contribution first (vertex-sized join), then fan
        # out over edges: the vertex-sized side is what AQE broadcasts,
        # so the edge list is never shuffled inside the loop — only the
        # contribution stream's groupBy(dst) moves data, with map-side
        # partial sums collapsing it toward vertex cardinality
        rc = ranks.join(outdeg, ranks.id == outdeg.src).select(
            F.col("src"), F.expr("r DIV outdeg").alias("c")
        )
        inflow = (
            edges.join(rc, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        ranks = (
            ids.join(inflow, "id", "left")
            .withColumn(
                "r",
                F.expr(
                    f"CAST({teleport} + ({dnum} * (coalesce(inflow, 0)"
                    f" + {share})) DIV {dden} AS BIGINT)"
                ),
            )
            .select("id", "r")
        )
        if (it + 1) % ckpt_every == 0 or it == n_iter - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def bfs_distances(
    edges: DataFrame,
    source: DataFrame,
    n_rounds: int,
) -> DataFrame:
    """Unweighted shortest-path distances from ``source`` vertices via
    ``n_rounds`` of frontier relaxation — the BFS/SSSP building block
    (friend-of-friend radius, blast-radius analysis on the co-purchase
    graph). Returns (id, dist) for every vertex reached within
    ``n_rounds`` hops.

    Spark-first shape (same loop contract as pagerank/components):
    - per round, only the NEW frontier (vertices first reached last
      round) joins the edge list — relaxation work is proportional to
      the frontier's out-degree sum, not the reached set;
    - one shuffle join + one groupBy(min) per round, both map-side
      combinable; reached set localCheckpointed per round;
    - distances are exact integers — bitwise deterministic, so the
      oracle can unroll the identical min-relaxation recurrence.

    ``edges`` is the DIRECTED edge list (src, dst); pass both
    directions for undirected graphs. ``source`` must have column
    ``id`` (dist 0 seeds).
    """
    edges = edges.select("src", "dst").localCheckpoint()
    reached = source.select("id", F.lit(0).cast("long").alias("dist")).localCheckpoint()
    frontier = reached
    for _ in range(n_rounds):
        if not frontier.head(1):
            break
        cand = (
            edges.join(
                frontier.withColumnRenamed("id", "src"), "src"
            )
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
            .groupBy("id")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
        frontier = cand.join(
            reached.select("id"), "id", "left_anti"
        ).localCheckpoint()
        # reached is a union of ALREADY-checkpointed frontiers — its
        # lineage is one union node per round, so materializing it
        # again would only add a job per round
        reached = reached.unionAll(frontier)
    return reached
