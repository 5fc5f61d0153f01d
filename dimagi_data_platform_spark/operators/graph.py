"""Iterative graph analytics: fixed-point PageRank + BFS distances.

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
- ONE shuffle per iteration — the contribution stream's groupBy(dst),
  with map-side partial sums collapsing it toward vertex cardinality.
  The vertex-sized rank frontier is broadcast into the edge join when
  the vertex count (known exactly, it was just counted) is under
  ``broadcast_max_vertices``; above that the join falls back to a
  keyed shuffle — at that scale, persist the edge list bucketed by
  src so the edge side's exchange disappears.
- every loop truncates lineage via the shared operators/loop.py
  contract: localCheckpoint by default, ``reliable=True`` for
  cluster-durable ``checkpoint()`` blocks that survive executor loss
  (a multi-hour 100 TB PageRank should not restart from round zero);
- the rank frontier is checkpointed on a bounded cadence to
  truncate lineage (10 iterations would otherwise nest 10 shuffles
  deep in one plan);
- ``materialize_edges`` controls whether the edge list is
  localCheckpointed: pass False when edges already come from a
  persisted columnar source (parquet artifact) — a checkpoint copies
  them into ROW-format blocks whose per-iteration rescan costs ~3x a
  columnar parquet scan (measured at sf0.1: 1.5s vs 0.5s per pass);
- driver state is scalar-only (the dangling-mass total), the same
  bounded-collect contract the connected-components loop uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dimagi_data_platform_spark.operators.loop import loop_checkpoint

PR_SCALE = 10**15

# Above this vertex count the rank frontier is no longer broadcast
# into the per-iteration edge join (~16 bytes/row -> ~64 MB at 4M).
BROADCAST_MAX_VERTICES = 4_000_000


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    damping: tuple[int, int] = (85, 100),
    scale: int = PR_SCALE,
    id_col: str = "id",
    materialize_edges: bool = True,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
    reliable: bool = False,
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
    ck = lambda df: loop_checkpoint(df, reliable)  # noqa: E731
    edges = edges.select("src", "dst")
    if materialize_edges:
        # the edge list is consumed every iteration — materialize it
        # once when its upstream plan is expensive (joins/explodes);
        # skip when it is already a cheap columnar scan
        edges = ck(edges)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # ONE upfront checkpoint job: the per-vertex base table carries
    # outdeg so the loop never re-joins ranks ⋈ outdeg, and counting
    # the checkpointed blocks is free vs re-running the (distinct-
    # shaped) vertices plan a second time
    base = (
        vertices.select(F.col(id_col).alias("id"))
        .join(outdeg, F.col("id") == F.col("src"), "left")
        .select("id", "outdeg")
        .transform(ck)
    )
    n = base.count()
    if n == 0:
        return base.select("id", F.lit(0).cast("long").alias("r"))
    teleport = ((dden - dnum) * (scale // n)) // dden
    # a dangling vertex has no out-edges -> NULL outdeg in base; its
    # contribution expression (r DIV NULL) is NULL and never matches an
    # edge src, so only the mass-redistribution branch needs the set
    dangling_ids = base.filter(F.col("outdeg").isNull()).select("id")
    any_dangling = bool(dangling_ids.head(1))
    small = n <= broadcast_max_vertices
    ranks = base.select(
        "id", "outdeg", F.lit(scale // n).cast("long").alias("r")
    )
    # Checkpoint cadence: materializing ranks EVERY round costs one
    # eager job per iteration; chaining a few rounds lazily lets AQE
    # pipeline them, while a bounded cadence keeps plan depth (and
    # Catalyst optimization time) flat for large n_iter. With dangling
    # vertices each round already runs an action (the dangling-mass
    # collect), so lineage must truncate every round or the chain
    # recomputes inside the collect.
    ckpt_every = 1 if any_dangling else 3
    for it in range(n_iter):
        if any_dangling:
            dangling = (
                ranks.join(dangling_ids, "id", "left_semi")
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long"))
                .collect()[0][0]
            )
        else:
            dangling = 0
        share = dangling // n
        # per-VERTEX contribution straight off the rank frontier (which
        # carries outdeg), then fan out over edges: the vertex-sized
        # side is explicitly broadcast while n is provably small (the
        # checkpointed frontier has no stats, so Catalyst alone would
        # shuffle the EDGE list every iteration) — only the
        # contribution stream's groupBy(dst) moves data
        rc = ranks.select(
            F.col("id").alias("src"), F.expr("r DIV outdeg").alias("c")
        )
        inflow = (
            edges.join(F.broadcast(rc) if small else rc, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        ranks = (
            base.join(F.broadcast(inflow) if small else inflow, "id", "left")
            .withColumn(
                "r",
                F.expr(
                    f"CAST({teleport} + ({dnum} * (coalesce(inflow, 0)"
                    f" + {share})) DIV {dden} AS BIGINT)"
                ),
            )
            .select("id", "outdeg", "r")
        )
        if (it + 1) % ckpt_every == 0 or it == n_iter - 1:
            ranks = ck(ranks)
    return ranks.select("id", "r")


def bfs_distances(
    edges: DataFrame,
    source: DataFrame,
    n_rounds: int,
    materialize_edges: bool = True,
    broadcast_frontier: bool = False,
    reliable: bool = False,
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
      combinable; new frontier localCheckpointed per round;
    - ``broadcast_frontier=True`` broadcasts the frontier/reached
      sides into the edge join and the anti-join (callers whose vertex
      set is provably bounded — e.g. a dimension-keyed graph); the
      checkpointed frontier has no stats, so Catalyst alone would
      shuffle the edge list every round;
    - ``materialize_edges`` as in :func:`pagerank` — pass False for
      parquet-artifact-backed edge lists (columnar rescans beat
      row-format checkpoint blocks ~3x);
    - distances are exact integers — bitwise deterministic, so the
      oracle can unroll the identical min-relaxation recurrence.

    ``edges`` is the DIRECTED edge list (src, dst); pass both
    directions for undirected graphs. ``source`` must have column
    ``id`` (dist 0 seeds).
    """
    ck = lambda df: loop_checkpoint(df, reliable)  # noqa: E731
    edges = edges.select("src", "dst")
    if materialize_edges:
        edges = ck(edges)
    hint = F.broadcast if broadcast_frontier else (lambda df: df)
    reached = ck(
        source.select("id", F.lit(0).cast("long").alias("dist"))
    )
    frontier = reached
    for _ in range(n_rounds):
        if not frontier.head(1):
            break
        cand = (
            edges.join(
                hint(frontier.withColumnRenamed("id", "src")), "src"
            )
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
            .groupBy("id")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
        frontier = ck(
            cand.join(hint(reached.select("id")), "id", "left_anti")
        )
        # reached is a union of ALREADY-checkpointed frontiers — its
        # lineage is one union node per round, so materializing it
        # again would only add a job per round
        reached = reached.unionAll(frontier)
    return reached


def personalized_pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 4,
    damping: tuple[int, int] = (85, 100),
    scale: int = PR_SCALE,
    id_col: str = "id",
    materialize_edges: bool = True,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
    reliable: bool = False,
) -> DataFrame:
    """Personalized PageRank: teleport mass restarts at the SEED set
    instead of uniformly — the similarity-to-seeds measure behind
    related-item recommendation and seed-expansion community detection.
    Same EXACT integer fixed-point contract as :func:`pagerank` (all
    per-iteration ops integer, bitwise-reproducible, oracle-unrollable):

        r0(v)      = scale DIV |S|            if v in S else 0
        teleport   = ((den-num) * (scale DIV |S|)) DIV den   on seeds
        r'(v)      = (num * (inflow(v) + dang_v)) DIV den + teleport_v
        dang_v     = (dangling DIV |S|) for seeds else 0

    (dangling mass restarts at the seeds, inside the damped term —
    the standard PPR convention). Same loop shape as pagerank: one
    contribution shuffle per iteration, vertex-sized sides broadcast
    while provably small, bounded checkpoint cadence.
    """
    dnum, dden = damping
    ck = lambda df: loop_checkpoint(df, reliable)  # noqa: E731
    edges = edges.select("src", "dst")
    if materialize_edges:
        edges = ck(edges)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (
        vertices.select(F.col(id_col).alias("id"))
        .join(outdeg, F.col("id") == F.col("src"), "left")
        .join(
            seeds.select(F.col(id_col).alias("id")).withColumn(
                "is_seed", F.lit(True)
            ),
            "id",
            "left",
        )
        .select("id", "outdeg", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
        .transform(ck)
    )
    n = base.count()
    n_s = base.filter("is_seed").count()
    if n == 0 or n_s == 0:
        return base.select("id", F.lit(0).cast("long").alias("r"))
    teleport = ((dden - dnum) * (scale // n_s)) // dden
    dangling_ids = base.filter(F.col("outdeg").isNull()).select("id")
    any_dangling = bool(dangling_ids.head(1))
    small = n <= broadcast_max_vertices
    ranks = base.select(
        "id",
        "outdeg",
        "is_seed",
        F.when(F.col("is_seed"), F.lit(scale // n_s))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    ckpt_every = 1 if any_dangling else 3
    for it in range(n_iter):
        if any_dangling:
            dangling = (
                ranks.join(dangling_ids, "id", "left_semi")
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long"))
                .collect()[0][0]
            )
        else:
            dangling = 0
        share = dangling // n_s
        rc = ranks.select(
            F.col("id").alias("src"), F.expr("r DIV outdeg").alias("c")
        )
        inflow = (
            edges.join(F.broadcast(rc) if small else rc, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        ranks = (
            base.join(F.broadcast(inflow) if small else inflow, "id", "left")
            .withColumn(
                "r",
                F.expr(
                    f"CAST(({dnum} * (coalesce(inflow, 0)"
                    f" + IF(is_seed, {share}, 0))) DIV {dden}"
                    f" + IF(is_seed, {teleport}, 0) AS BIGINT)"
                ),
            )
            .select("id", "outdeg", "is_seed", "r")
        )
        if (it + 1) % ckpt_every == 0 or it == n_iter - 1:
            ranks = ck(ranks)
    return ranks.select("id", "r")


def k_core_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    checkpoint_every: int = 3,
    verify_converged: bool = True,
    reliable: bool = False,
) -> DataFrame:
    """Synchronous k-core peel over a DIRECTED-symmetrized edge list
    (``src``, ``dst`` columns, both orientations present): each round
    drops every vertex with degree < k and keeps edges whose endpoints
    both survive, for exactly ``rounds`` rounds — FIXED so an oracle's
    unrolled recurrence replays bit-for-bit. Returns the surviving
    edge stream.

    Fixed-point guard (VERDICT r10 item 7, the connected-components
    discipline from operators/components.py): a fixed unroll certified
    on TEST graphs can silently return a non-converged core on a
    denser production graph — one more O(m) degree aggregate checks
    whether round ``rounds``+1 would still peel anything, and FAILS
    LOUDLY with the observed shortfall instead. The check is a bounded
    scalar count off the already-checkpointed final edge set (one
    extra map-side-combined aggregate, ~one round's cost); pass
    ``verify_converged=False`` only where a caller replays a certified
    prefix on a pinned graph.

    Scale: each round is one map-side-combined degree count plus two
    semi-joins on the shrinking edge set — O(m) per round like
    pagerank(); the edge set is materialized every ``checkpoint_every``
    rounds. Unlike the VERTEX-sized loop state of pagerank/components,
    this loop's state is EDGE-sized, so the default materialization is
    ``disk_materialize`` (DISK_ONLY serialized blocks, predecessor
    freed) rather than localCheckpoint: deserialized checkpoint blocks
    of a 239M-edge graph starved the degree aggregates of execution
    memory at the r12 sf10 probe (AGGREGATE_OUT_OF_MEMORY) — see
    operators/loop.py. ``reliable=True`` still swaps in cluster-
    durable ``checkpoint()`` blocks.
    """
    from dimagi_data_platform_spark.operators.loop import disk_materialize

    if reliable:
        ck = lambda df, prev: loop_checkpoint(df, True)  # noqa: E731
    else:
        ck = disk_materialize
    e = edges
    prev = None
    for r in range(rounds):
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        e = e.join(keep, "src", "semi").join(
            keep.withColumnRenamed("src", "dst"), "dst", "semi"
        )
        if r % checkpoint_every == checkpoint_every - 1:
            e = ck(e, prev)
            prev = e
    if r % checkpoint_every != checkpoint_every - 1:
        e = ck(e, prev)
    if verify_converged:
        still_peelable = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") < k)
            .count()
        )
        if still_peelable:
            raise RuntimeError(
                f"k_core_peel(k={k}): {still_peelable} vertices would "
                f"still be peeled after {rounds} rounds — the unroll is "
                f"NOT a fixed point on this graph; raise `rounds` "
                f"(each adds one O(m) pass) instead of consuming a "
                f"non-converged core"
            )
    return e
