"""Connected components over a similarity-pair edge list — the
clustering stage of a near-dup dedup pipeline (pairs → clusters →
one canonical doc per cluster).

Reference parity: the dimagi platform groups forms into case "clusters"
for visit construction; here the same union-find semantics serve
near-duplicate document clustering.

Algorithm: iterative min-label propagation on DataFrames. Each round a
vertex takes the min of its own label and its neighbors' labels; the
loop stops when the global label sum stops decreasing (labels are
monotone non-increasing, so the sum is a convergence certificate that
costs one scalar aggregate per round — no row-level diff join).

Scale: every round is one shuffle (join on vertex id) + one partial
aggregate; lineage is truncated per round with localCheckpoint so the
plan doesn't grow with iterations. Rounds needed = graph diameter,
which for near-dup clusters is small (dup groups are near-cliques).
For adversarial long-chain graphs pass ``algorithm="star"``: the
two-phase large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond") converges in O(log n)
rounds with the same per-round shape; diameter-bound propagation stays
the default because dedup graphs are near-cliques.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dimagi_data_platform_spark.operators.loop import loop_checkpoint

# vertex-sized label frontiers are broadcast into the per-round edge
# join below this row count (the pagerank/HITS guard, guide §3.1);
# above it the round falls back to a shuffle join.
_BROADCAST_MAX_LABELS = 4_000_000


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    algorithm: str = "propagate",
    reliable: bool = False,
) -> DataFrame:
    """Label every vertex with the MIN vertex id reachable from it.

    Returns (id, component). Vertices absent from ``edges`` keep their
    own id as component (singleton clusters). Deterministic.

    ``algorithm="propagate"`` (default): min-label propagation,
    O(diameter) rounds — right for near-dup graphs (near-cliques).
    ``algorithm="star"``: alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond"),
    O(log n) rounds regardless of diameter — right for adversarial
    long-chain graphs.
    """
    if algorithm == "star":
        labels, _rounds = _star_components(
            vertices, edges, id_col, src_col, dst_col, max_iter,
            reliable=reliable,
        )
        return labels
    if algorithm != "propagate":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    ck = lambda df: loop_checkpoint(df, reliable)  # noqa: E731
    # Materialize the (possibly expensive) upstream edge plan ONCE —
    # every round joins sym, and without truncation the similarity-pair
    # computation that produced the edges would re-execute per round.
    # Checkpoint BEFORE the symmetric union: union's two branches are
    # separate plan subtrees, so uniting the raw edge plan with itself
    # would execute the upstream similarity computation twice.
    one_way = ck(
        edges.select(F.col(src_col).alias("id"), F.col(dst_col).alias("nbr"))
    )
    # r15 (guide §2.4, the r14 pagerank layout): the symmetric edge set
    # is persisted hash-repartitioned on ``nbr`` WITH lineage (cheap to
    # rebuild from the checkpointed one_way), so each round's
    # label-lookup join on nbr reads the cached clustering with no
    # Exchange when the vertex-sized label frontier is broadcast — the
    # per-round edge-stream shuffles drop from two (join + groupBy) to
    # the one the groupBy(id) fundamentally needs. Released before
    # returning (the final labels are checkpointed).
    sym = (
        one_way.union(
            one_way.select(F.col("nbr").alias("id"), F.col("id").alias("nbr"))
        )
        .repartition("nbr")
        .persist()
    )

    # Only edge-incident vertices can ever change label; iterate over
    # that (usually far smaller) subgraph and union the untouched
    # singletons back at the end as a zero-shuffle projection. At scale
    # this bounds every round by the near-dup population, not the
    # corpus.
    base = vertices.select(F.col(id_col).alias("id"))
    # vertex-sized, materialized once: it feeds BOTH the active-set
    # semi-join and the singleton anti-join (the latter evaluates at
    # action time, after the edge cache is released below)
    edge_ids = ck(sym.select("id").distinct())
    labels = (
        base.join(edge_ids, "id", "left_semi")
        .select("id", F.col("id").alias("component"))
        .transform(ck)
    )
    singletons = base.join(edge_ids, "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    # the label frontier is vertex-sized; broadcast it into the edge
    # join while provably small (the checkpointed frontier has no
    # stats, so Catalyst alone would shuffle the cached edges), with a
    # shuffle fallback past the guard (guide §3.1)
    n_active = labels.count()
    bc = F.broadcast if n_active <= _BROADCAST_MAX_LABELS else (lambda df: df)

    converged = False
    for _ in range(max_iter):
        nbr_labels = sym.join(
            bc(
                labels.select(
                    F.col("id").alias("nbr"),
                    F.col("component").alias("nbr_comp"),
                )
            ),
            "nbr",
        ).groupBy("id").agg(F.min("nbr_comp").alias("min_nbr"))
        labels = (
            labels.join(nbr_labels, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("min_nbr", "component")
                ).alias("component"),
            )
            .transform(ck)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Still shrinking at the round cap -> the labels are NOT
        # components yet (long-diameter graph). Returning them would be
        # silently wrong — linkage chains hit exactly this (a sorted
        # neighborhood is a path graph). Fail loudly and point at the
        # O(log n) algorithm instead of the O(diameter) one.
        sym.unpersist()
        raise RuntimeError(
            f"min-label propagation did not converge in {max_iter} rounds; "
            "the graph's diameter exceeds the cap — use "
            "algorithm='star' (O(log n) rounds) or raise max_iter"
        )
    # every round's labels are checkpointed, so the result no longer
    # depends on the edge cache (ADVICE r14 discipline)
    sym.unpersist()
    return labels.union(singletons)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to u's min neighborhood label.

    One shuffle (groupBy u) + one join; output replaces the edge set.
    """
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("m0")).select(
        "u", F.least("m0", "u").alias("m")
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small, then point every small neighbor (and
    the center) at the min of the closed neighborhood."""
    oriented = (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    out_nbrs = (
        oriented.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    out_self = mins.select("u", F.col("m").alias("v"))
    return out_nbrs.union(out_self).distinct()


def _star_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str,
    dst_col: str,
    max_iter: int,
    reliable: bool = False,
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star until the edge set is a fixed
    point. A star maps to itself under both operators, so set equality
    with the previous round certifies convergence; a cheap
    (count, endpoint-sum) precheck gates the exact exceptAll probe.
    Each round is a constant number of shuffles; rounds = O(log n)
    even on paths, vs O(n) for label propagation. Lineage truncated
    per round via the shared loop contract (operators/loop.py)."""
    ck = lambda df: loop_checkpoint(df, reliable)  # noqa: E731
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(ck)
    )
    prev_metrics, prev_e = None, e
    rounds = 0
    for _ in range(max_iter):
        e = ck(_small_star(_large_star(e)))
        rounds += 1
        cnt, ssum = e.agg(
            F.count(F.lit(1)), F.sum(F.col("u") + F.col("v"))
        ).collect()[0]
        if (cnt, ssum) == prev_metrics and e.exceptAll(prev_e).isEmpty():
            break
        prev_metrics, prev_e = (cnt, ssum), e
    # At the fixed point every non-root points straight at its
    # component's min id; roots and isolated vertices label themselves.
    labels = (
        vertices.select(F.col(id_col).alias("id"))
        .join(
            e.select(F.col("u").alias("id"), F.col("v").alias("root")),
            "id",
            "left",
        )
        .select("id", F.coalesce("root", "id").alias("component"))
    )
    return labels, rounds


def component_clusters(labels: DataFrame) -> DataFrame:
    """Attach cluster size: (id, component, cluster_size)."""
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(sizes, "component").select("id", "component", "cluster_size")
