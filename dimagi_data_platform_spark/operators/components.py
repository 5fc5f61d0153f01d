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
For adversarial long-chain graphs the two-phase large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce") converges
in O(log n) rounds with the same per-round shape; diameter-bound
propagation is the right default for dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with the MIN vertex id reachable from it.

    Returns (id, component). Vertices absent from ``edges`` keep their
    own id as component (singleton clusters). Deterministic.
    """
    sym = edges.select(
        F.col(src_col).alias("id"), F.col(dst_col).alias("nbr")
    ).union(edges.select(F.col(dst_col).alias("id"), F.col(src_col).alias("nbr")))

    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for _ in range(max_iter):
        nbr_labels = sym.join(
            labels.select(
                F.col("id").alias("nbr"), F.col("component").alias("nbr_comp")
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
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def component_clusters(labels: DataFrame) -> DataFrame:
    """Attach cluster size: (id, component, cluster_size)."""
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(sizes, "component").select("id", "component", "cluster_size")
