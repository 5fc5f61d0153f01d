"""Round-15 proof for r14's C3/C4 claims (VERDICT r14 item 6): the
committed final-plan dumps cannot show the per-iteration Exchange
elimination because loop checkpoints truncate lineage, so this tool
captures a MID-ITERATION explain — the exact per-round aggregate the
pagerank / LPA kernels build, over the same dst-/src-partitioned
persisted edge cache and a checkpointed broadcast frontier.

Claim being proven: the per-round groupBy over the cached edge side
plans with NO Exchange between the InMemoryTableScan and the final
HashAggregate (the BroadcastHashJoin preserves the streamed side's
cached hashpartitioning), i.e. the n_iter per-round edge shuffles
collapsed into the single upfront repartition.

Writes plans/r15/part_pagerank_miditer.txt and
plans/r15/copurchase_communities_miditer.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dimagi_data_platform_spark.plans.queries import _copurchase_edges
from dimagi_data_platform_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark("r15-miditer")
    spark.sparkContext.setLogLevel("ERROR")

    e0 = _copurchase_edges(spark, SF_DIR)
    edges = e0.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(e0.select(F.col("v").alias("src"), F.col("u").alias("dst")))

    # --- pagerank per-iteration contribution aggregate (graph.py loop
    # body): dst-partitioned persisted edges, checkpointed broadcast
    # rank frontier, groupBy(dst) ---
    e_pr = edges.repartition("dst").persist()
    base = (
        e_pr.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("outdeg", F.lit(4).cast("long"))
        .withColumn("r", F.lit(10**9).cast("long"))
        .localCheckpoint()
    )
    rc = base.select(F.col("id").alias("src"), F.expr("r DIV outdeg").alias("c"))
    inflow = (
        e_pr.join(F.broadcast(rc), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("c").cast("long").alias("inflow"))
    )
    inflow.write.format("noop").mode("overwrite").save()  # materialize cache
    txt = explain(inflow)
    with open(os.path.join(plans_dir, "part_pagerank_miditer.txt"), "w") as f:
        f.write(txt)
    post = txt.split("InMemoryTableScan", 1)[0]
    print(
        "pagerank mid-iteration: Exchange-above-cache refs:",
        post.count("Exchange"),
        "| total plan lines:",
        len(txt.splitlines()),
    )
    e_pr.unpersist()

    # --- LPA per-round (src, nlbl) aggregate (copurchase_communities
    # loop body): src-partitioned persisted edges, checkpointed
    # broadcast label frontier, groupBy(src, nlbl) ---
    e_lpa = edges.repartition("src").persist()
    labels = (
        e_lpa.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint()
    )
    nbr = (
        e_lpa.join(
            F.broadcast(
                labels.select(F.col("id").alias("dst"), F.col("lbl").alias("nlbl"))
            ),
            "dst",
        )
        .groupBy("src", "nlbl")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    nbr.write.format("noop").mode("overwrite").save()
    txt = explain(nbr)
    with open(
        os.path.join(plans_dir, "copurchase_communities_miditer.txt"), "w"
    ) as f:
        f.write(txt)
    post = txt.split("InMemoryTableScan", 1)[0]
    print(
        "LPA mid-round: Exchange-above-cache refs:",
        post.count("Exchange"),
        "| total plan lines:",
        len(txt.splitlines()),
    )
    e_lpa.unpersist()


if __name__ == "__main__":
    main()
