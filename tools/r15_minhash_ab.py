"""Round-15 adjudication of r14's C7 (minhash sigs localCheckpoint
removal) — VERDICT r14 item 1: interleaved A/B on a quiet host.

Arms (both produce row-identical results; only materialization differs):
  A = current code: NO checkpoint of the signature table (r14 state).
  B = r13 state: sigs.localCheckpoint() before lsh_candidate_pairs.

Protocol: warm both arms once, then N interleaved pairs (A,B,A,B,...)
of noop-sink runs with checkpoint blocks released between runs —
exactly the bench's measurement discipline, so the winner's reading is
comparable to bench_detail.json.

    python tools/r15_minhash_ab.py [--runs 5] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dimagi_data_platform_spark.catalog import load_table
from dimagi_data_platform_spark.operators.minhash import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from dimagi_data_platform_spark.session import get_spark


def build(spark, sf_dir: str, checkpoint_sigs: bool):
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", 64, 3, 42)
    if checkpoint_sigs:
        sigs = sigs.localCheckpoint()
    pairs = lsh_candidate_pairs(sigs, "doc_id", 16, 4)
    return pairs.filter(F.col("est_jaccard") >= 0.2)


def release(spark) -> None:
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    a = ap.parse_args()
    spark = get_spark("r15-minhash-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(ck: bool) -> float:
        t0 = time.perf_counter()
        build(spark, a.sf_dir, ck).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        release(spark)
        return round(dt, 3)

    # warm both arms (codegen, page-in)
    run(False)
    run(True)
    times = {"no_ckpt": [], "with_ckpt": []}
    for _ in range(a.runs):
        times["no_ckpt"].append(run(False))
        times["with_ckpt"].append(run(True))
    print(
        json.dumps(
            {
                "runs": times,
                "min_no_ckpt": min(times["no_ckpt"]),
                "min_with_ckpt": min(times["with_ckpt"]),
                "median_no_ckpt": sorted(times["no_ckpt"])[len(times["no_ckpt"]) // 2],
                "median_with_ckpt": sorted(times["with_ckpt"])[
                    len(times["with_ckpt"]) // 2
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
