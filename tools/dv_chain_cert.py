"""DV chain read-cost certification UNDER the streaming sink
(VERDICT r10 item 8): 100 micro-batches through
versioned_sink(merge_mode='dv') at the production
DV_AUTO_COMPACT_DEPTH=32 — 3 full auto-compaction cycles — timing
read_version after every commit. Certifies end to end (through the
sink's replay-marker commits, not just per-merge) that chained
deletion-vector sidecars do NOT leak into the read path across
cycles: within a cycle the read plan deepens with the chain (each
link adds a sidecar anti-join — visible, bounded by the depth), and
the compaction commit folds it back, so the PER-CYCLE read-latency
profile must be flat cycle over cycle (flat_ratio ~ 1).

Too slow for the per-round bench (each sink commit is several Spark
jobs on a snapshot table, ~5-7 s/batch wall on local[32]; the signal
is the SHAPE, not the absolute time), so it runs standalone and
commits DV_CHAIN_CERT.json.

Usage:
    python tools/dv_chain_cert.py [--out DV_CHAIN_CERT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cert(spark, n_batches: int = 100) -> dict:
    from pyspark.sql import functions as F

    from dimagi_data_platform_spark.sources.versioned import (
        DV_AUTO_COMPACT_DEPTH,
        history,
        read_version,
    )
    from dimagi_data_platform_spark.streaming.versioned_stream import (
        versioned_sink,
    )

    d = tempfile.mkdtemp(prefix="dv_chain_cert_")
    path = f"{d}/t"
    sink = versioned_sink(path, keys=["k"], order_col="seq", ts_col="ts")
    reads: list[float] = []
    merges: list[float] = []
    try:
        for b in range(n_batches):
            batch = spark.range(200).select(
                ((F.col("id") * 37 + b) % 1000).alias("k"),
                F.lit(b).cast("long").alias("seq"),
                F.to_timestamp(
                    F.lit(f"2024-01-01 00:{b // 60:02d}:{b % 60:02d}")
                ).alias("ts"),
                (F.col("id") + b).cast("long").alias("v"),
            )
            t0 = time.perf_counter()
            sink(batch, b)
            merges.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            read_version(spark, path).count()
            reads.append(time.perf_counter() - t0)
        depths = [
            h.get("dv_depth") for h in history(path) if "dv_depth" in h
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    cyc = DV_AUTO_COMPACT_DEPTH + 1  # depth-32 chain + compaction commit
    cycles = [reads[i : i + cyc] for i in range(0, n_batches, cyc)][:3]
    means = [round(sum(c) / len(c), 3) for c in cycles]
    maxes = [round(max(c), 3) for c in cycles]
    return {
        "n_batches": n_batches,
        "auto_compact_depth": DV_AUTO_COMPACT_DEPTH,
        "read_sec_mean_by_cycle": means,
        "read_sec_max_by_cycle": maxes,
        "read_flat_ratio_cycle3_vs_cycle1": round(means[-1] / means[0], 3),
        "merge_sec_mean": round(sum(merges) / len(merges), 3),
        "max_observed_dv_depth": max((x for x in depths if x is not None),
                                     default=0),
        "protocol": (
            "100 batches through versioned_sink(dv); read_version timed "
            "after every commit; per-cycle profile must be flat "
            "cycle-over-cycle (chain folds at the compaction commit)"
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "DV_CHAIN_CERT.json"))
    ap.add_argument("--n-batches", type=int, default=100)
    args = ap.parse_args()

    from dimagi_data_platform_spark.session import get_spark

    spark = get_spark("dv-chain-cert")
    spark.sparkContext.setLogLevel("ERROR")
    out = run_cert(spark, args.n_batches)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
