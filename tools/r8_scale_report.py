"""r8 scale evidence: time the round's new queries at sf0.1 vs sf1
(.artifacts/sf1, built by tools/make_scaled_sf.py) and hash-compare a
parity sample against DuckDB at sf1. Prints a markdown table for
BASELINE.md.

    python tools/r8_scale_report.py [--parity-only|--timing-only]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R8_QUERIES = [
    "order_value_welch_ttest",
    "daily_revenue_acf",
    "lang_id_cohen_kappa",
    "event_type_dispersion",
    "part_k_core",
    "copurchase_adamic_adar",
    "customer_hazard_na",
    "doc_rake_keywords",
    "source_pass_at_k",
    "ann_recall_eval",
    "rolling_median_revenue",
    "fd_audit",
    "part_hits_authority",
    "user_burst_detection",
    "source_lexical_diversity",
    "matryoshka_recall_eval",
    "quality_pr_curve",
    "copurchase_degree_powerlaw",
    "embedding_silhouette",
    "sq_quantization_error",
    "corpus_token_budget",
    "event_double_fire_audit",
    "part_abc_xyz",
    "brand_discount_quantity_corr",
    "supplier_return_outliers",
    "segment_value_moments",
    "order_value_permutation_test",
]

# DuckDB-at-sf1 parity sample: everything whose oracle is not a
# pair-quadratic graph/vector kernel (those are verified at sf<=0.1;
# the Spark side still runs at sf1 in the timing table)
PARITY_SAMPLE = [
    q
    for q in R8_QUERIES
    if q
    not in (
        "copurchase_adamic_adar",  # 410M-wedge self-join in one DuckDB node
        "ann_recall_eval",  # brute-force oracle is corpus x queries
        "matryoshka_recall_eval",
        "embedding_silhouette",
    )
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".artifacts",
    "sf1",
)


def main() -> None:
    from dimagi_data_platform_spark.plans.queries import QUERIES
    from dimagi_data_platform_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    spark = get_spark("r8-scale")
    spark.sparkContext.setLogLevel("ERROR")

    if mode != "--parity-only":
        print("| query | sf0.1 sec | sf1 sec | ratio (data x10) |")
        print("|---|---|---|---|")
        for name in R8_QUERIES:
            ts = {}
            for sf_dir, key in ((SF01, "sf01"), (SF1, "sf1")):
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                ts[key] = best
            print(
                f"| {name} | {ts['sf01']:.2f} | {ts['sf1']:.2f} "
                f"| {ts['sf1'] / ts['sf01']:.2f} |"
            )
            sys.stdout.flush()

    if mode != "--timing-only":
        from tests.parity import run_parity

        res = run_parity(spark, SF1, PARITY_SAMPLE)
        for name, problems in sorted(res.items()):
            print(("OK  " if not problems else "FAIL") + f" {name}"
                  + ("" if not problems else f"  {problems[:2]}"))
        n_ok = sum(1 for v in res.values() if not v)
        print(f"\nsf1 parity: {n_ok}/{len(res)}")


if __name__ == "__main__":
    main()
