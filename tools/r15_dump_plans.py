"""Dump formatted physical plans for round-15 evidence without timing
runs (construction may still run the queries' eager boundary jobs).

    python tools/r15_dump_plans.py --tag before <query> [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dimagi_data_platform_spark.plans.queries import QUERIES
from dimagi_data_platform_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("queries", nargs="+")
    a = ap.parse_args()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark("r15-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in a.queries:
        df = QUERIES[name](spark, a.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{a.tag}.txt"), "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt.splitlines())} lines, {n_ex} Exchange refs")
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()


if __name__ == "__main__":
    main()
