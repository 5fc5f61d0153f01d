"""Command-line entry point: run any named query against a table
directory.

    python -m dimagi_data_platform_spark list
    python -m dimagi_data_platform_spark run q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m dimagi_data_platform_spark run q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --out /tmp/q1 --explain

`run` prints the result (or writes parquet with --out); --explain
prints the formatted physical plan instead of executing.

    python -m dimagi_data_platform_spark etl --config etl.json

`etl` runs the composed platform pipeline (plans/etl.py) from a JSON
config whose keys are PlatformEtlConfig fields — the declarative
entrypoint the reference's scheduled job maps to.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dimagi_data_platform_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list all named queries")
    r = sub.add_parser("run", help="run a named query")
    r.add_argument("query")
    r.add_argument("--sf-dir", required=True, help="directory of parquet tables")
    r.add_argument("--limit", type=int, default=20, help="rows to print")
    r.add_argument("--out", help="write full result as parquet here instead")
    r.add_argument(
        "--explain", action="store_true", help="print the physical plan, don't execute"
    )
    e = sub.add_parser(
        "etl", help="run the composed platform ETL from a JSON config"
    )
    e.add_argument(
        "--config", required=True,
        help="JSON file of PlatformEtlConfig fields (source_events, "
        "warehouse, optional jdbc_url/jdbc_driver/publish)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    from dimagi_data_platform_spark.plans.queries import QUERIES

    args = build_parser().parse_args(argv)
    if args.cmd == "list":
        for name in sorted(QUERIES):
            print(name)
        return 0
    if args.cmd == "etl":
        import json

        from dimagi_data_platform_spark.plans.etl import (
            PlatformEtlConfig,
            run_platform_etl,
        )
        from dimagi_data_platform_spark.session import get_spark

        with open(args.config) as fh:
            raw = json.load(fh)
        if "publish" in raw:
            raw["publish"] = tuple(raw["publish"])
        cfg = PlatformEtlConfig(**raw)
        report = run_platform_etl(get_spark("cli:etl"), cfg)
        print(json.dumps(report, default=str))
        return 0
    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    from dimagi_data_platform_spark.session import get_spark

    spark = get_spark(f"cli:{args.query}")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    elif args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
