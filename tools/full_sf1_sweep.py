"""Full-registry sf1 evidence sweep (VERDICT r8 item 5): every
registered query runs at sf0.1 AND sf1 (10x data) in one session, and
every oracle-backed query hash-compares against DuckDB at sf1 — with a
per-oracle interrupt timeout so pair-quadratic oracles (infeasible in
one DuckDB node at sf1, verified at sf<=0.1 instead) record an honest
``oracle_timeout`` status instead of hanging the sweep.

    python tools/full_sf1_sweep.py [--out SF1_SWEEP.json] [--timeout 240]

Output JSON: per query {t_sf01, t_sf1, scale_x, parity: hash_ok |
rows_only | oracle_timeout | FAIL <details>}, plus a summary block
(counts, worst scale factors). Timing protocol: single run per query
per sf in one warmed session — the sf0.1 pass doubles as the janino/
worker warmup for the sf1 pass, so scale_x = t_sf1/t_sf01 measures the
data path, not compile cost. Scale target: at 10x data a healthy plan
stays at or below ~10x (linear); the summary lists every query above
it for audit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".artifacts", "sf1")


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed_spark(spark, fn, timeout: float):
    """Run fn() under a job group; cancel the group on timeout.
    Returns (seconds | None, err | None)."""
    import uuid

    group = f"sweep-{uuid.uuid4().hex[:8]}"
    out: dict = {}

    def work():
        spark.sparkContext.setJobGroup(group, "sf1 sweep", True)
        try:
            t0 = time.perf_counter()
            fn()
            out["sec"] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            out["err"] = str(e)[:200]
        finally:
            # PySpark 4 dropped SparkContext.clearJobGroup; the JVM
            # method is still there (a raise here is harmless to the
            # recorded timing but floods the log)
            try:
                spark.sparkContext._jsc.clearJobGroup()
            except Exception:
                pass

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        th.join(60)
        return None, f"spark_timeout(>{timeout:.0f}s)"
    return out.get("sec"), out.get("err")


def release_checkpoints(spark) -> None:
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def oracle_with_timeout(sf_dir: str, sql: str, timeout: float):
    """Run one oracle on a fresh connection; interrupt() on timeout.
    Returns (pdf | None, status)."""
    import duckdb

    from dimagi_data_platform_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    # r13: cap DuckDB's memory and point its spill at the repo tmp dir.
    # Without the cap, a pair-quadratic oracle at sf1 (e.g. the exact
    # truth side of the near-dup recall eval: 20k² pairs × 64-dim fold
    # chains) allocates faster than the interrupt timeout fires — the
    # first r13 sweep died to the kernel OOM killer at ~99 GB RSS. With
    # the cap the oracle spills (bounded by disk, cleaned on close) and
    # the timeout path gets its chance to record an honest
    # ``oracle_timeout``.
    # Cap ≈ 45% of physical RAM, 56 GB max (ADVICE r13: the hardcoded
    # 56 GB was tuned to this 125 GB host; on a smaller machine it
    # would exceed physical RAM and reintroduce the kernel-OOM failure
    # mode the cap exists to prevent). On this host that resolves to
    # the measured sweet spot: large enough that attempt-1's in-RAM
    # oracle speeds return (a 24 GB cap spilled mid-size oracles and
    # dropped parity throughput ~2.5x), small enough that python + the
    # 24 GB JVM driver heap stay clear of the host OOM line.
    ram_gb = (
        os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
    )
    cap_gb = max(4, min(56, int(ram_gb * 0.45)))
    con.execute(f"SET memory_limit='{cap_gb}GB'")
    tmpdir = os.path.join(REPO, ".tmp")
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory='{tmpdir}'")
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    out: dict = {}

    def work():
        try:
            out["pdf"] = con.execute(sql).fetchdf()
        except Exception as e:  # interrupted or real error
            out["err"] = str(e)

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout)

    def _close():
        # close releases the connection's temp spill files; an
        # interrupted connection left open was how 68 GB of stale
        # duckdb_temp_storage-* accumulated across earlier rounds
        try:
            con.close()
        except Exception:
            pass

    if th.is_alive():
        con.interrupt()
        th.join(30)
        _close()
        return None, "oracle_timeout"
    _close()
    if "err" in out:
        return None, f"oracle_error: {out['err'][:200]}"
    return out["pdf"], "ok"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "SF1_SWEEP.json"))
    ap.add_argument("--timeout", type=float, default=240.0)
    ap.add_argument("--spark-timeout", type=float, default=300.0)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument(
        "names", nargs="*",
        help="restrict to these query names (delta sweeps: the "
        "queries added/changed since the last full sweep)",
    )
    ap.add_argument(
        "--parity-only", action="store_true",
        help="skip the two timing passes (timings live in "
        "SCALE_CURVE_SF10.json); run only the sf1 hash gate",
    )
    args = ap.parse_args()

    if not os.path.isdir(SF1):
        raise SystemExit("build .artifacts/sf1 first: python tools/make_scaled_sf.py")

    os.environ["SPARK_GRAFT_ORACLE_SF"] = SF1
    import __spark_entry__ as entrymod
    from dimagi_data_platform_spark.session import get_spark
    from tests.parity import compare

    spark = get_spark("sf1_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(args.names) if args.names else sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    results: dict[str, dict] = {name: {} for name in names}
    # pass 1: sf0.1 single-run timings (doubles as session warmup)
    for name in names if not args.parity_only else []:
        sec, err = timed_spark(
            spark, lambda: run_noop(qs[name](spark, SF01)), args.spark_timeout
        )
        results[name] = {"t_sf01": sec}
        if err:
            results[name]["err_sf01"] = err
        release_checkpoints(spark)
        print(f"[sf0.1] {name}: {results[name].get('t_sf01')}", flush=True)

    # pass 2: sf1 timings
    for name in names if not args.parity_only else []:
        sec, err = timed_spark(
            spark, lambda: run_noop(qs[name](spark, SF1)), args.spark_timeout
        )
        results[name]["t_sf1"] = sec
        if err:
            results[name]["err_sf1"] = err
        release_checkpoints(spark)
        t01, t1 = results[name].get("t_sf01"), results[name].get("t_sf1")
        if t01 and t1:
            results[name]["scale_x"] = round(t1 / max(t01, 1e-9), 2)
        print(
            f"[sf1] {name}: {t1} ({results[name].get('scale_x')}x)",
            flush=True,
        )

    # pass 3: sf1 parity (hash gate) with oracle interrupt timeout
    if not args.skip_parity:
        for name in names:
            if name not in oracles:
                results[name]["parity"] = "rows_only"
                continue
            box: dict = {}

            def fetch():
                box["sdf"] = qs[name](spark, SF1).toPandas()

            _, err = timed_spark(spark, fetch, args.spark_timeout)
            if err or "sdf" not in box:
                results[name]["parity"] = f"spark_error: {err}"
                continue
            sdf = box["sdf"]
            release_checkpoints(spark)
            odf, status = oracle_with_timeout(
                SF1, oracles[name], args.timeout
            )
            if odf is None:
                results[name]["parity"] = status
            else:
                errs = compare(sdf, odf)
                results[name]["parity"] = (
                    "hash_ok" if not errs else f"FAIL: {errs[:3]}"
                )
            print(f"[parity] {name}: {results[name]['parity']}", flush=True)
            done = sum(1 for r in results.values() if "parity" in r)
            if done % 20 == 0:
                # incremental partial dump: a killed/OOMed run keeps
                # its evidence (r13 — the first sweep died at query
                # ~86 of 315 with nothing on disk)
                with open(args.out + ".partial", "w") as f:
                    json.dump(results, f, indent=1, sort_keys=True)

    scale_flagged = sorted(
        (
            (n, r["scale_x"])
            for n, r in results.items()
            if r.get("scale_x", 0) > 10 and r.get("t_sf1", 0) > 2.0
        ),
        key=lambda t: -t[1],
    )
    summary = {
        "n_queries": len(names),
        "data_multiple": 10,
        "protocol": "single run per sf in one warmed session",
        "n_hash_ok": sum(
            1 for r in results.values() if r.get("parity") == "hash_ok"
        ),
        "n_rows_only": sum(
            1 for r in results.values() if r.get("parity") == "rows_only"
        ),
        "n_oracle_timeout": sum(
            1
            for r in results.values()
            if r.get("parity") == "oracle_timeout"
        ),
        "n_fail": sum(
            1
            for r in results.values()
            if str(r.get("parity", "")).startswith(("FAIL", "spark_error", "oracle_error"))
        ),
        "over_10x_and_over_2s": scale_flagged,
        "total_sf1_sec": round(
            sum(r.get("t_sf1") or 0 for r in results.values()), 1
        ),
        "total_sf01_sec": round(
            sum(r.get("t_sf01") or 0 for r in results.values()), 1
        ),
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
