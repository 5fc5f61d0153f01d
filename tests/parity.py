"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its oracle SQL side-by-side, sorts columns by
name and rows by all columns, and compares row count / column names /
exact values. Used by tests/test_oracle_parity.py and runnable as a CLI
for fast iteration:

    python tests/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dimagi_data_platform_spark.catalog import TABLES, table_path


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            non_null = df[c].dropna()
            if len(non_null) and all(
                hasattr(v, "year") and not hasattr(v, "hour") for v in non_null.head(5)
            ):
                # datetime.date (Spark DateType) vs duckdb date → align
                df[c] = pd.to_datetime(df[c])
            elif len(non_null) and (
                isinstance(non_null.iloc[0], (list, tuple))
                or hasattr(non_null.iloc[0], "tolist")
            ):
                # list cells (Spark list vs duckdb ndarray) → tuples so
                # rows sort and compare deterministically
                df[c] = df[c].map(
                    lambda v: tuple(v.tolist() if hasattr(v, "tolist") else v)
                    if v is not None
                    else None
                )
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _num_class(v) -> str:
    """Coarse numeric type class of one cell, mirroring what the
    driver's canonical renderer distinguishes: int64 renders 123,
    float64 renders 123.0, Decimal renders its exact digits."""
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    return "other"


def _cell_eq(a, b) -> bool:
    if isinstance(a, (list, tuple)) or hasattr(a, "tolist"):
        a = list(a.tolist() if hasattr(a, "tolist") else a)
        b = list(b.tolist() if hasattr(b, "tolist") else b)
        return len(a) == len(b) and all(_cell_eq(x, y) for x, y in zip(a, b))
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    try:
        a_null = a_null or pd.isna(a)
        b_null = b_null or pd.isna(b)
    except (TypeError, ValueError):
        pass
    if a_null or b_null:
        return bool(a_null) and bool(b_null)
    ca, cb = _num_class(a), _num_class(b)
    if ca != cb and "float" in (ca, cb) and {ca, cb} & {"int", "decimal"}:
        # int64/Decimal on one side vs float64 on the other is exactly
        # the divergence the driver's rendered-value hash detects
        # (123 vs 123.0, or a 22-digit Decimal squeezed through a lossy
        # float64) — FAIL instead of coercing it away. This class of
        # bug hid 4 driver hash mismatches in round 3.
        return False
    if ca == "float" and cb == "float":
        return float(a) == float(b)
    return a == b


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_df) != len(oracle_df):
        errs.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        errs.append(f"columns: spark={s_cols} oracle={o_cols}")
        return errs
    if errs:
        return errs
    s, o = normalize(spark_df), normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _cell_eq(a, b):
                errs.append(f"col {c} row {i}: spark={a!r} oracle={b!r}")
                if len(errs) > 5:
                    return errs
    return errs


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # trained-quantizer oracles are generated per-sf (artifact replay);
    # point the generator at the sf being checked
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    oracles = entrymod.oracle_sql()
    con = duck_con(sf_dir)
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if name not in oracles:
            # rows-only query: just check it runs and count rows
            n = fn(spark, sf_dir).count()
            results[name] = [] if n >= 0 else ["failed to run"]
            continue
        sdf = fn(spark, sf_dir).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        results[name] = compare(sdf, odf)
    return results


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dimagi_data_platform_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = get_spark("parity")
    res = run_parity(spark, sf_dir, names)
    bad = 0
    for name, errs in sorted(res.items()):
        status = "OK" if not errs else "FAIL"
        bad += bool(errs)
        print(f"{status:4s} {name}")
        for e in errs:
            print(f"      {e}")
    print(f"{len(res) - bad}/{len(res)} queries match")
    sys.exit(1 if bad else 0)
