"""Strict local mirror of the driver's correctness gate: every query
in __spark_entry__.queries() must match its DuckDB oracle exactly
(row count + column names + values) at sf0.001; rows-only queries must
at least execute."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tests.parity import compare, duck_con

QUERIES = entrymod.queries()
# trained-quantizer oracles are generated per-sf (artifact replay) —
# point the generator at the sf this suite checks BEFORE fetching
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_SMALL
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_SMALL)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    fn = QUERIES[name]
    if name not in ORACLES:
        assert fn(spark, SF_SMALL).count() >= 0
        return
    sdf = fn(spark, SF_SMALL).toPandas()
    odf = con.execute(ORACLES[name]).fetchdf()
    errs = compare(sdf, odf)
    assert not errs, f"{name}: {errs[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema.fields) == 10
