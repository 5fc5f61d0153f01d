"""Degenerate-input robustness: EVERY registered query must execute
(possibly to an empty result) against zero-row tables — the state a
production pipeline hits on day one, after an over-aggressive filter,
or on an empty ingest partition. Found-and-fixed by the r7 sweep:
np.stack on empty quantizer training samples (7 ANN queries), ANSI
divide-by-zero on empty denominators (3 ratio queries), and
schema-less reads of an IVF index built from an empty corpus."""

from __future__ import annotations

import os

import duckdb
import pytest

from dimagi_data_platform_spark.catalog import TABLES, table_path
from dimagi_data_platform_spark.plans.queries import QUERIES
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    con = duckdb.connect()
    for t in TABLES:
        src = table_path(SF_SMALL, t)
        if os.path.exists(src):
            con.execute(
                f"COPY (SELECT * FROM '{src}' LIMIT 0) "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    return d


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf, name):
    # result content is unspecified on empty input (usually no rows,
    # sometimes a single all-NULL/zero statistic row); the contract is
    # "executes without raising"
    QUERIES[name](spark, empty_sf).collect()
