"""Degenerate-GRAPH hardening (VERDICT r8 item 6): the empty/one-row
suite covers zero-row tables, but not structurally-degenerate graphs.
Each case here runs the Spark query AND its DuckDB oracle on the same
synthetic tables (full parity, not just "doesn't raise"):

- a perfect matching (every vertex degree 1): k-core peels everything
  in round one; the power-law tail (deg >= 2) is EMPTY so the Hill fit
  is undefined -> NULL alpha on both engines;
- a triangle (every degree exactly d_min=2): ln(d/d_min) sums to 0 so
  the Hill estimator divides by zero -> NULL alpha, not an error;
- HITS on a bipartite graph with ONE customer: every purchased part
  normalizes to authority 1.0, no division hazard;
- the hub-capped Adamic-Adar on a graph with over-cap clique centers:
  the cap bites (dropped mass > 0, reported identically by both
  engines) while wedges from kept centers still surface.
"""

from __future__ import annotations

import shutil

import pytest

from dimagi_data_platform_spark.catalog import TABLES, table_path
from dimagi_data_platform_spark.plans.queries import QUERIES
from tests.conftest import SF_SMALL
from tests.parity import run_parity


def _make_graph_sf(tmp_path_factory, name, lineitem_pairs, cust_of=None):
    """An sf dir that is sf0.001 with lineitem (and orders) REPLACED by
    a synthetic graph: lineitem_pairs = [(orderkey, partkey), ...];
    cust_of maps orderkey -> custkey (default: all customer 1)."""
    import duckdb

    d = str(tmp_path_factory.mktemp(name))
    for t in TABLES:
        src = table_path(SF_SMALL, t)
        try:
            shutil.copyfile(src, f"{d}/{t}.parquet")
        except FileNotFoundError:
            pass
    con = duckdb.connect()
    li_rows = ", ".join(
        f"({ok}, {pk})" for ok, pk in lineitem_pairs
    )
    con.execute(
        f"""COPY (
          SELECT CAST(ok AS BIGINT) AS l_orderkey,
                 CAST(pk AS BIGINT) AS l_partkey,
                 CAST(1 AS BIGINT) AS l_suppkey,
                 CAST(1 AS INTEGER) AS l_linenumber,
                 1.0 AS l_quantity, 10.0 AS l_extendedprice,
                 0.0 AS l_discount, 0.0 AS l_tax,
                 'N' AS l_returnflag, 'O' AS l_linestatus,
                 TIMESTAMP '2024-01-01 00:00:00' AS l_shipdate
          FROM (VALUES {li_rows}) AS t(ok, pk)
        ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    orderkeys = sorted({ok for ok, _ in lineitem_pairs})
    cust_of = cust_of or {}
    o_rows = ", ".join(
        f"({ok}, {cust_of.get(ok, 1)})" for ok in orderkeys
    )
    con.execute(
        f"""COPY (
          SELECT CAST(ok AS BIGINT) AS o_orderkey,
                 CAST(ck AS BIGINT) AS o_custkey,
                 'O' AS o_orderstatus, 100.0 AS o_totalprice,
                 TIMESTAMP '2024-01-01 00:00:00' AS o_orderdate,
                 '1-URGENT' AS o_orderpriority
          FROM (VALUES {o_rows}) AS t(ok, ck)
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)"""
    )
    return d


@pytest.fixture(scope="module")
def matching_sf(tmp_path_factory):
    # 4 orders x 2 disjoint parts: every co-purchase vertex has degree 1
    pairs = []
    for i in range(4):
        pairs += [(i + 1, 10 + 2 * i), (i + 1, 11 + 2 * i)]
    return _make_graph_sf(tmp_path_factory, "sf_matching", pairs)


@pytest.fixture(scope="module")
def triangle_sf(tmp_path_factory):
    # parts 1,2,3 pairwise co-purchased: every degree is exactly 2
    pairs = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 1), (3, 3)]
    return _make_graph_sf(tmp_path_factory, "sf_triangle", pairs)


@pytest.fixture(scope="module")
def one_customer_sf(tmp_path_factory):
    # ONE customer buying 3 parts across 2 orders (bipartite star)
    pairs = [(1, 1), (1, 2), (2, 3)]
    return _make_graph_sf(
        tmp_path_factory, "sf_onecust", pairs, cust_of={1: 7, 2: 7}
    )


@pytest.fixture(scope="module")
def hub_sf(tmp_path_factory):
    # two 66-cliques bridged by part 500: the lowest-id center of each
    # clique has oriented outdeg 65 > MAX_WEDGE_OUTDEG=64 (dropped);
    # center 500 (outdeg 2) is kept and yields the non-edge wedge
    # (1, 70) that must appear in the capped result
    pairs = [(1, p) for p in range(1, 67)]          # clique A: 1..66
    pairs += [(2, p) for p in range(70, 136)]       # clique B: 70..135
    pairs += [(3, 1), (3, 500), (4, 70), (4, 500)]  # bridge via 500
    return _make_graph_sf(tmp_path_factory, "sf_hub", pairs)


def test_matching_graph_kcore_empty_and_powerlaw_null(spark, matching_sf):
    assert QUERIES["part_k_core"](spark, matching_sf).count() == 0
    row = QUERIES["copurchase_degree_powerlaw"](spark, matching_sf).first()
    assert row.n_tail == 0 and row.alpha_hill is None
    res = run_parity(
        spark, matching_sf, ["part_k_core", "copurchase_degree_powerlaw"]
    )
    assert all(not errs for errs in res.values()), res


def test_triangle_graph_hill_divides_by_zero_to_null(spark, triangle_sf):
    """All degrees == d_min: the tail is non-empty but Σln(d/d_min)=0 —
    alpha must be NULL on BOTH engines, never a divide error."""
    row = QUERIES["copurchase_degree_powerlaw"](spark, triangle_sf).first()
    assert row.n_tail == 3 and row.sum_lnq == 0 and row.alpha_hill is None
    assert QUERIES["part_k_core"](spark, triangle_sf).count() == 0
    res = run_parity(
        spark, triangle_sf, ["part_k_core", "copurchase_degree_powerlaw"]
    )
    assert all(not errs for errs in res.values()), res


def test_hits_single_customer_bipartite(spark, one_customer_sf):
    """One customer: every part it bought converges to authority 1.0;
    normalization (integer DIV max) must not divide by zero."""
    rows = QUERIES["part_hits_authority"](spark, one_customer_sf).collect()
    assert {r.p_partkey for r in rows} == {1, 2, 3}
    assert all(r.authority == 1.0 for r in rows)
    res = run_parity(spark, one_customer_sf, ["part_hits_authority"])
    assert all(not errs for errs in res.values()), res


def test_capped_adamic_adar_reports_dropped_hub_mass(spark, hub_sf):
    from dimagi_data_platform_spark.plans.queries import MAX_WEDGE_OUTDEG

    rows = QUERIES["copurchase_adamic_adar_capped"](spark, hub_sf).collect()
    # the kept center (500) yields the non-edge pair (1, 70)
    assert [(r.part_a, r.part_b, r.n_common) for r in rows] == [(1, 70, 1)]
    r = rows[0]
    # one over-cap center per clique, each dropping choose(65, 2) wedges
    assert r.dropped_centers == 2
    assert r.dropped_wedges == 2 * (65 * 64 // 2)
    # r12 wedge-budget columns: the tiny graph is far under the 4M
    # floor, so thinning must NOT engage and values stay exact
    assert r.thin_rate == 1
    assert r.wedge_budget >= 4_000_000
    # the exact sibling still enumerates everything (no dropped columns)
    exact = QUERIES["copurchase_adamic_adar"](spark, hub_sf).collect()
    assert (1, 70) in {(x.part_a, x.part_b) for x in exact}
    assert MAX_WEDGE_OUTDEG == 64  # the literal the oracle mirrors
    # the second capped wedge variant must report the same dropped mass
    lp = QUERIES["copurchase_link_prediction_capped"](spark, hub_sf).collect()
    assert [(r.part_a, r.part_b, r.n_common) for r in lp] == [(1, 70, 1)]
    assert (lp[0].dropped_centers, lp[0].dropped_wedges) == (2, 2 * (65 * 64 // 2))
    res = run_parity(
        spark, hub_sf,
        ["copurchase_adamic_adar_capped", "copurchase_adamic_adar",
         "copurchase_link_prediction_capped"],
    )
    assert all(not errs for errs in res.values()), res
