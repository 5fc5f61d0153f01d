"""Bounded-default linkage family (VERDICT r9 item 1): the capped
variants of customer_fuzzy_match / part_catalog_near_dups must

- emit a SUBSET of the exact sibling's pairs (the SNM window only
  prunes candidates, never invents them — the verify kernel is the
  same predicate);
- recover most of the exact mass at the committed windows (recall
  floors measured at sf0.01: 92% customers, 89% parts);
- report the honest-cap mass EXACTLY: compared_pairs equals the
  distinct in-block candidate count, and compared + dropped equals
  Sigma_block choose(n, 2) — the identity that makes the cap auditable;
- stay oracle-parity-green on a degenerate single-block input where
  the cap bites maximally (one nation owns every customer).
"""

from __future__ import annotations

import shutil

import pytest

from dimagi_data_platform_spark.catalog import TABLES, table_path
from dimagi_data_platform_spark.plans.queries import (
    QUERIES,
    SNM_CUSTOMER_WINDOW,
    SNM_PART_WINDOW,
)
from tests.conftest import SF_MED, SF_SMALL
from tests.parity import run_parity


def _pairs(rows, a, b):
    return {(getattr(r, a), getattr(r, b)) for r in rows}


def test_capped_customer_subset_recall_mass(spark):
    capped = QUERIES["customer_fuzzy_match_capped"](spark, SF_MED).collect()
    exact = QUERIES["customer_fuzzy_match"](spark, SF_MED).collect()
    cp = _pairs(capped, "custkey_a", "custkey_b")
    ep = _pairs(exact, "custkey_a", "custkey_b")
    assert cp <= ep, "capped emitted a pair the exact semantics reject"
    assert len(cp) >= 0.90 * len(ep), (len(cp), len(ep))
    # mass identity: compared + dropped == Sigma_block choose(n, 2)
    r = capped[0]
    blocks = (
        QUERIES["customer_fuzzy_match"].__globals__["_t"](
            spark, SF_MED, "customer"
        )
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    total = sum(x["count"] * (x["count"] - 1) // 2 for x in blocks)
    assert r.compared_pairs + r.dropped_pairs == total
    assert r.dropped_pairs > 0  # blocks of ~60 > W=16: the cap bites
    # every row carries the same scalar mass
    assert len({(x.compared_pairs, x.dropped_pairs) for x in capped}) == 1


def test_capped_part_subset_recall_mass(spark):
    capped = QUERIES["part_catalog_near_dups_capped"](spark, SF_MED).collect()
    exact = QUERIES["part_catalog_near_dups"](spark, SF_MED).collect()
    cp = _pairs(capped, "part_a", "part_b")
    ep = _pairs(exact, "part_a", "part_b")
    assert cp <= ep
    assert len(cp) >= 0.85 * len(ep), (len(cp), len(ep))
    r = capped[0]
    blocks = (
        QUERIES["part_catalog_near_dups"].__globals__["_t"](
            spark, SF_MED, "part"
        )
        .groupBy("p_type")
        .count()
        .collect()
    )
    total = sum(x["count"] * (x["count"] - 1) // 2 for x in blocks)
    assert r.compared_pairs + r.dropped_pairs == total
    assert r.dropped_pairs > 0
    # jaccard values must match the exact sibling's on shared pairs
    ej = {(x.part_a, x.part_b): x.jaccard for x in exact}
    assert all(abs(ej[(x.part_a, x.part_b)] - x.jaccard) < 1e-12 for x in capped)


@pytest.fixture(scope="module")
def one_block_sf(tmp_path_factory):
    """sf0.001 with every customer forced into nation 0 — ONE block of
    150 rows, the worst case for block² semantics and the maximal-bite
    case for the SNM cap (choose(150,2)=11175 block pairs vs a linear
    candidate set)."""
    import duckdb

    d = str(tmp_path_factory.mktemp("sf_oneblock"))
    for t in TABLES:
        src = table_path(SF_SMALL, t)
        try:
            shutil.copyfile(src, f"{d}/{t}.parquet")
        except FileNotFoundError:
            pass
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * REPLACE (0 AS c_nationkey)
                 FROM '{table_path(SF_SMALL, "customer")}')
            TO '{d}/customer.parquet' (FORMAT PARQUET)"""
    )
    return d


def test_capped_customer_one_block_parity_and_bound(spark, one_block_sf):
    rows = QUERIES["customer_fuzzy_match_capped"](spark, one_block_sf).collect()
    n = 150
    total = n * (n - 1) // 2
    r = rows[0]
    assert r.compared_pairs + r.dropped_pairs == total
    # the linear bound: two passes of W neighbors each, minus overlap
    assert r.compared_pairs <= 2 * n * SNM_CUSTOMER_WINDOW
    assert r.dropped_pairs > 0
    res = run_parity(spark, one_block_sf, ["customer_fuzzy_match_capped"])
    assert all(not errs for errs in res.values()), res


def test_snm_windows_are_the_documented_literals():
    """The oracle SQL hard-codes the windows; the Spark constants must
    stay in lockstep (the MAX_WEDGE_OUTDEG==64 discipline)."""
    from dimagi_data_platform_spark.plans.oracle import ORACLE

    assert SNM_CUSTOMER_WINDOW == 16
    assert SNM_PART_WINDOW == 10
    assert "a.rn + 16" in ORACLE["customer_fuzzy_match_capped"]
    assert "a.rn + 10" in ORACLE["part_catalog_near_dups_capped"]
