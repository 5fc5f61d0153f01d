"""Independent pandas references for the round-4 analytics queries.

Oracle parity proves Spark and DuckDB agree; these tests recompute the
statistics from the raw parquet with plain pandas/Python (a third,
independent code path) so a formula error SHARED by both engine
implementations cannot survive."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_SMALL

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def orders_pdf():
    return pd.read_parquet(f"{SF_SMALL}/orders.parquet")


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(f"{SF_SMALL}/events.parquet")


def test_kaplan_meier_reference(spark, orders_pdf):
    o = orders_pdf.copy()
    o["d"] = o["o_orderdate"].dt.normalize()
    horizon = o["d"].max()
    per = o.groupby("o_custkey")["d"].agg(["min", "max"])
    per["t"] = (per["max"] - per["min"]).dt.days
    per["event"] = (horizon - per["max"]).dt.days > 90
    # classic product-limit estimate over event times
    rows = []
    n_at_risk = len(per)
    s = 1.0
    for t in sorted(per["t"].unique()):
        d = int(((per["t"] == t) & per["event"]).sum())
        if d > 0 and n_at_risk > d:
            s *= (n_at_risk - d) / n_at_risk
            rows.append((t, n_at_risk, d, s))
        n_at_risk -= int((per["t"] == t).sum())
    ref = pd.DataFrame(rows, columns=["t", "n", "d", "s"])
    got = QUERIES["customer_survival_km"](spark, SF_SMALL).toPandas()
    assert list(got["t_days"]) == list(ref["t"])
    assert list(got["n_at_risk"]) == list(ref["n"])
    assert list(got["n_events"]) == list(ref["d"])
    # fixed-point quantization tolerance: ppm-scale
    for ppm, s in zip(got["survival_ppm"], ref["s"]):
        assert abs(ppm / 1e6 - s) < 5e-5


def test_chi2_reference(spark, orders_pdf):
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    j = orders_pdf.merge(cust, left_on="o_custkey", right_on="c_custkey")
    ct = pd.crosstab(j["c_mktsegment"], j["o_orderpriority"])
    n = ct.values.sum()
    got = QUERIES["segment_priority_chi2"](spark, SF_SMALL).toPandas()
    chi2_ref = 0.0
    for _, r in got.iterrows():
        o = ct.loc[r["c_mktsegment"], r["o_orderpriority"]]
        e = ct.loc[r["c_mktsegment"]].sum() * ct[r["o_orderpriority"]].sum() / n
        assert r["n_obs"] == o
        assert abs(r["expected"] - e) < 1e-6 * max(1.0, e)
        assert abs(r["chi2_contrib"] - (o - e) ** 2 / e) < 1e-6
        chi2_ref += (o - e) ** 2 / e
    assert got["chi2_contrib"].sum() == pytest.approx(chi2_ref)


def test_rfm_reference(spark, orders_pdf):
    o = orders_pdf.copy()
    o["d"] = o["o_orderdate"].dt.normalize()
    horizon = o["d"].max()
    per = o.groupby("o_custkey").agg(
        last=("d", "max"),
        n_orders=("o_orderkey", "count"),
        cents=("o_totalprice", lambda s: int(sum(math.floor(x * 100) for x in s))),
    )
    per["recency"] = (horizon - per["last"]).dt.days
    n = len(per)

    def quart(series):
        order = series.reset_index().sort_values(
            [series.name, "o_custkey"]
        )["o_custkey"]
        rank = pd.Series(range(1, n + 1), index=order).sort_index()
        return 1 + ((rank - 1) * 4) // n

    per["r_q"] = quart(per["recency"])
    per["f_q"] = quart(per["n_orders"])
    per["m_q"] = quart(per["cents"])
    ref = (
        per.groupby(["r_q", "f_q", "m_q"])
        .agg(n_customers=("cents", "count"), total=("cents", "sum"))
        .reset_index()
    )
    got = QUERIES["customer_rfm"](spark, SF_SMALL).toPandas()
    m = got.merge(ref, on=["r_q", "f_q", "m_q"], how="outer")
    assert len(m) == len(got) == len(ref)
    assert (m["n_customers_x"] == m["n_customers_y"]).all()
    for spend, cents in zip(m["total_spend"], m["total"]):
        assert abs(spend - cents / 100.0) < 1e-6


def test_item_item_cosine_reference(spark):
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    baskets = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    deg = baskets.groupby("l_partkey").size()
    pairs = baskets.merge(baskets, on="l_orderkey")
    pairs = pairs[pairs["l_partkey_x"] < pairs["l_partkey_y"]]
    n_both = pairs.groupby(["l_partkey_x", "l_partkey_y"]).size()
    got = QUERIES["item_item_cosine"](spark, SF_SMALL).toPandas()
    for _, r in got.iterrows():
        assert r["n_both"] == n_both[(r["i"], r["j"])]
        assert r["n_i"] == deg[r["i"]] and r["n_j"] == deg[r["j"]]
        ref = r["n_both"] / math.sqrt(deg[r["i"]] * deg[r["j"]])
        assert abs(r["cosine"] - ref) < 1e-12
    # top-k really is the max over all pairs
    best = max(
        n_both[(i, j)] / math.sqrt(deg[i] * deg[j]) for (i, j) in n_both.index
    )
    assert got["cosine"].iloc[0] == pytest.approx(best)


def test_dow_anomalies_reference(spark, events_pdf):
    ev = events_pdf.copy()
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    daily = ev.groupby("day").size().sort_index()
    got = QUERIES["dow_adjusted_anomalies"](spark, SF_SMALL).toPandas()
    for _, r in got.iterrows():
        prior = [
            daily[d]
            for d in daily.index
            if d < r["day_num"] and d % 7 == r["day_num"] % 7
        ]
        assert r["n_prior"] == len(prior) and len(prior) >= 2
        assert r["n_events"] == daily[r["day_num"]]
        exp = sum(prior) / len(prior)
        assert abs(r["expected"] - exp) < 1e-9
        assert bool(r["is_anomaly"]) == (
            daily[r["day_num"]] > 1.5 * exp or daily[r["day_num"]] < exp / 1.5
        )


def test_dayk_retention_reference(spark, events_pdf):
    ev = events_pdf.copy()
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    acts = set(map(tuple, ev[["user_id", "day"]].drop_duplicates().values))
    firsts = ev.groupby("user_id")["day"].min()
    maxd = ev["day"].max()
    got = QUERIES["dayk_retention"](spark, SF_SMALL).toPandas()
    for _, r in got.iterrows():
        k = r["k"]
        elig = firsts[firsts + k <= maxd]
        ret = sum((u, d0 + k) in acts for u, d0 in elig.items())
        assert r["n_eligible"] == len(elig)
        assert r["n_retained"] == ret
