"""The driver samples a prefix of queries(); the rotation module must
order never-sampled queries first so every query eventually carries
driver evidence (VERDICT r5 item 7 — mechanical rotation ledger)."""

from __future__ import annotations

import json
import os

from dimagi_data_platform_spark.rotation import (
    _ledger as _rot_ledger,
    last_sampled_rounds,
    needs_resample,
    sample_order,
)


def test_never_sampled_come_first(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"a": {}, "b": {}}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"b": {}, "c": {}}))
    order = sample_order(["a", "b", "c", "d", "e"], repo=str(tmp_path))
    # d/e never sampled -> first (registration order); a stalest (r1);
    # b and c both last seen r2.
    assert order == ["d", "e", "a", "b", "c"]


def test_graceful_without_ledger(tmp_path):
    assert sample_order(["x", "y"], repo=str(tmp_path)) == ["x", "y"]
    assert last_sampled_rounds(str(tmp_path)) == {}


def test_entry_surface_is_rotated_and_complete():
    import __spark_entry__ as entrymod
    from dimagi_data_platform_spark.plans.queries import QUERIES

    from dimagi_data_platform_spark.rotation import _ledger, needs_resample

    rotated = entrymod.queries()
    assert set(rotated) == set(QUERIES)
    seen = last_sampled_rounds()
    if os.path.exists(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CORRECTNESS_r01.json")
    ):
        names = list(rotated)
        ledger = _ledger()
        # tier order must be monotone: fixable-failure resamples (0),
        # then never-sampled (1), then sampled-clean (2) — and with a
        # complete all-green ledger (every query sampled, none failing)
        # every tier may be empty except the clean tail (VERDICT r7
        # item 1: the old prefix-slice assertion was vacuously false
        # in exactly that state).
        from dimagi_data_platform_spark.rotation import (
            _is_rows_only,
            touched_rounds,
        )

        touched = touched_rounds()

        def tier(n: str) -> int:
            if n not in seen:
                return 2  # never-sampled
            if needs_resample(n, ledger[n][1]):
                return 0
            if touched.get(n, -1) > ledger[n][0]:
                return 1  # modified after last sample: stale evidence
            # evidenced rows-only queries sort behind every oracle-
            # backed query (VERDICT r11 item 8): a re-sample can only
            # re-record err: no_oracle
            return 4 if _is_rows_only(n, ledger[n][1]) else 3

        tiers = [tier(n) for n in names]
        assert tiers == sorted(tiers)
        # within the sampled-clean and rows-only tails, order is by
        # staleness
        for t_want in (3, 4):
            rounds = [seen[n] for n, t in zip(names, tiers) if t == t_want]
            assert rounds == sorted(rounds)
        # the rows-only tail is exactly the no-oracle set with evidence
        rows_only = [n for n, t in zip(names, tiers) if t == 4]
        assert rows_only, "expected at least one evidenced rows-only query"
        from dimagi_data_platform_spark.plans.oracle import ORACLE
        assert all(n not in ORACLE for n in rows_only)


def test_complete_all_green_ledger_orders_by_staleness(tmp_path):
    """Regression (VERDICT r7 item 1): when EVERY query has been
    sampled and none needs a resample, the rotation is pure staleness
    order — no assertion may demand a resample tier that cannot
    exist."""
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"a": green, "b": green}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"c": green}))
    order = sample_order(["a", "b", "c"], repo=str(tmp_path))
    assert order == ["a", "b", "c"]
    ledger = _rot_ledger(str(tmp_path))
    assert not any(needs_resample(n, ledger[n][1]) for n in order)


def test_failed_last_sample_resamples_first(tmp_path):
    """A query whose LAST sample failed (hash mismatch, or a no_oracle
    err on a query that NOW has an oracle) must head the rotation; a
    no_oracle err on a still-oracle-less query stays in staleness
    order (ADVICE r6)."""
    from dimagi_data_platform_spark.plans.oracle import ORACLE

    oracled = sorted(ORACLE)[0]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "bad": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
                oracled: {"hash_match": None, "err": "no_oracle"},
                "rows_only_forever": {"hash_match": None, "err": "no_oracle"},
                "clean": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            }
        )
    )
    names = ["clean", "rows_only_forever", oracled, "bad", "fresh"]
    order = sample_order(names, repo=str(tmp_path))
    # priority tier: bad (mismatch) and the now-oracled query, in
    # registration order; then never-sampled fresh; then staleness.
    assert order == [oracled, "bad", "fresh", "clean", "rows_only_forever"]


def test_touched_queries_front_ahead_of_stale(tmp_path):
    """A query modified AFTER its last driver sample carries stale
    evidence and must re-front (after failures, before never-sampled
    is acceptable either way — pinned here: failures, touched, never-
    sampled, clean)."""
    import json

    from dimagi_data_platform_spark.rotation import sample_order

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "clean": {"rows_match": True, "schema_match": True, "hash_match": True},
        "touched_q": {"rows_match": True, "schema_match": True, "hash_match": True},
        "failed": {"rows_match": True, "schema_match": True, "hash_match": False},
    }))
    (tmp_path / "TOUCHED_QUERIES.json").write_text(json.dumps({
        "touched_q": 2,
        "clean": 1,  # touched in the same round it was sampled: NOT stale
    }))
    order = sample_order(
        ["clean", "touched_q", "new_q", "failed"], repo=str(tmp_path)
    )
    assert order == ["failed", "touched_q", "new_q", "clean"]
