"""The driver samples a prefix of queries(); the rotation module must
order never-sampled queries first so every query eventually carries
driver evidence (VERDICT r5 item 7 — mechanical rotation ledger)."""

from __future__ import annotations

import json
import os

from dimagi_data_platform_spark.rotation import last_sampled_rounds, sample_order


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
        # the only sampled queries allowed to precede a never-sampled
        # one are fixable-failure resamples (the r7 priority tier)
        first_unsampled = next(
            (i for i, n in enumerate(names) if n not in seen), len(names)
        )
        assert all(
            needs_resample(n, ledger[n][1]) for n in names[:first_unsampled]
        )
        # and after the last never-sampled query, order is by staleness
        first_sampled_tail = next(
            (
                i
                for i, n in enumerate(names)
                if n in seen and not needs_resample(n, ledger[n][1])
            ),
            len(names),
        )
        assert all(n in seen for n in names[first_sampled_tail:])


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
