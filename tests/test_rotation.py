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

    rotated = entrymod.queries()
    assert set(rotated) == set(QUERIES)
    seen = last_sampled_rounds()
    if os.path.exists(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CORRECTNESS_r01.json")
    ):
        names = list(rotated)
        # no sampled query may precede a never-sampled one
        first_sampled = next((i for i, n in enumerate(names) if n in seen), len(names))
        assert all(n in seen for n in names[first_sampled:])
