"""Driver-sampling rotation order (see ``tools/rotation.py`` for the
human-facing ledger).

The correctness driver samples a prefix of ``queries()``; to guarantee
every query eventually carries driver evidence, ``__spark_entry__.py``
presents queries whose LAST sample failed and is now fixable first
(an err/mismatch must be re-checked promptly, not parked behind the
rotation), then never-sampled queries, then stalest-sampled (ascending
last-sampled round), with registration order as the tie-break.  A
``no_oracle`` err on a query that STILL has no oracle entry is
by-design rows-only, not a failure — once it has driver evidence it
moves to the BACK of the order (VERDICT r11 item 8): re-sampling it
can only re-record the same ``err: no_oracle`` ledger line (the
rows-only check adds nothing beyond its in-repo exact-reference
tests), so the sample slot goes to an oracle-backed query instead.
It stays registered and ordered (never hidden): a fresh clone with no
ledger, or a new rows-only query, still gets its first driver sample
through the never-sampled tier.  The evidence
source is the union of ``CORRECTNESS_r*.json`` files committed at the
repo root — if none are readable (fresh clone without round artifacts)
the order degrades gracefully to registration order.
"""

from __future__ import annotations

import glob
import json
import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_MATCH_KEYS = ("rows_match", "schema_match", "hash_match")


def _ledger(repo: str = _REPO) -> dict[str, tuple[int, dict]]:
    """query name -> (most recent round sampled, that round's record)."""
    seen: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for key, rec in data.items():
            if key not in seen or rnd > seen[key][0]:
                seen[key] = (rnd, rec if isinstance(rec, dict) else {})
    return seen


def last_sampled_rounds(repo: str = _REPO) -> dict[str, int]:
    """query name -> most recent round whose driver sampled it."""
    return {k: rnd for k, (rnd, _) in _ledger(repo).items()}


def needs_resample(name: str, rec: dict) -> bool:
    """True when the last driver sample of this query failed in a way a
    fresh sample could now resolve: an explicit value/schema/row
    mismatch, or any err other than a (still-true) missing oracle."""
    if any(rec.get(k) is False for k in _MATCH_KEYS):
        return True
    err = rec.get("err")
    if err is None:
        return False
    if err == "no_oracle":
        try:
            from dimagi_data_platform_spark.plans.oracle import ORACLE
        except Exception:  # pragma: no cover - defensive import guard
            return True
        return name in ORACLE
    return True


def _is_rows_only(name: str, rec: dict) -> bool:
    """Sampled before, recorded as no_oracle, and STILL has no oracle
    entry: by-design rows-only with standing driver evidence."""
    if rec.get("err") != "no_oracle":
        return False
    try:
        from dimagi_data_platform_spark.plans.oracle import ORACLE
    except Exception:  # pragma: no cover - defensive import guard
        return False
    return name not in ORACLE


def touched_rounds(repo: str = _REPO) -> dict[str, int]:
    """query name -> round in which its IMPLEMENTATION last changed
    (committed ledger ``TOUCHED_QUERIES.json``, maintained alongside
    any semantic edit to a registered query). A query touched after
    its last driver sample carries STALE evidence — the green hash in
    the ledger predates the code now running — so the rotation fronts
    it for re-verification (r13; previously a changed query could hide
    behind its old green sample for many rounds)."""
    path = os.path.join(repo, "TOUCHED_QUERIES.json")
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return {}
    return {k: int(v) for k, v in data.items()}


def sample_order(names: list[str], repo: str = _REPO) -> list[str]:
    """Rotation order: fixable-failure resamples first, then queries
    modified after their last driver sample (stale evidence), then
    never-sampled, then stalest round, then (last) rows-only queries
    that already carry driver evidence; registration order ties."""
    ledger = _ledger(repo)
    touched = touched_rounds(repo)
    pos = {n: i for i, n in enumerate(names)}
    back = 10**6  # after every real round number

    def key(n: str) -> tuple[int, int]:
        if n not in ledger:
            return (-1, pos[n])
        rnd, rec = ledger[n]
        if needs_resample(n, rec):
            return (-3, pos[n])
        if touched.get(n, -1) > rnd:
            return (-2, pos[n])
        if _is_rows_only(n, rec):
            return (back + rnd, pos[n])
        return (rnd, pos[n])

    return sorted(names, key=key)
