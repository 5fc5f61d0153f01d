"""Driver-sampling rotation order (see ``tools/rotation.py`` for the
human-facing ledger).

The correctness driver samples a prefix of ``queries()``; to guarantee
every query eventually carries driver evidence, ``__spark_entry__.py``
presents never-sampled queries first, then stalest-sampled (ascending
last-sampled round), with registration order as the tie-break.  The
evidence source is the union of ``CORRECTNESS_r*.json`` files committed
at the repo root — if none are readable (fresh clone without round
artifacts) the order degrades gracefully to registration order.
"""

from __future__ import annotations

import glob
import json
import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_sampled_rounds(repo: str = _REPO) -> dict[str, int]:
    """query name -> most recent round whose driver sampled it."""
    seen: dict[str, int] = {}
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
        for key in data:
            seen[key] = max(seen.get(key, 0), rnd)
    return seen


def sample_order(names: list[str], repo: str = _REPO) -> list[str]:
    """Rotation order: never-sampled first, then stalest round,
    registration order as tie-break."""
    seen = last_sampled_rounds(repo)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (seen.get(n, -1), pos[n]))
