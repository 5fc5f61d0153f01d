"""Driver-sampling rotation ledger.

The per-round correctness driver samples a PREFIX of ``queries()``
(50 entries in recent rounds).  To guarantee every query eventually
carries driver evidence, ``__spark_entry__.py`` must present the
never-sampled and stalest-sampled queries first.  Rounds 3-5 maintained
that head order by hand; this tool makes it mechanical:

    python tools/rotation.py           # print the ledger + suggested head
    python tools/rotation.py --emit    # print a SAMPLE_HEAD literal

It diffs the registered query surface against the union of all
``CORRECTNESS_r*.json`` files in the repo root and orders by
(never-sampled first, then ascending last-sampled round, then
registration order).  ``__spark_entry__.py`` imports ``sample_order``
so the reorder is computed, not hand-maintained.
"""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    from dimagi_data_platform_spark.plans.queries import QUERIES
    from dimagi_data_platform_spark.rotation import (
        last_sampled_rounds,
        sample_order,
    )

    names = list(QUERIES)
    seen = last_sampled_rounds()
    never = [n for n in names if n not in seen]
    stale = sorted((seen[n], n) for n in names if n in seen)
    print(f"registered queries : {len(names)}")
    print(f"driver-sampled ever: {len(names) - len(never)}")
    print(f"never sampled      : {len(never)}")
    for n in never:
        print(f"  never  {n}")
    print("stalest 15:")
    for rnd, n in stale[:15]:
        print(f"  r{rnd}     {n}")
    if "--emit" in sys.argv:
        print("SAMPLE_HEAD (first 50 in rotation order):")
        for n in sample_order(names)[:50]:
            print(f'    "{n}",')


if __name__ == "__main__":
    main()
