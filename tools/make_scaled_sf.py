"""Build a scaled-up copy of /root/testdata/sf0.1 for scale-curve
benchmarking (the driver ships sf<=0.1; the r5 VERDICT asked for an
sf1 evidence point showing the per-query scaling factors).

    python tools/make_scaled_sf.py [--mult 10] [--out .artifacts/sf1]

Method: MULT deterministic key-shifted replicas of every fact table
(dims region/nation stay as-is), constructed so the per-replica
distributions match sf0.1 exactly and replicas don't interact:

- every key domain shifts by ``replica * stride`` (FKs consistently),
  so joins/groupBys grow linearly and the co-purchase graph becomes
  MULT disjoint copies — graph workloads scale linearly, as a real
  10x corpus would;
- document text gets a per-replica token remap (every token suffixed
  ``zq<letter>`` for k>0 — alphabetic-only so remapped tokens
  still match the ``^[a-z]+$`` word filters used by the quality and
  tokenizer queries), so replicas share ZERO shingles: within-replica
  similarity structure is preserved exactly while cross-replica
  near-dup pairs don't explode superlinearly (replicating identical
  text would square the pair counts and measure a different problem);
- embeddings for k>0 are fresh hash-derived uniform vectors (labels
  kept), for the same reason in cosine space;
- name-carrying dims (customer, part) get distinctive per-replica
  word suffixes so blocked fuzzy-linkage candidates stay bounded.

Deterministic (hash-based, no RNG state), idempotent (overwrites).
NOT TPC-H sf1 semantics — it is "the same workload at 10x rows",
which is exactly what the scaling curve needs.
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# per-replica suffix words for name columns: pairwise edit distance
# >= 4 so blocked edit-distance linkage never pairs across replicas
WORDS = [
    "", "alphaq", "bravox", "charlie", "deltaz", "echoxy",
    "foxtrot", "golfpq", "hotelw", "juliett", "kilovn", "limabc",
    "mikedf", "novemb", "oscarj", "papahg", "quebec", "romeok",
    "sierra", "tangou",
]

STRIDE = {
    "cust": 1_000_000,
    "supp": 1_000_000,
    "part": 1_000_000,
    "order": 10_000_000,
    "event": 10_000_000,
    "user": 1_000_000,
    "doc": 1_000_000,
    "vec": 1_000_000,
}


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _gen_words(n: int) -> list[str]:
    """Per-replica name-suffix words for ANY mult: the first 20 are the
    frozen literals above (so an sf1 rebuild stays byte-identical),
    the rest are doubled-letter base-26 codes with a parity digit (two
    distinct codes differ in >= 2 digit positions, so the doubled
    6-char words differ in >= 4 character positions). The pairwise
    edit-distance >= 4 contract the blocked-linkage queries depend on
    is VERIFIED at generation time, including against the literals."""
    words = list(WORDS)
    i = 0
    while len(words) < n:
        d1, d2 = (i // 26) % 26, i % 26
        p = (d1 + d2) % 26
        words.append("".join(2 * chr(97 + d) for d in (d1, d2, p)))
        i += 1
    ws = [w for w in words[:n] if w]
    for x in range(len(ws)):
        for y in range(x + 1, len(ws)):
            assert _lev(ws[x], ws[y]) >= 4, (ws[x], ws[y])
    return words[:n]


def _rletter(r: int) -> str:
    """Replica token-suffix code: base-26 letters (matches the legacy
    single chr(97+r) for r < 26, stays alphabetic for any r)."""
    if r == 0:
        return "a"
    s = ""
    while r:
        s = chr(97 + r % 26) + s
        r //= 26
    return s


def build(out: str, mult: int) -> None:
    global WORDS
    WORDS = _gen_words(max(mult, 1))
    con = duckdb.connect()
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    def reps(sql_tpl: str, name: str) -> None:
        parts = " UNION ALL ".join(sql_tpl.format(r=r, rl=_rletter(r)) for r in range(mult))
        con.execute(
            f"COPY ({parts}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    reps(
        f"""SELECT c_custkey + {{r}} * {STRIDE['cust']} AS c_custkey,
               c_name || (CASE WHEN {{r}} = 0 THEN '' ELSE ' ' || ['{"','".join(WORDS)}'][{{r}} + 1] END) AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet'""",
        "customer",
    )
    reps(
        f"""SELECT s_suppkey + {{r}} * {STRIDE['supp']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet'""",
        "supplier",
    )
    reps(
        f"""SELECT p_partkey + {{r}} * {STRIDE['part']} AS p_partkey,
               p_name || (CASE WHEN {{r}} = 0 THEN '' ELSE ' ' || ['{"','".join(WORDS)}'][{{r}} + 1] END) AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet'""",
        "part",
    )
    reps(
        f"""SELECT o_orderkey + {{r}} * {STRIDE['order']} AS o_orderkey,
               o_custkey + {{r}} * {STRIDE['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""",
        "orders",
    )
    reps(
        f"""SELECT l_orderkey + {{r}} * {STRIDE['order']} AS l_orderkey,
               l_partkey + {{r}} * {STRIDE['part']} AS l_partkey,
               l_suppkey + {{r}} * {STRIDE['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""",
        "lineitem",
    )
    reps(
        f"""SELECT event_id + {{r}} * {STRIDE['event']} AS event_id, ts,
               user_id + {{r}} * {STRIDE['user']} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet'""",
        "events",
    )
    # token remap for k>0: replicas share no shingles
    reps(
        f"""SELECT doc_id + {{r}} * {STRIDE['doc']} AS doc_id,
               CASE WHEN {{r}} = 0 THEN text
                    ELSE array_to_string(
                      list_transform(regexp_split_to_array(text, ' '),
                                     x -> x || 'zq{{rl}}'), ' ')
               END AS text,
               lang, source,
               CAST(CASE WHEN {{r}} = 0 THEN n_chars
                    ELSE length(array_to_string(
                      list_transform(regexp_split_to_array(text, ' '),
                                     x -> x || 'zq{{rl}}'), ' '))
               END AS BIGINT) AS n_chars
        FROM '{SRC}/documents.parquet'""",
        "documents",
    )
    # fresh hash-derived uniform [-1.7, 1.7] vectors for k>0 (labels
    # kept): cross-replica cosines concentrate near 0, far below the
    # 0.35 near-dup threshold, so pair counts scale linearly
    reps(
        f"""SELECT vec_id + {{r}} * {STRIDE['vec']} AS vec_id,
               CASE WHEN {{r}} = 0 THEN embedding
                    ELSE list_transform(range(1, 65), i ->
                      CAST(1.7 * ((CAST(hash(vec_id * 64 + i + {{r}} * 131071) % 2000001 AS DOUBLE)
                            / 1000000.0) - 1.0) AS FLOAT))
               END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet'""",
        "embeddings",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, ".artifacts", "sf1"))
    a = ap.parse_args()
    if not 1 <= a.mult <= 500:
        raise SystemExit("--mult must be in [1, 500]")
    build(a.out, a.mult)
    print("done:", a.out)


if __name__ == "__main__":
    main()
