"""Randomized cross-checks of operator semantics against independent
pure-Python reference implementations (seeded; many generated cases
batched into ONE Spark job per property so the suite stays fast)."""

from __future__ import annotations

import datetime as dt
import hashlib
import random

from pyspark.sql import functions as F


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_scd2_matches_python_reference_on_random_streams(spark):
    from dimagi_data_platform_spark.operators.scd import scd2_history

    rnd = random.Random(99)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(30):
        for _ in range(rnd.randrange(1, 12)):
            # coarse timestamps force collisions; None attrs exercised
            ts = base + dt.timedelta(hours=rnd.randrange(6))
            attr = rnd.choice(["A", "B", "C", None])
            rows.append((user, ts, eid, attr))
            eid += 1
    obs = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, attr string")
    got = {
        (r.user_id, r.valid_from, r.attr, r.valid_to, r.is_current)
        for r in scd2_history(obs, "user_id", "ts", "attr", "event_id").collect()
    }

    want = set()
    by_user: dict = {}
    for user, ts, e, attr in rows:
        by_user.setdefault(user, []).append((ts, e, attr))
    for user, stream in by_user.items():
        stream.sort(key=lambda x: (x[0], x[1]))
        runs = []
        for ts, _, attr in stream:
            if not runs or runs[-1][1] != attr:
                runs.append([ts, attr])
        for i, (ts, attr) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            want.add((user, ts, attr, nxt, nxt is None))
    assert got == want


def test_pack_documents_matches_python_reference(spark):
    from dimagi_data_platform_spark.operators.packing import pack_documents

    rnd = random.Random(5)
    docs = [(i, "w " * rnd.randrange(1, 300)) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.shard, r.pack_id, r.n_tokens)
        for r in pack_documents(df, budget=256, n_shards=4, seed=42).collect()
    }

    want = set()
    enriched = []
    for i, text in docs:
        h = _md5_60(f"{i}#shard42")
        n_tokens = len(text.strip().split())
        enriched.append((h % 4, h, i, n_tokens))
    for shard in range(4):
        members = sorted([e for e in enriched if e[0] == shard], key=lambda e: (e[1], e[2]))
        pack_id, acc = 0, 0
        for _, _, doc_id, n_tokens in members:
            if pack_id == 0 or acc + n_tokens > 256:
                pack_id += 1
                acc = n_tokens
            else:
                acc += n_tokens
            want.add((doc_id, shard, pack_id, n_tokens))
    assert got == want


def test_winnow_fingerprints_match_python_reference(spark):
    from dimagi_data_platform_spark.operators.fingerprint import winnow_fingerprints

    rnd = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd"]  # tiny vocab → repeated grams
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(1, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict = {}
    for r in winnow_fingerprints(df, k=3, window=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)

    for i, text in docs:
        toks = text.split()
        hashes = [
            _md5_60(" ".join(toks[j : j + 3])) for j in range(len(toks) - 2)
        ]
        if not hashes:
            want: set = set()
        elif len(hashes) < 4:
            want = {min(hashes)}
        else:
            want = {min(hashes[j : j + 4]) for j in range(len(hashes) - 3)}
        assert got.get(i, set()) == want, f"doc {i}"


def test_shard_assign_matches_python_hash(spark):
    from dimagi_data_platform_spark.operators.packing import shard_assign

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    got = {(r.doc_id, r.shard) for r in shard_assign(df, n_shards=8, seed=42).collect()}
    want = {(i, _md5_60(f"{i}#shard42") % 8) for i in range(500)}
    assert got == want


def test_mixture_weights_invariants(spark):
    """The reweighting contract: the most over-demanded stratum caps at
    rate exactly 1.0, every rate is in (0, 1], and kept tokens are
    proportional to the target shares (that IS hitting the target mix
    with maximal data retention)."""
    from dimagi_data_platform_spark.plans.queries import QUERIES, _LANG_TARGET
    from tests.conftest import SF_SMALL

    rows = QUERIES["corpus_mixture_weights"](spark, SF_SMALL).collect()
    rates = {r.lang: r.accept_rate for r in rows}
    assert max(rates.values()) == 1.0
    assert all(0.0 < v <= 1.0 for v in rates.values())
    kept = {r.lang: r.kept_tokens for r in rows}
    total_kept = sum(kept.values())
    for lang, k in kept.items():
        assert abs(k / total_kept - _LANG_TARGET[lang]) < 1e-9


def test_asof_join_directions_match_python_reference(spark):
    """Randomized streams with duplicate timestamps: both directions
    must match the brute-force definition (nearest right row on the
    inclusive side; among equal-ts right rows the greatest tiebreak)."""
    from dimagi_data_platform_spark.operators.asof import asof_join

    rnd = random.Random(77)
    base = dt.datetime(2024, 1, 1)
    lrows, rrows = [], []
    for user in range(20):
        for i in range(rnd.randrange(1, 8)):
            lrows.append(
                (user, base + dt.timedelta(minutes=rnd.randrange(60)),
                 user * 100 + i)
            )
        for j in range(rnd.randrange(0, 8)):
            rrows.append(
                (user, base + dt.timedelta(minutes=rnd.randrange(60)),
                 user * 1000 + j)
            )
    left = spark.createDataFrame(lrows, "user_id int, l_ts timestamp, lid int")
    right = spark.createDataFrame(
        rrows, "user_id int, r_ts timestamp, rid int"
    ).withColumn("matched_rid", F.col("rid"))

    for direction in ("backward", "forward"):
        got = {
            r.lid: r.matched_rid
            for r in asof_join(
                left, right, ["user_id"], "l_ts", "r_ts", ["matched_rid"],
                right_tiebreak="rid", direction=direction,
            ).collect()
        }
        want = {}
        for user, lts, lid in lrows:
            if direction == "backward":
                cand = [(ts, rid) for (u, ts, rid) in rrows
                        if u == user and ts <= lts]
                best = max(cand, key=lambda x: (x[0], x[1]), default=None)
            else:
                cand = [(ts, rid) for (u, ts, rid) in rrows
                        if u == user and ts >= lts]
                # nearest later ts; among ties the greatest tiebreak
                best = min(cand, key=lambda x: (x[0], -x[1]), default=None)
            want[lid] = best[1] if best else None
        assert got == want, direction


def test_operators_accept_empty_inputs(spark):
    """Empty relations must flow through the operator surface without
    errors — the degenerate partition every 100 TB run contains."""
    from dimagi_data_platform_spark.operators.asof import asof_join
    from dimagi_data_platform_spark.operators.components import (
        connected_components,
    )
    from dimagi_data_platform_spark.operators.minhash import minhash_dedup_pairs
    from dimagi_data_platform_spark.operators.sessionize import sessionize

    empty_ev = spark.createDataFrame(
        [], "user_id int, ts timestamp, event_id int"
    )
    assert sessionize(empty_ev, "user_id", "ts", 1800, tie_break="event_id").count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_dedup_pairs(empty_docs).count() == 0
    left = spark.createDataFrame([(1, dt.datetime(2024, 1, 1), 1)],
                                 "user_id int, l_ts timestamp, lid int")
    empty_right = spark.createDataFrame(
        [], "user_id int, r_ts timestamp, matched_ts timestamp"
    )
    out = asof_join(left, empty_right, ["user_id"], "l_ts", "r_ts", ["matched_ts"])
    assert [r.matched_ts for r in out.collect()] == [None]
    verts = spark.createDataFrame([(1,), (2,)], "id long")
    empty_edges = spark.createDataFrame([], "src long, dst long")
    labels = {r.id: r.component for r in
              connected_components(verts, empty_edges).collect()}
    assert labels == {1: 1, 2: 2}


def test_interval_concurrency_random_streams_vs_reference(spark):
    """Randomized sweep-line cross-check: heavy ts collisions (coarse
    grid) + zero-length intervals, validated against a pure-Python
    event sweep with the same (ts, starts-first) tie rule."""
    import datetime as dt

    from dimagi_data_platform_spark.operators.intervals import (
        interval_concurrency,
    )

    rnd = random.Random(17)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for _ in range(800):
        lo = base + dt.timedelta(seconds=rnd.randrange(500))
        hi = lo + dt.timedelta(seconds=rnd.randrange(20))  # 0-length included
        rows.append((lo, hi))
    df = spark.createDataFrame(rows, "lo timestamp, hi timestamp")
    got = {
        (r.ts, r.delta): r.concurrency
        for r in interval_concurrency(df, "lo", "hi").collect()
    }

    events: dict = {}
    for lo, hi in rows:
        events[(lo, 1)] = events.get((lo, 1), 0) + 1
        events[(hi, -1)] = events.get((hi, -1), 0) - 1
    run = 0
    want = {}
    for (ts, sign), delta in sorted(events.items(), key=lambda kv: (kv[0][0], -kv[0][1])):
        run += delta
        want[(ts, delta)] = run
    assert got == want
    assert min(got.values()) >= 0


def test_pagerank_mass_conservation_random_graphs(spark):
    """Total fixed-point mass stays within the floor-leak envelope:
    at most one 1e-15 unit lost per (vertex, incident division) per
    iteration — i.e. the ranks still sum to ~1."""
    from dimagi_data_platform_spark.operators.graph import pagerank

    rnd = random.Random(23)
    n = 40
    edges = list({(rnd.randrange(n), rnd.randrange(n)) for _ in range(200)})
    edges = [(a, b) for a, b in edges if a != b]
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    total = sum(r.r for r in pagerank(v, e, n_iter=12).collect())
    assert 0.999 < total / 1e15 <= 1.0 + 1e-12


def test_global_prefix_sums_match_pandas_reference(spark):
    """global_prefix_sums must equal a single-threaded cumulative sum
    for random multisets — including duplicate-free and heavily-skewed
    key distributions, and regardless of how many range buckets the
    frozen boundaries produce."""
    from dimagi_data_platform_spark.operators.linkage import global_prefix_sums

    rnd = random.Random(13)
    rows = [
        (rnd.randint(0, 50) if i % 3 else 7, rnd.randint(-5, 5), rnd.randint(0, 9))
        for i in range(500)
    ]
    # distinct-value grain (the documented contract: order_cols total-order)
    per = {}
    for v, a, b in rows:
        pa, pb = per.get(v, (0, 0))
        per[v] = (pa + a, pb + b)
    df = spark.createDataFrame(
        [(v, a, b) for v, (a, b) in per.items()], "v long, a long, b long"
    ).repartition(7)
    out = {
        r.v: (r.cum_a, r.cum_b)
        for r in global_prefix_sums(df, ["v"], ["a", "b"]).collect()
    }
    ca = cb = 0
    for v in sorted(per):
        ca += per[v][0]
        cb += per[v][1]
        assert out[v] == (ca, cb), f"prefix mismatch at {v}"


def test_unigram_train_matches_python_reference(spark):
    """Unigram-LM hard-EM must agree EXACTLY with a single-threaded
    reference (same candidate set, fixed-point log-probs, Viterbi
    tie-breaks) on a small corpus — and be reproducible across runs."""
    import math

    from dimagi_data_platform_spark.operators.unigram_lm import (
        LOG_SCALE,
        _viterbi,
        unigram_train,
    )

    texts = [
        "the cat sat on the mat",
        "the cats sat on mats",
        "matting the mat with cats",
        "a cat and a mat",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.piece, r.piece_count, r.logp)
        for r in unigram_train(docs, vocab_size=15, n_iter=2).collect()
    ]
    again = [
        (r.piece, r.piece_count, r.logp)
        for r in unigram_train(docs, vocab_size=15, n_iter=2).collect()
    ]
    assert got == again, "training must be reproducible"

    # pure-Python reference of the same pipeline
    words: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            words[w] = words.get(w, 0) + 1
    cand: dict[str, int] = {}
    for w, f in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + 6) + 1):
                cand[w[i:j]] = cand.get(w[i:j], 0) + f
    chars = {p: c for p, c in cand.items() if len(p) == 1}
    longer = dict(
        sorted(
            ((p, c) for p, c in cand.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:2000]
    )
    weights = {**chars, **longer}

    def logtable(ws):
        tot = float(sum(ws.values()))
        return {
            p: math.floor(math.log(c / tot) * LOG_SCALE)
            for p, c in ws.items()
        }

    table = logtable(weights)
    for _ in range(2):
        acc: dict[str, int] = {}
        for w, f in words.items():
            for p in _viterbi(w, table, 6):
                acc[p] = acc.get(p, 0) + f
        for p in chars:
            acc.setdefault(p, 1)
        weights = acc
        table = logtable(weights)
    ref_chars = [(p, c, table[p]) for p, c in weights.items() if len(p) == 1]
    ref_top = sorted(
        ((p, c, table[p]) for p, c in weights.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:15]
    want = sorted(ref_chars + ref_top, key=lambda x: (-x[1], x[0]))
    assert got == want
