"""BPE training: the Spark iterative loop must reproduce a direct
Python reference implementation (independent code path — dict-based
pair counting + list-based merge) on a vocabulary with ties,
overlapping pairs, and back-to-back merge sites."""

from __future__ import annotations

from dimagi_data_platform_spark.operators.bpe import bpe_segment, bpe_train


def _ref_bpe(vocab: dict[str, int], n_merges: int):
    """Reference BPE (Sennrich et al. 2016 pseudo-code): words as
    symbol tuples; merge left-to-right non-overlapping."""
    segs = {tuple(w): f for w, f in vocab.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in segs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # argmax with (count desc, pair asc) tie-break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((a, b, a + b, c))
        out = {}
        for syms, f in segs.items():
            new = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + f
        segs = out
    return merges, segs


VOCAB = {
    "low": 5,
    "lower": 2,
    "newest": 6,
    "widest": 3,
    "aaa": 4,  # overlapping pair site: (a,a) counts 2/word, merges once
    "abab": 2,  # back-to-back merge sites
}


def test_bpe_train_matches_reference(spark):
    wf = spark.createDataFrame(
        [(w, f) for w, f in VOCAB.items()], ["w", "freq"]
    )
    got = [
        (r["a"], r["b"], r["merged"], r["pair_count"])
        for r in bpe_train(wf, 6).orderBy("step").collect()
    ]
    want, _ = _ref_bpe(VOCAB, 6)
    assert got == want


def test_bpe_segment_applies_learned_merges(spark):
    wf = spark.createDataFrame(
        [(w, f) for w, f in VOCAB.items()], ["w", "freq"]
    )
    merges, ref_segs = _ref_bpe(VOCAB, 6)
    out = bpe_segment(wf, [(a, b) for a, b, _, _ in merges])
    got = {}
    for r in out.collect():
        got[tuple(r["symbols"])] = got.get(tuple(r["symbols"]), 0) + r["freq"]
    assert got == ref_segs


def test_bpe_overlap_semantics(spark):
    # "aaaa" with pair (a,a): count 3 occurrences, merge produces
    # (aa, aa) — left-to-right non-overlap, never (a, aa, a)
    wf = spark.createDataFrame([("aaaa", 1)], ["w", "freq"])
    rows = bpe_train(wf, 2).orderBy("step").collect()
    assert (rows[0]["a"], rows[0]["b"], rows[0]["pair_count"]) == ("a", "a", 3)
    assert (rows[1]["a"], rows[1]["b"]) == ("aa", "aa")


def test_bpe_random_vocabs_match_reference(spark):
    """Randomized equivalence: small random vocabularies over a tiny
    alphabet (maximizing tie/overlap/adjacent-merge cases) must
    reproduce the reference merges exactly."""
    import random

    rng = random.Random(7)
    for trial in range(4):
        vocab = {}
        for _ in range(rng.randint(4, 10)):
            w = "".join(
                rng.choice("ab") for _ in range(rng.randint(2, 7))
            )
            vocab[w] = vocab.get(w, 0) + rng.randint(1, 9)
        n_merges = rng.randint(1, 5)
        want, _ = _ref_bpe(vocab, n_merges)
        wf = spark.createDataFrame(list(vocab.items()), ["w", "freq"])
        got = [
            (r["a"], r["b"], r["merged"], r["pair_count"])
            for r in bpe_train(wf, n_merges).orderBy("step").collect()
        ]
        assert got == want, f"trial {trial}: vocab={vocab} n={n_merges}"
