"""Unigram-LM (SentencePiece-style) tokenizer TRAINING on Spark.

The third tokenizer-training capability next to BPE training
(operators/bpe.py) and WordPiece application (functions/tokenizer.py):
EM over a subword vocabulary — the E-step Viterbi-segments every
distinct word under the current piece log-probs and accumulates
expected piece counts (hard-EM, as in the common SentencePiece
configuration), the M-step renormalizes counts into new log-probs.

Spark-first shape:

- The unit of work is the DISTINCT WORD (weighted by corpus
  frequency), so E-step cost scales with vocabulary-of-words, not
  corpus tokens — the same grain the BPE trainer uses. Each word's
  Viterbi DP runs in an Arrow ``mapInPandas`` kernel with the (small)
  piece table broadcast; partial piece counts aggregate map-side.
- Candidate generation (all substrings up to ``max_sub_len``) and the
  M-step are pure JVM expressions (``sequence``/``transform`` explode,
  groupBy sum, one quantized ``log`` per piece).
- Determinism: piece log-probs are FIXED-POINT ints
  (floor(scale * ln p), the same ln-table contract as the survival /
  perplexity queries), DP scores are integer sums, and ties break by
  (score, fewer pieces, lexicographic piece sequence) — so training is
  bitwise-reproducible across partitionings. Checked against a pure
  Python reference in tests/test_properties.py; the driver check is
  rows-only (per-word DP is not SQL-expressible).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.text import tokens

LOG_SCALE = 1_000_000


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _candidate_pieces(
    words: DataFrame, max_sub_len: int, max_candidates: int
) -> DataFrame:
    """(piece, weight): all substrings of length <= max_sub_len over the
    distinct-word table, weighted by word frequency; single characters
    are always kept (the fallback alphabet), longer pieces keep the
    ``max_candidates`` heaviest. Substring explode is pure JVM."""
    subs = F.flatten(
        F.expr(
            f"""transform(sequence(1, length(w)), i ->
                  transform(sequence(i, least(length(w), i + {max_sub_len} - 1)),
                            j -> substring(w, i, j - i + 1)))"""
        )
    )
    weighted = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("weight"))
    )
    chars = weighted.filter(F.length("piece") == 1)
    longer = (
        weighted.filter(F.length("piece") > 1)
        .orderBy(F.desc("weight"), "piece")
        .limit(max_candidates)
    )
    return chars.unionByName(longer)


def _logprob_table(counts: DataFrame) -> DataFrame:
    """M-step: fixed-point log-probs floor(scale*ln(count/total));
    pieces with zero expected count keep a floor penalty so the
    fallback alphabet never disappears."""
    tot = counts.agg(F.sum("weight").cast("double").alias("tot"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.floor(
            F.log(F.col("weight").cast("double") / F.col("tot"))
            * F.lit(float(LOG_SCALE))
        )
        .cast("long")
        .alias("logp"),
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    max_sub_len: int = 6,
    vocab_size: int = 200,
    n_iter: int = 2,
    max_candidates: int = 2000,
) -> DataFrame:
    """Train a unigram tokenizer; returns the final vocabulary
    (piece, piece_count, logp) — top ``vocab_size`` pieces by expected count
    (ties on piece), single-character pieces always retained."""
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    words = _word_freqs(docs, text_col).repartition(par).localCheckpoint()
    table = _logprob_table(
        _candidate_pieces(words, max_sub_len, max_candidates)
    )

    def estep_counts(logp: dict[str, int], msl: int):
        def run(batches):
            for pdf in batches:
                acc: dict[str, int] = {}
                for w, freq in zip(pdf["w"], pdf["freq"]):
                    pieces = _viterbi(w, logp, msl)
                    for p in pieces:
                        acc[p] = acc.get(p, 0) + int(freq)
                if acc:
                    yield pd.DataFrame(
                        {"piece": list(acc), "cnt": list(acc.values())}
                    )

        return run

    for _ in range(n_iter):
        logp = {r.piece: r.logp for r in table.collect()}
        partials = words.mapInPandas(
            estep_counts(logp, max_sub_len), schema="piece string, cnt long"
        )
        counts = partials.groupBy("piece").agg(
            F.sum("cnt").cast("long").alias("weight")
        )
        # fallback alphabet survives even at zero count (weight 1)
        alphabet = (
            table.filter(F.length("piece") == 1)
            .select("piece")
            .join(counts, "piece", "left_anti")
            .select("piece", F.lit(1).cast("long").alias("weight"))
        )
        counts = counts.unionByName(alphabet).localCheckpoint()
        table = _logprob_table(counts)
    final = counts.join(table, "piece")
    keep_chars = final.filter(F.length("piece") == 1)
    keep_top = (
        final.filter(F.length("piece") > 1)
        .orderBy(F.desc("weight"), "piece")
        .limit(vocab_size)
    )
    return (
        keep_chars.unionByName(keep_top)
        .select("piece", F.col("weight").alias("piece_count"), "logp")
        .orderBy(F.desc("piece_count"), "piece")
    )


def _viterbi(word: str, logp: dict[str, int], max_sub_len: int) -> list[str]:
    """Best segmentation of ``word`` under integer piece log-probs.

    DP over end positions; ties break by (higher score, FEWER pieces,
    lexicographically smaller piece ending here) — total order, so the
    result is independent of dict iteration or partitioning. Unknown
    single chars get a large penalty instead of failing (OOV-safe)."""
    n = len(word)
    NEG = -(10**15)
    # (score, neg_pieces, piece_ending_here)
    best: list[tuple] = [(0, 0, "")] + [(NEG, 0, "")] * n
    back = [0] * (n + 1)
    for end in range(1, n + 1):
        for start in range(max(0, end - max_sub_len), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) > 1:
                    continue
                lp = -50 * LOG_SCALE
            prev = best[start]
            if prev[0] <= NEG:
                continue
            cand = (prev[0] + lp, prev[1] - 1, piece)
            cur = best[end]
            if (cand[0], cand[1], _neg_lex(cand[2])) > (
                cur[0],
                cur[1],
                _neg_lex(cur[2]),
            ):
                best[end] = cand
                back[end] = start
    out: list[str] = []
    end = n
    while end > 0:
        start = back[end]
        out.append(word[start:end])
        end = start
    out.reverse()
    return out


class _neg_lex(str):
    """Inverts lexicographic comparison so 'smaller piece wins' can sit
    inside a max() tuple comparison."""

    def __lt__(self, other):  # noqa: D105
        return str.__gt__(self, other)

    def __gt__(self, other):  # noqa: D105
        return str.__lt__(self, other)
