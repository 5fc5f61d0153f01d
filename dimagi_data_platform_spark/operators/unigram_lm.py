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


# --------------------------------------------------------------------------
# Fixed-vocab Viterbi ENCODE — the driver-checkable twin of training
# (the EM loop is not SQL-expressible; segmentation under a LITERAL
# integer-cost vocab is a deterministic DP both engines unroll
# identically, the same twin technique as knn_ivf_flat/knn_ivfpq_flat).
# --------------------------------------------------------------------------

ENCODE_MAX_WORD = 12  # DP unroll depth (positions)
ENCODE_MAX_PIECE = 4  # longest vocab piece
# packed "unreachable" span cost. Must dominate any REAL packed path
# sum — the r13 trainer's data-derived costs reach ~lnq(corpus)·16·12
# ≈ 2.2e9 per word (vs the literal encode vocab's ~4e5), so the old
# 1e9 sentinel could have LOST to a real path and leaked an
# unreachable span into the DP; 1e15 dominates both while 12 chained
# sentinels (1.2e16) still fit int64. The encode outputs are
# unchanged (a sentinel only ever participates in min() comparisons
# it loses).
_ENCODE_SENTINEL = 10**15


def flat_vocab() -> list[tuple[str, int]]:
    """Literal (piece, integer cost) vocabulary shared by the Spark
    query and the DuckDB oracle.  Costs are scaled -log-prob-style
    ints: every a-z char is present (the fallback alphabet, so every
    alpha word is segmentable) around cost ~550; multi-char pieces
    cost ~320/char + jitter, so they usually — not always — beat char
    sums, which keeps the DP's choices non-trivial.  Jitter is seeded,
    so the table is a stable literal."""
    import random

    rnd = random.Random(61)
    vocab: list[tuple[str, int]] = []
    for c in "abcdefghijklmnopqrstuvwxyz":
        vocab.append((c, 500 + rnd.randrange(100)))
    multi = (
        "th he in er an re on at en nd ti es or te of ed is it al ar st to "
        "nt ng se ha as ou io le ve co me de hi ri ro ic ne ea ra ce li ch "
        "ll be ma si om ur "
        "the and ing ion tio ent ati for her ter hat tha ere ate his con "
        "res ver all ons nce men ith ted ers pro thi wit are ess not ive "
        "was ect rea com eve per int est sta cti ica ist ear ain one our "
        "iti rat "
        "tion atio that ther with ment ions this here from ould ting hich "
        "whic ctio ence have othe ight sion ever ical they inte ough ance "
        "were tive over ding nter comp able heir thei ally ated ring ture "
        "cont ents"
    ).split()
    for p in multi:
        vocab.append((p, 320 * len(p) + rnd.randrange(200)))
    return vocab


def unigram_encode_flat(
    docs: DataFrame, text_col: str = "text", top_n: int = 40
) -> DataFrame:
    """Viterbi-segment the corpus vocabulary under the literal
    :func:`flat_vocab` cost table — exact integer DP, bitwise
    SQL-replayable.

    Semantics: for each distinct alphabetic word of length <=
    ``ENCODE_MAX_WORD``, find the segmentation into vocab pieces
    (length <= ``ENCODE_MAX_PIECE``) minimizing (total cost, then
    piece count) — the DP value is the PACKED integer
    ``cost*16 + n_pieces``, so one integer ``min`` realizes the
    lexicographic objective, and remaining ties break to the SHORTEST
    last piece (first-wins backtrack).  Output: the ``top_n`` most
    frequent words (freq desc, word asc) with cost, piece count, and
    the reassembled piece string.

    Spark-first shape: work runs at the DISTINCT-WORD grain (corpus
    tokens collapse in one shuffle — the BPE/unigram trainers' grain);
    span costs come from ONE broadcast join against the literal vocab;
    the pivot back to per-(start, len) columns and the unrolled DP +
    backtrack are scan-local integer codegen.  Nothing about the DP
    depends on corpus size, so the plan scales as groupBy(word) does.
    """
    spark = docs.sparkSession
    L = ENCODE_MAX_WORD
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") <= L))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    vocab = spark.createDataFrame(flat_vocab(), "piece string, cost long")
    cur = _flat_segment(words, vocab)
    out = cur.select(
        "w",
        "freq",
        F.expr("CAST(best DIV 16 AS BIGINT)").alias("total_cost"),
        F.expr("CAST(best % 16 AS BIGINT)").alias("n_pieces"),
        F.col(f"seg_{L}").alias("pieces"),
    )
    return out.orderBy(F.desc("freq"), "w").limit(top_n)


def _flat_segment(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """The shared flat Viterbi DP of :func:`unigram_encode_flat` and
    :func:`unigram_train_unrolled`: segment each (w, freq) row of
    ``words`` (alphabetic, length <= ENCODE_MAX_WORD) under the
    (piece, cost) table ``vocab`` (non-negative integer costs, pieces
    <= ENCODE_MAX_PIECE chars), minimizing (total cost, piece count)
    via the packed integer ``cost*16 + n_pieces``; remaining ties
    break to the SHORTEST last piece (first-wins backtrack). Returns
    the words grid with ``best`` (packed optimum) and ``seg_{L}``
    (space-joined pieces). Span costs come from ONE broadcast join;
    the unrolled DP + backtrack are scan-local integer codegen —
    nothing depends on corpus size beyond the distinct-word grain."""
    L, P = ENCODE_MAX_WORD, ENCODE_MAX_PIECE
    S = _ENCODE_SENTINEL
    # spans: (word, start, len, piece) for every candidate piece slot
    spans = words.select(
        "w",
        "freq",
        F.explode(F.expr(f"sequence(1, length(w))")).alias("s"),
    ).select(
        "w",
        "freq",
        "s",
        F.explode(
            F.expr(f"sequence(1, least({P}, length(w) - s + 1))")
        ).alias("l"),
    ).select(
        "w", "freq", "s", "l", F.expr("substring(w, s, l)").alias("piece")
    )
    costed = spans.join(F.broadcast(vocab), "piece")
    # pivot to per-(start, len) cost columns: c_s_l
    ccols = [
        F.max(
            F.when((F.col("s") == s) & (F.col("l") == l), F.col("cost"))
        ).alias(f"c_{s}_{l}")
        for s in range(1, L + 1)
        for l in range(1, P + 1)
        if s + l - 1 <= L
    ]
    grid = costed.groupBy("w", "freq").agg(*ccols)

    def c(s: int, l: int):
        return F.coalesce(F.col(f"c_{s}_{l}") * 16 + 1, F.lit(S).cast("long"))

    # unrolled DP: best_i = min over piece length l of best_{i-l} + packed
    cur = grid.withColumn("best_0", F.lit(0).cast("long"))
    for i in range(1, L + 1):
        cands = [
            F.col(f"best_{i - l}") + c(i - l + 1, l)
            for l in range(1, min(P, i) + 1)
        ]
        cur = cur.withColumn("best_i_tmp", F.least(*cands) if len(cands) > 1 else cands[0])
        cur = cur.withColumn(f"best_{i}", F.col("best_i_tmp")).drop("best_i_tmp")
        # first-wins backtrack: shortest last piece on ties
        bl = None
        for l in range(1, min(P, i) + 1):
            cond = F.col(f"best_{i}") == (F.col(f"best_{i - l}") + c(i - l + 1, l))
            bl = F.when(cond, F.lit(l)) if bl is None else bl.when(cond, F.lit(l))
        cur = cur.withColumn(f"bl_{i}", bl.cast("int"))
    final_best = F.expr(
        "CASE length(w) "
        + " ".join(f"WHEN {i} THEN best_{i}" for i in range(1, L + 1))
        + " END"
    )
    cur = cur.withColumn("best", final_best)
    # unrolled backtrack: walk bl_pos from the end, prepending pieces
    bl_at = lambda pos_col: F.expr(
        "CASE " + pos_col + " "
        + " ".join(f"WHEN {i} THEN bl_{i}" for i in range(1, L + 1))
        + " ELSE 0 END"
    )
    cur = cur.withColumn("pos_0", F.length("w").cast("int")).withColumn(
        "seg_0", F.lit("")
    )
    for k in range(1, L + 1):
        prev = f"pos_{k - 1}"
        lk = F.when(F.col(prev) > 0, bl_at(prev)).otherwise(F.lit(0))
        cur = cur.withColumn(f"lk_{k}", lk)
        piece = F.expr(f"substring(w, pos_{k - 1} - lk_{k} + 1, lk_{k})")
        cur = cur.withColumn(
            f"seg_{k}",
            F.when(
                F.col(f"lk_{k}") > 0,
                F.when(
                    F.col(f"seg_{k - 1}") == "", piece
                ).otherwise(F.concat(piece, F.lit(" "), F.col(f"seg_{k - 1}"))),
            ).otherwise(F.col(f"seg_{k - 1}")),
        ).withColumn(f"pos_{k}", (F.col(prev) - F.col(f"lk_{k}")).cast("int"))
    return cur


def unigram_train_unrolled(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 100,
    n_iter: int = 2,
    max_candidates: int = 2000,
) -> DataFrame:
    """L38e (VERDICT r12 item 3): unigram-LM tokenizer training as a
    FULLY SQL-replayable unrolled recurrence — the driver-checkable
    twin of :func:`unigram_train`, built from the L38b flat-Viterbi
    machinery (:func:`_flat_segment`) by swapping its LITERAL cost
    table for DATA-DERIVED costs re-estimated each EM iteration.

    Bounded grain (documented, the ENCODE discipline): distinct
    alphabetic words of length <= ENCODE_MAX_WORD (12), pieces <=
    ENCODE_MAX_PIECE (4) chars. Init: every substring piece weighted
    by word frequency — single chars always kept (fallback alphabet),
    longer pieces keep the ``max_candidates`` heaviest (weight desc,
    piece). Each hard-EM iteration: M-step costs are the exact
    integers ``lnq(total) − lnq(weight)`` with lnq(x) =
    floor(ln(x)·10⁶) — ln is only ever taken of an INTEGER, the
    cross-engine-stable fixed-point trick used by the JS-divergence /
    Adamic–Adar oracles, and the subtraction is exact — then the
    E-step Viterbi-resegments every word under those costs (packed
    (cost, piece-count) DP, shortest-last-piece tie-break) and
    reweights pieces by segment occupancy; zero-count alphabet chars
    keep weight 1 so every word stays segmentable.

    Output after ``n_iter`` iterations: all single-char pieces + the
    ``vocab_size`` heaviest multi-char pieces, as (piece, piece_count,
    logp) with logp = lnq(weight) − lnq(total) (≤ 0), ordered
    (piece_count desc, piece).

    Scale: identical shape to :func:`unigram_encode_flat` per
    iteration — everything runs at the DISTINCT-WORD grain, span
    costs come from one broadcast join against the (≤ alphabet +
    max_candidates)-row vocab, and the DP is scan-local codegen; the
    only shuffles are the word grouping and the piece re-count. The
    Python-Viterbi :func:`unigram_train` stays registered for
    unbounded word lengths / sub-piece granularity."""
    L, P = ENCODE_MAX_WORD, ENCODE_MAX_PIECE
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") <= L))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .localCheckpoint()
    )
    counts = _candidate_pieces(words, P, max_candidates)
    alphabet = counts.filter(F.length("piece") == 1).select("piece")
    alphabet = alphabet.localCheckpoint()

    def cost_table(cnts: DataFrame) -> DataFrame:
        tot = cnts.agg(F.sum("weight").cast("long").alias("tot"))
        return cnts.crossJoin(F.broadcast(tot)).select(
            "piece",
            (
                F.floor(F.log(F.col("tot").cast("double")) * F.lit(1e6))
                - F.floor(F.log(F.col("weight").cast("double")) * F.lit(1e6))
            )
            .cast("long")
            .alias("cost"),
        )

    for _ in range(n_iter):
        seg = _flat_segment(words, cost_table(counts))
        counts = (
            seg.select(
                F.explode(F.split(F.col(f"seg_{L}"), " ")).alias("piece"),
                "freq",
            )
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("weight"))
        )
        fallback = alphabet.join(counts, "piece", "left_anti").select(
            "piece", F.lit(1).cast("long").alias("weight")
        )
        counts = counts.unionByName(fallback).localCheckpoint()
    final = counts.join(cost_table(counts), "piece")
    keep_chars = final.filter(F.length("piece") == 1)
    keep_top = (
        final.filter(F.length("piece") > 1)
        .orderBy(F.desc("weight"), "piece")
        .limit(vocab_size)
    )
    return (
        keep_chars.unionByName(keep_top)
        .select(
            "piece",
            F.col("weight").alias("piece_count"),
            (-F.col("cost")).cast("long").alias("logp"),
        )
        .orderBy(F.desc("piece_count"), "piece")
    )
