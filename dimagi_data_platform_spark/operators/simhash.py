"""SimHash fingerprinting + Hamming-distance near-dup pairs.

128-bit SimHash: each token hashes to 128 bits (the FULL md5 — r10's
64-bit fingerprint left half the digest unused); per bit, sum +1/-1
over tokens; the sign vector is the fingerprint, carried as two longs
(fp1 = bits 0-63, fp2 = bits 64-127). Near-dup candidates use the
pigeonhole trick: fingerprints within Hamming distance d must agree on
at least one of d+1 equal-width chunks, so we join on (chunk_idx,
chunk_value) and verify with bit_count(a XOR b) — never a cross join.

Why 128 bits (VERDICT r10 item 2): at d=6 the pigeonhole needs 7
chunks; over 64 bits that's ~9-bit chunks, and RANDOM fingerprints
collide on a chunk with probability 2^-9 — the candidate stream grows
~n²/512 and the r10 sf1→sf10 probe measured 14.2x wall per 10x data.
Over 128 bits the same 7 chunks are 18-19 bits wide: random chunk
collisions drop by ~2^9 (to ~n²/2^18 per chunk index), restoring a
near-linear curve while the md5-based fingerprint stays bitwise
engine-reproducible (the SQL oracle builds the identical two longs
from the same digest slices).

Scale: the 128 per-bit aggregations are one shuffle on doc id
(map-side partial, lane-packed into 32 sums); the chunk join shuffles
candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.text import tokens

N_BITS = 128

# lane-packed counting mask: (h >>> k) & LANE_MASK spreads bits
# {k, k+16, k+32, k+48} of one 64-bit word into four 16-bit count lanes
_LANE_MASK = 0x0001_0001_0001_0001


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Return (id, fp1: long, fp2: long) — the 128-bit fingerprint as
    two longs (fp1 = bits 0-63, fp2 = bits 64-127).

    Token bits come from md5 (identical in every engine): the 32-char
    digest splits into three non-overflowing slices — s1 = chars 1-15
    (60 bits), s2 = chars 16-30 (60 bits), s3 = chars 31-32 (8 bits) —
    reassembled so the 128-bit token hash is laid out as
    hA = s1 | (s2 & 0xF) << 60 and hB = (s2 >>> 4) | s3 << 56, i.e.
    global bit i reads (h1 >> i) for i < 60, (h2 >> i-60) for
    60 <= i < 120 and (h3 >> i-120) above — the exact expression the
    SQL oracle interpolates, so fingerprints are engine-reproducible
    and the operator sits behind the SQL-oracle hash gate.
    """
    # repartition first — same reasoning as minhash_signatures: a small
    # corpus arrives as one parquet split and the tokenize/md5 explode
    # (the hot map-side work) would otherwise run in a single task; at
    # real scale the scan is already split and this is noise.
    par = docs.sparkSession.sparkContext.defaultParallelism
    tok = (
        docs.repartition(par)
        .select(
            F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
        )
        .withColumn("_m", F.md5("tok"))
        .withColumn("s1", F.conv(F.substring("_m", 1, 15), 16, 10).cast("long"))
        .withColumn("s2", F.conv(F.substring("_m", 16, 15), 16, 10).cast("long"))
        .withColumn("s3", F.conv(F.substring("_m", 31, 2), 16, 10).cast("long"))
        # 128 token-hash bits in two longs: hA = bits 0-63, hB = 64-127
        .withColumn(
            "hA",
            F.col("s1").bitwiseOR(
                F.shiftleft(F.col("s2").bitwiseAND(F.lit(15)), 60)
            ),
        )
        .withColumn(
            "hB",
            F.shiftrightunsigned("s2", 4).bitwiseOR(
                F.shiftleft(F.col("s3"), 56)
            ),
        )
    )

    # Lane-packed bit counting: (h >>> k) & 0x0001000100010001 spreads
    # bits {k, k+16, k+32, k+48} into four 16-bit lanes, so 32 packed
    # sums replace 128 per-bit sums — 4x fewer aggregate buffers and
    # per-row expressions on the exploded token stream (the hot side;
    # the unpack below runs on one row per doc). Lanes hold counts, so
    # this is exact while docs have <= 65535 distinct tokens — beyond
    # that, SimHash inputs should be feature-hashed buckets anyway.
    per_doc = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[
            F.sum(
                F.shiftrightunsigned(word, k).bitwiseAND(F.lit(_LANE_MASK))
            ).alias(f"{word}_{k}")
            for word in ("hA", "hB")
            for k in range(16)
        ],
    )

    def _fold_word(word: str) -> Column:
        # r15 (guide §1.1/§2.1 — per-run driver cost is plan cost): the
        # former 64-term chained CASE sum per word built a ~128-node
        # expression tree PER FINGERPRINT WORD that Catalyst re-analyzed
        # and janino re-compiled on every run (expression IDs change per
        # build, so codegen caches never hit) — measured 3.3 s of the
        # 4.5 s fingerprint stage at sf0.1. This HOF loop computes the
        # IDENTICAL integers (verified bitwise on the full corpus:
        # lane k = i % 16, shift 16·(i DIV 16), sign of the +/-1 sum is
        # positive iff 2·count > n_tok, bit i contributes the signed-64
        # value of 1 << i, disjoint-bit sum) with one compact
        # expression: 3.3 -> 1.1 s interleaved min-of-3.
        arr = ", ".join(f"{word}_{k}" for k in range(16))
        return F.expr(
            f"aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) -> "
            f"acc + IF(2 * (shiftrightunsigned(element_at(array({arr}), "
            f"(i % 16) + 1), 16 * (i DIV 16)) & 65535) > n_tok, "
            f"shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
        )

    return per_doc.select(
        id_col, _fold_word("hA").alias("fp1"), _fold_word("hB").alias("fp2")
    )


def _chunk_value(offset: int, width: int) -> Column:
    """Bits [offset, offset+width) of the 128-bit fingerprint
    (fp1 = low 64, fp2 = high 64), straddling the long boundary when
    the chunk spans it."""
    mask = (1 << width) - 1
    if offset + width <= 64:
        return F.shiftrightunsigned("fp1", offset).bitwiseAND(F.lit(mask))
    if offset >= 64:
        return F.shiftrightunsigned("fp2", offset - 64).bitwiseAND(F.lit(mask))
    lo_w = 64 - offset
    lo = F.shiftrightunsigned("fp1", offset).bitwiseAND(F.lit((1 << lo_w) - 1))
    hi = F.col("fp2").bitwiseAND(F.lit((1 << (width - lo_w)) - 1))
    return lo.bitwiseOR(F.shiftleft(hi, lo_w))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Pairs (id_a < id_b) with Hamming(fp_a, fp_b) <= max_hamming
    over the 128-bit fingerprint.

    Requires n_chunks >= max_hamming + 1 for exact recall (pigeonhole).
    """
    assert n_chunks >= max_hamming + 1, "pigeonhole needs d+1 chunks"
    # Self-similar corpora collapse many docs onto one fingerprint; the
    # chunk join runs over DISTINCT fingerprints (candidate volume
    # shrinks quadratically with the dup ratio), and doc pairs expand
    # back afterward: same-fp groups pair directly at hamming 0, and
    # each qualifying (fp_a != fp_b) pair fans out via two hash joins
    # on the fp->doc mapping — that fan-out is output, not probe work.
    fps = simhash_fingerprints(docs, id_col, text_col).localCheckpoint()
    # Use ALL 128 bits across n_chunks (uneven widths when 128 %
    # n_chunks != 0): wider chunks mean 2^w fewer random collisions per
    # chunk index, so the caller should pass n_chunks = max_hamming + 1
    # exactly — recall is already guaranteed at d+1 chunks and every
    # extra chunk only adds candidate volume.
    base, rem = divmod(N_BITS, n_chunks)
    widths = [base + 1 if i < rem else base for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    dfp = fps.select("fp1", "fp2").distinct()
    chunks = dfp.select(
        "fp1",
        "fp2",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        _chunk_value(offsets[i], widths[i]).alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("fp1", "fp2", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))

    a = chunks.select(
        F.col("fp1").alias("a1"), F.col("fp2").alias("a2"), "ci", "cv"
    )
    b = chunks.select(
        F.col("fp1").alias("b1"), F.col("fp2").alias("b2"), "ci", "cv"
    )
    hamming = F.bit_count(F.col("a1").bitwiseXOR(F.col("b1"))) + F.bit_count(
        F.col("a2").bitwiseXOR(F.col("b2"))
    )
    # Order matters at scale: the hamming check is codegen'd bit math,
    # so it runs DURING the chunk join's probe — candidates that fail
    # it never reach the dropDuplicates shuffle. (With w-bit chunks,
    # random fingerprints collide on ~n²·2^-w pairs per chunk index;
    # deduping before filtering would shuffle all of them.)
    fp_pairs = (
        a.join(b, ["ci", "cv"])
        .filter(
            F.struct(F.col("a1"), F.col("a2"))
            < F.struct(F.col("b1"), F.col("b2"))
        )
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a1", "a2", "b1", "b2"])
        .select("a1", "a2", "b1", "b2", "hamming")
    )

    # expand fingerprint pairs back to document pairs
    da = fps.select(
        F.col(id_col).alias("_ida"),
        F.col("fp1").alias("a1"),
        F.col("fp2").alias("a2"),
    )
    db = fps.select(
        F.col(id_col).alias("_idb"),
        F.col("fp1").alias("b1"),
        F.col("fp2").alias("b2"),
    )
    cross_fp = (
        fp_pairs.join(da, ["a1", "a2"])
        .join(db, ["b1", "b2"])
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "hamming",
        )
    )
    same_fp = (
        fps.select(F.col(id_col).alias("id_a"), "fp1", "fp2")
        .join(
            fps.select(F.col(id_col).alias("id_b"), "fp1", "fp2"),
            ["fp1", "fp2"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).alias("hamming"))
    )
    return cross_fp.union(same_fp)
