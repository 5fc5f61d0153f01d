"""SimHash fingerprinting + Hamming-distance near-dup pairs.

64-bit SimHash: each token hashes to 64 bits; per bit, sum +1/-1 over
tokens; the sign vector is the fingerprint. Near-dup candidates use the
pigeonhole trick: fingerprints within Hamming distance d must agree on
at least one of d+1 equal-width chunks, so we join on (chunk_idx,
chunk_value) and verify with bit_count(a XOR b) — never a cross join.

Scale: the 64 per-bit aggregations are one shuffle on doc id (map-side
partial); the chunk join shuffles candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.text import tokens

N_BITS = 64


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Return (id, fingerprint: long).

    Token bits come from md5 (identical in every engine — two 60-bit
    hex slices cover the 64 fingerprint bits without touching the sign
    bit), so fingerprints are engine-reproducible and the operator sits
    behind the SQL-oracle hash gate.
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
        .withColumn("h1", F.conv(F.substring("_m", 1, 15), 16, 10).cast("long"))
        .withColumn("h2", F.conv(F.substring("_m", 16, 15), 16, 10).cast("long"))
        # all 64 fingerprint bits in one long: 0-59 from h1, 60-63 from h2
        .withColumn(
            "h",
            F.col("h1").bitwiseOR(
                F.shiftleft(F.col("h2").bitwiseAND(F.lit(15)), 60)
            ),
        )
    )

    # Lane-packed bit counting: (h >>> k) & 0x0001000100010001 spreads
    # bits {k, k+16, k+32, k+48} into four 16-bit lanes, so 16 packed
    # sums replace 64 per-bit sums — 4x fewer aggregate buffers and
    # per-row expressions on the exploded token stream (the hot side;
    # the unpack below runs on one row per doc). Lanes hold counts, so
    # this is exact while docs have <= 65535 distinct tokens — beyond
    # that, SimHash inputs should be feature-hashed buckets anyway.
    lane_mask = 0x0001_0001_0001_0001
    per_doc = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[
            F.sum(
                F.shiftrightunsigned("h", k).bitwiseAND(F.lit(lane_mask))
            ).alias(f"s{k}")
            for k in range(16)
        ],
    )

    def _count(i: int):
        j, k = divmod(i, 16)
        return F.shiftrightunsigned(f"s{k}", 16 * j).bitwiseAND(F.lit(0xFFFF))

    fp = None
    for i in range(N_BITS):
        # sign of the +/-1 sum: positive iff 2*count > n_tok
        positive = (F.lit(2) * _count(i)) > F.col("n_tok")
        term = (
            F.when(positive, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            * F.lit(1 << i).cast("long")
            if i < 63
            else F.when(positive, F.lit(-(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
        fp = term if fp is None else fp + term
    return per_doc.select(id_col, fp.alias("fingerprint"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Pairs (id_a < id_b) with Hamming(fp_a, fp_b) <= max_hamming.

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
    # Use ALL 64 bits across n_chunks (uneven widths when 64 % n_chunks
    # != 0): wider chunks mean 2^w fewer random collisions per chunk
    # index, so the caller should pass n_chunks = max_hamming + 1
    # exactly — recall is already guaranteed at d+1 chunks and every
    # extra chunk only adds candidate volume.
    base, rem = divmod(N_BITS, n_chunks)
    widths = [base + 1 if i < rem else base for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    dfp = fps.select("fingerprint").distinct()
    chunks = dfp.select(
        "fingerprint",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned("fingerprint", offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("fingerprint", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))

    a = chunks.select(F.col("fingerprint").alias("fp_a"), "ci", "cv")
    b = chunks.select(F.col("fingerprint").alias("fp_b"), "ci", "cv")
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    # Order matters at scale: the hamming check is codegen'd bit math,
    # so it runs DURING the chunk join's probe — candidates that fail
    # it never reach the dropDuplicates shuffle. (With w-bit chunks,
    # random fingerprints collide on ~n²·2^-w pairs per chunk index;
    # deduping before filtering would shuffle all of them.)
    fp_pairs = (
        a.join(b, ["ci", "cv"])
        .filter(F.col("fp_a") < F.col("fp_b"))
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["fp_a", "fp_b"])
        .select("fp_a", "fp_b", "hamming")
    )

    # expand fingerprint pairs back to document pairs
    da = fps.select(F.col(id_col).alias("_ida"), F.col("fingerprint").alias("fp_a"))
    db = fps.select(F.col(id_col).alias("_idb"), F.col("fingerprint").alias("fp_b"))
    cross_fp = (
        fp_pairs.join(da, "fp_a")
        .join(db, "fp_b")
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "hamming",
        )
    )
    same_fp = (
        fps.select(F.col(id_col).alias("id_a"), "fingerprint")
        .join(
            fps.select(F.col(id_col).alias("id_b"), "fingerprint"), "fingerprint"
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).alias("hamming"))
    )
    return cross_fp.union(same_fp)
