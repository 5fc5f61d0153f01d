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
    tok = (
        docs.select(
            F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
        )
        .withColumn("_m", F.md5("tok"))
        .withColumn("h1", F.conv(F.substring("_m", 1, 15), 16, 10).cast("long"))
        .withColumn("h2", F.conv(F.substring("_m", 16, 15), 16, 10).cast("long"))
    )

    def _bit(i: int):
        src, off = ("h1", i) if i < 60 else ("h2", i - 60)
        return F.shiftright(F.col(src), off).bitwiseAND(F.lit(1))

    bit_aggs = [
        F.sum(F.when(_bit(i) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(N_BITS)
    ]
    per_bit = tok.groupBy(id_col).agg(*bit_aggs)
    fp = None
    for i in range(N_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << i).cast("long") if i < 63 else F.when(
            F.col(f"b{i}") > 0, F.lit(-(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return per_bit.select(id_col, fp.alias("fingerprint"))


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
    fps = simhash_fingerprints(docs, id_col, text_col)
    # Use ALL 64 bits across n_chunks (uneven widths when 64 % n_chunks
    # != 0): wider chunks mean 2^w fewer random collisions per chunk
    # index, so the caller should pass n_chunks = max_hamming + 1
    # exactly — recall is already guaranteed at d+1 chunks and every
    # extra chunk only adds candidate volume.
    base, rem = divmod(N_BITS, n_chunks)
    widths = [base + 1 if i < rem else base for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    chunks = fps.select(
        F.col(id_col),
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
    ).select(id_col, "fingerprint", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))

    a = chunks.select(F.col(id_col).alias("id_a"), F.col("fingerprint").alias("fp_a"), "ci", "cv")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("fingerprint").alias("fp_b"), "ci", "cv")
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    # Order matters at scale: the hamming check is codegen'd bit math,
    # so it runs DURING the chunk join's probe — candidates that fail
    # it never reach the dropDuplicates shuffle. (With w-bit chunks,
    # random fingerprints collide on ~n²·2^-w pairs per chunk index;
    # deduping before filtering would shuffle all of them.)
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )
