"""Similarity search over embedding columns.

- ``knn_bruteforce``: exact cosine top-k; the small query set is
  broadcast so the big side streams — the correctness baseline.
- ``knn_lsh``: random-hyperplane LSH buckets both sides, exact cosine
  re-rank within buckets — a 100 TB scale path (candidate volume
  ~ n / 2^planes per query instead of n).
- ``knn_ivf``: inverted-file index — k-means coarse centroids, items
  assigned to nearest centroid, queries probe the ``nprobe`` nearest
  lists — the other standard scale path (candidate volume
  ~ n * nprobe / nlist).
- ``embedding_near_dup_pairs``: exact all-pairs cosine threshold.

Exact kernels run as Arrow-batched numpy with fold-ordered
accumulation (bitwise-equal to the oracle SQL's term chain — see the
kernel note below); candidate-pruning paths (LSH buckets, IVF lists)
may use codegen expressions since only membership, not the final
score, depends on them. Hyperplanes/centroid seeds are fixed
(deterministic plans).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.vectors import cosine, dot_fixed, norm_fixed

DEFAULT_DIM = 64


# --------------------------------------------------------------------------
# Arrow-batched numpy kernels (the pairwise hot path)
#
# Semantics contract: bitwise-identical to the codegen left-fold
# ``dot_fixed`` / ``norm_fixed`` (and the oracle SQL's term chain).
# We accumulate one dimension at a time — acc += outer(A[:,i], B[:,i]) —
# so every output cell sees fl(fl(acc + fl(a_i*b_i))) in index order,
# exactly the sequential fold. Do NOT replace with A @ B.T: BLAS blocks
# and reorders the sum, which flips last-ulp bits and breaks the
# hash-checked oracle gate.
# --------------------------------------------------------------------------


def _matrix(series: pd.Series, empty_dim: int = 64) -> np.ndarray:
    """Stack an Arrow list<float> column into an (n, dim) float64 matrix
    (cast-to-double first, matching ``.getItem(i).cast("double")``).
    An EMPTY training sample (empty corpus / over-filtered input)
    yields one zero vector so quantizer/centroid literals still build
    and the query degrades to an empty result instead of crashing."""
    rows = [np.asarray(v, dtype=np.float64) for v in series]
    if not rows:
        return np.zeros((1, empty_dim))
    return np.stack(rows)


def _train_sample(
    items: DataFrame, id_col: str, vec_col: str, sample_rows: int
) -> pd.Series:
    """Deterministic quantizer/centroid training sample. orderBy+limit
    compiles to TakeOrderedAndProject (per-partition top-k, no full
    sort); a bare LIMIT's row choice is partition-order dependent, so
    scales/centroids — and therefore candidate sets and recall — would
    differ across sessions and partitionings of the same data."""
    return (
        items.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).toPandas()
    )[vec_col]


def _fold_cosine(A: np.ndarray, B: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """Cosine of every (row of A) x (row of B) via per-dimension
    outer-product accumulation (left-fold order; see module note)."""
    acc = np.zeros((A.shape[0], B.shape[0]))
    na_acc = np.zeros(A.shape[0])
    for i in range(A.shape[1]):
        acc += np.multiply.outer(A[:, i], B[:, i])
        na_acc += A[:, i] * A[:, i]
    return acc / np.multiply.outer(np.sqrt(na_acc), nb)


def _fold_norms(M: np.ndarray) -> np.ndarray:
    acc = np.zeros(M.shape[0])
    for i in range(M.shape[1]):
        acc += M[:, i] * M[:, i]
    return np.sqrt(acc)


def knn_bruteforce(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Top-k cosine neighbors for every query vector (excluding self).

    Returns (q_id, neighbor_id, cos_sim, rank). Deterministic: ties
    break on neighbor_id.
    """
    spark = items.sparkSession
    par = spark.sparkContext.defaultParallelism
    # queries are the SMALL side: ship ids + vectors + norms to every
    # task (same posture as a broadcast join side)
    q_pdf = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")).toPandas()
    Q = _matrix(q_pdf["q_vec"])
    bc = spark.sparkContext.broadcast((q_pdf["q_id"].to_numpy(), Q, _fold_norms(Q)))

    def score(batches):
        q_ids, Qm, q_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = _matrix(pdf[vec_col])
            ids = pdf[id_col].to_numpy()
            # cos[q, c] for every candidate in the batch
            cos = _fold_cosine(Qm, C, _fold_norms(C))
            not_self = q_ids[:, None] != ids[None, :]
            # per-batch top-k prune per query: global winner must win
            # its batch, so emitting k per (query, batch) is lossless
            kk = min(k, cos.shape[1])
            for qi in range(len(q_ids)):
                mask = not_self[qi]
                sims, cands = cos[qi][mask], ids[mask]
                if not len(sims):
                    continue
                top = np.lexsort((cands, -sims))[:kk]
                yield pd.DataFrame(
                    {"q_id": q_ids[qi], "neighbor_id": cands[top], "cos_sim": sims[top]}
                )

    # repartition the streamed side: a small parquet arrives as one
    # split, which would serialize the whole pairwise loop in one task
    scored = items.repartition(par).mapInPandas(
        score, schema="q_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def _sq_quantize(scales_col, col):
    """int8 symmetric quantization: round(x / s_d) clipped to
    [-127, 127] per dimension (shared by the inline path, the code
    builder, and the serve path — one definition, no drift)."""
    v = F.col(col) if isinstance(col, str) else col
    return F.transform(
        v,
        lambda x, i: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.round(x.cast("double") / F.element_at(scales_col, i + 1)).cast(
                    "int"
                ),
            ),
        ),
    )


def _sq_score_and_rerank(
    code_side: DataFrame,
    full_side: DataFrame,
    qq: DataFrame,
    k: int,
    rerank_factor: int,
) -> DataFrame:
    """Shared SQ pipeline: integer-dot scoring of (neighbor_id, c_code)
    rows against broadcast quantized queries, two-level top-R
    candidate selection, exact HOF-cosine rerank against
    (neighbor_id, c_vec).

    Candidate selection is two-level so parallelism never collapses to
    the query count: each scan partition keeps its own top-R per query
    first (partition-local window over (q_id, partition) — lossless: a
    global top-R row has < R rows above it anywhere, so it is within
    the top R of its own slice), and only R*num_partitions survivors
    reach the tiny global window. Slice membership is whatever the scan
    produced, but any superset of the global top-R yields the same
    final set, so results stay deterministic.

    The HOF cosine folds left in double — the SAME chain as dot_fixed
    and the oracle SQL — so reported scores match knn_bruteforce
    bitwise (asserted in tests); on a candidate-sized side the
    interpreted HOF beats the unrolled form, whose 64-term janino
    compile dominates (measured ~1.5s/run at sf0.1 vs ~0 for the HOF).
    """
    r = rerank_factor * k
    int_dot = F.aggregate(
        F.zip_with("q_code", "c_code", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        code_side.join(F.broadcast(qq.select("q_id", "q_code")))
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("int_score", int_dot)
        .withColumn("_pid", F.spark_partition_id())
    )
    wp = Window.partitionBy("q_id", "_pid").orderBy(
        F.desc("int_score"), F.col("neighbor_id")
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.desc("int_score"), F.col("neighbor_id")
    )
    cands = (
        scored.withColumn("_prk", F.row_number().over(wp))
        .filter(F.col("_prk") <= r)
        .withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= r)
        .select("q_id", "neighbor_id")
    )
    exact = (
        cands.join(full_side, "neighbor_id")
        .join(F.broadcast(qq.select("q_id", "q_vec")), "q_id")
        .withColumn("cos_sim", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def knn_sq_rerank(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_factor: int = 4,
    sample_rows: int = 4096,
) -> DataFrame:
    """Scalar-quantized (int8) ANN with exact rerank — the
    memory-bandwidth scale path: candidate scoring reads 8-bit codes
    (4x less I/O than the float32 column, 8x less than float64
    kernels) as a pure-codegen integer dot product, and only the
    ``rerank_factor * k`` survivors per query are re-scored with the
    exact fold-ordered cosine. No Python stage anywhere — both passes
    are whole-stage-codegen expressions.

    Train: per-dimension symmetric scale s_d = max|x_d| / 127 over a
    bounded sample (same posture as the IVF coarse quantizer). Integer
    scores are rank-faithful enough that the exact rerank recovers
    near-full recall (tested vs brute force); reported cos_sim is
    EXACT (bitwise-equal to knn_bruteforce) because the final scoring
    uses the same fold chain.

    At 100 TB the quantized codes are the artifact you persist
    (write-once like the IVF index); the full-precision column is only
    touched for the candidate-sized rerank join. Toy-SF wall time is
    stage-count-dominated (3 joins + 3 windows of fixed overhead) —
    the technique's win is scan bandwidth, which a local[32] bench at
    sf0.1 cannot exhibit.
    """
    spark = items.sparkSession
    par = spark.sparkContext.defaultParallelism
    sample = _train_sample(items, id_col, vec_col, sample_rows)
    S = _matrix(sample)
    scales = np.maximum(np.abs(S).max(axis=0) / 127.0, 1e-12)
    scales_col = F.array(*[F.lit(float(s)) for s in scales])
    qq = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _sq_quantize(scales_col, vec_col).alias("q_code"),
    )
    code_side = items.repartition(par).select(
        F.col(id_col).alias("neighbor_id"),
        _sq_quantize(scales_col, vec_col).alias("c_code"),
    )
    full_side = items.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    return _sq_score_and_rerank(code_side, full_side, qq, k, rerank_factor)


def build_sq_codes(
    items: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 4096,
) -> None:
    """Quantize ONCE, persist the int8 code table + per-dim scales.

    Writes ``<path>/codes`` (parquet: id, code array<int>, plus the
    full-precision vector for the rerank join) and ``<path>/scales``.
    Query batches served from the codes skip the training sample and
    re-quantization entirely — the write-once/query-many posture for
    the scan-bandwidth path (codes are ~4x smaller than the float32
    column; at 100 TB you'd store codes and vectors in separate
    column families and let column pruning keep rerank-only access to
    the wide one)."""
    spark = items.sparkSession
    par = spark.sparkContext.defaultParallelism
    sample = _train_sample(items, id_col, vec_col, sample_rows)
    S = _matrix(sample)
    scales = np.maximum(np.abs(S).max(axis=0) / 127.0, 1e-12)
    scales_col = F.array(*[F.lit(float(s)) for s in scales])
    items.repartition(par).select(
        F.col(id_col),
        F.col(vec_col),
        _sq_quantize(scales_col, vec_col).alias("code"),
    ).write.mode("overwrite").parquet(f"{path}/codes")
    spark.createDataFrame(
        [(int(i), float(s)) for i, s in enumerate(scales)], "dim int, scale double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/scales")


def knn_sq_from_codes(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_factor: int = 4,
) -> DataFrame:
    """Serve SQ-ANN from a persisted :func:`build_sq_codes` table:
    quantize only the (small) query batch with the stored scales, scan
    the code column for the integer top-``rerank_factor * k``, then
    exact-rerank against the stored full-precision vectors. Same
    result contract as :func:`knn_sq_rerank` (exact cos_sim, ties to
    neighbor_id)."""
    sc = spark.read.parquet(f"{path}/scales").orderBy("dim").toPandas()
    scales_col = F.array(*[F.lit(float(s)) for s in sc["scale"]])
    codes = spark.read.parquet(f"{path}/codes")
    qq = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _sq_quantize(scales_col, vec_col).alias("q_code"),
    )
    code_side = codes.select(
        F.col(id_col).alias("neighbor_id"), F.col("code").alias("c_code")
    )
    full_side = codes.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    return _sq_score_and_rerank(code_side, full_side, qq, k, rerank_factor)


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col, dim: int, n_planes: int, seed: int = 7):
    """Sign-bit bucket id (0..2^n_planes-1) for a vector column.

    Built as ONE parsed SQL expression, not chained Column ops: the
    planes×dim tree is ~400 terms, and constructing it term-by-term
    through py4j cost ~2.5s of pure DRIVER time per table (measured
    10s for 4 tables before this).

    r15 (guide §1.1): each plane's dot product is a HOF left fold over
    a literal constant array instead of a ~2·dim-node Add chain — the
    flat Add chain made Catalyst re-analyze and janino re-compile a
    ~400-term tree on EVERY run (expression IDs change per build, so
    codegen caches never hit); the 4-table bucketing stage of
    embedding_near_dup_lsh measured 1.62 -> 0.70 s interleaved after
    the switch. ``aggregate`` folds per dimension IN ORDER from the
    same CAST(0 AS DOUBLE) seed, so values are bitwise identical to
    the chain (verified on the full sf0.1 corpus) and to the SQL
    oracle's interpolated term chain."""
    if not isinstance(vec_col, str):
        raise TypeError("lsh_bucket needs the vector COLUMN NAME")
    parts = []
    for i, plane in enumerate(_planes(dim, n_planes, seed)):
        consts = ", ".join(f"{p!r}D" for p in plane)
        dot = (
            f"aggregate(sequence(0, {dim - 1}), CAST(0 AS DOUBLE), "
            f"(acc, j) -> acc + CAST({vec_col}[j] AS DOUBLE) * "
            f"element_at(array({consts}), j + 1))"
        )
        parts.append(
            f"(CASE WHEN ({dot}) > 0 THEN {1 << i} ELSE 0 END)"
        )
    return F.expr(" + ".join(parts))


def knn_lsh(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    n_planes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    Recall < 1 by design; tested against knn_bruteforce. At scale,
    bucket the big side once (write bucketed) and reuse across queries.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fixed(vec_col, dim).alias("q_norm"),
        lsh_bucket(vec_col, dim, n_planes, seed).alias("bucket"),
    )
    c = items.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_fixed(vec_col, dim).alias("c_norm"),
        lsh_bucket(vec_col, dim, n_planes, seed).alias("bucket"),
    )
    joined = F.broadcast(q).join(c, "bucket").filter(F.col("q_id") != F.col("neighbor_id"))
    cos = dot_fixed("q_vec", "c_vec", dim) / (F.col("q_norm") * F.col("c_norm"))
    scored = joined.withColumn("cos_sim", cos)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    items: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    n_blocks: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold (exact).

    Distributed block-pair compare — no driver-side collect anywhere:
    rows hash into ``n_blocks`` blocks; each row is replicated to the
    B block-pair groups containing its block (shuffle volume n*B); each
    group compares block-i rows against block-j rows with the
    fold-ordered Arrow kernel. Every unordered pair lands in exactly
    one group, so the result is exact and duplicate-free while total
    compare work stays O(n²/2) spread over B(B+1)/2 independent tasks.

    Sizing at scale: ``n_blocks=None`` (default) SIZES B FROM THE DATA
    — one count, then B = ceil(n / 3000) (min 8), bounding each task's
    cosine matrix at ~3000² float64 ≈ 72 MB no matter how large the
    table grows. The r10 sf10 probe caught the fixed B=8 default
    OOM-killing the JVM at 200k vectors (25k-row blocks → multi-GB
    per-task matrices × 32 concurrent tasks); the pair scores are
    blockcount-invariant (per-cell kernel), so B only moves memory,
    never values. A 10⁹-row table still wants the LSH path below,
    which prunes candidates instead of partitioning the full O(n²)
    work.
    """
    spark = items.sparkSession
    if n_blocks is None:
        n_rows = items.count()
        n_blocks = max(8, -(-n_rows // 3000))
    pair_rows = [
        (i * n_blocks + j, i, j)
        for i in range(n_blocks)
        for j in range(n_blocks)
        if i <= j
    ]
    pairs = F.broadcast(
        spark.createDataFrame(pair_rows, "pair_id int, bi int, bj int")
    )
    # repartition first (guide §2.6, the r14 lang_id/permutation-test
    # discipline): a small table arrives as ONE parquet split, so the
    # B-way row replication + Arrow serialization feeding the pandas
    # compare stage would run in a single task (driver-measured ~serial
    # 8→32-core scaling at sf0.1, PERF_r14); at real scale the scan is
    # already split and this round-robin is noise vs the O(n²/2) kernel
    par = spark.sparkContext.defaultParallelism
    t = items.repartition(par).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        (F.crc32(F.col(id_col).cast("string")) % n_blocks).cast("int").alias("blk"),
    )
    rep = t.join(pairs, (t.blk == pairs.bi) | (t.blk == pairs.bj))

    def compare(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        left = pdf[pdf["blk"] == bi]
        A = _matrix(left["vec"])
        a_ids = left["id"].to_numpy()
        if bi == bj:
            B, b_ids = A, a_ids
        else:
            right = pdf[pdf["blk"] == bj]
            if not len(right):
                return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
            B = _matrix(right["vec"])
            b_ids = right["id"].to_numpy()
        # cell values are independent of grouping and a*b == b*a exactly
        # in IEEE754, so scores are bitwise-equal to the single-matrix
        # kernel regardless of which side of the pair lands in A
        cos = _fold_cosine(A, B, _fold_norms(B))
        # threshold first, THEN pair-id arithmetic on the (sparse)
        # matches only — materializing full lo/hi id matrices beside
        # the cosine matrix tripled per-task memory for nothing
        mask = cos >= threshold
        if bi == bj:
            # same block on both sides: triangular mask, else every
            # unordered pair appears at cells [x,y] AND [y,x]
            mask &= a_ids[:, None] < b_ids[None, :]
        ai, bix = np.nonzero(mask)
        am, bm = a_ids[ai], b_ids[bix]
        return pd.DataFrame(
            {
                "id_a": np.minimum(am, bm),
                "id_b": np.maximum(am, bm),
                "cos_sim": cos[ai, bix],
            }
        )

    return (
        rep.groupBy("pair_id")
        .applyInPandas(
            lambda _, pdf: compare(pdf), schema="id_a long, id_b long, cos_sim double"
        )
    )


def _kmeans_centroids(
    X: np.ndarray, nlist: int, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (the IVF
    coarse quantizer is tiny: nlist x dim floats). At 100 TB you train
    on a bounded sample exactly like this — the index quality depends
    on centroid spread, not on seeing every row."""
    rnd = np.random.RandomState(seed)
    C = X[rnd.choice(len(X), size=min(nlist, len(X)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def knn_ivf(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    sample_rows: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via an inverted-file index.

    Plan shape: items are assigned to their nearest centroid list (one
    mapInPandas pass, no shuffle), queries probe their ``nprobe``
    nearest lists, and the exact fold-ordered cosine re-ranks within
    probed lists only. Recall < 1 by design (tested against
    knn_bruteforce). At scale the assignment pass is write-once
    (partition the stored table by list id) and reused across query
    batches.
    """
    spark = items.sparkSession
    par = spark.sparkContext.defaultParallelism
    sample = _train_sample(items, id_col, vec_col, sample_rows)
    C = _kmeans_centroids(_matrix(sample), nlist, seed=seed)
    bc_c = spark.sparkContext.broadcast(C)

    def assign(batches):
        Cm = bc_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = _matrix(pdf[vec_col])
            d2 = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
            out = pdf[[id_col, vec_col]].copy()
            out["list_id"] = d2.argmin(axis=1).astype("int64")
            yield out

    schema = f"{id_col} long, {vec_col} array<float>, list_id long"
    assigned = items.repartition(par).mapInPandas(assign, schema=schema)
    return _ivf_score(assigned, C, queries, k, id_col, vec_col, nprobe)


def _ivf_score(
    assigned: DataFrame,
    C: np.ndarray,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    nprobe: int,
) -> DataFrame:
    """Probe + exact re-rank against a list-assigned item table (shared
    by the inline index in :func:`knn_ivf` and the persisted index in
    :func:`knn_ivf_from_index`)."""
    spark = assigned.sparkSession
    q_pdf = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).toPandas()
    Q = _matrix(q_pdf["q_vec"])
    qd2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd2, axis=1)[:, :nprobe]
    bc_q = spark.sparkContext.broadcast(
        (q_pdf["q_id"].to_numpy(), Q, _fold_norms(Q), probes)
    )

    # Plan-level prune FIRST: only lists probed by some query reach the
    # kernel at all (with a partitioned-by-list_id stored index this is
    # partition pruning; here it's a codegen'd filter before the Arrow
    # exchange). This is where IVF's n*nprobe/nlist saving comes from.
    probe_union = sorted({int(p) for p in probes.ravel()})
    pruned = assigned.filter(F.col("list_id").isin(probe_union))

    def score(batches):
        q_ids, Qm, q_norms, probe_lists = bc_q.value
        # invert probes: list id -> indices of queries probing it, so
        # each batch runs at most nlist kernel calls (queries probing
        # the same list share one vectorized call) — per-query calls
        # would pay numpy dispatch per query instead
        probing: dict[int, list[int]] = {}
        for qi, pl in enumerate(probe_lists):
            for li in pl:
                probing.setdefault(int(li), []).append(qi)
        for pdf in batches:
            if not len(pdf):
                continue
            X = _matrix(pdf[vec_col])
            ids = pdf[id_col].to_numpy()
            lists = pdf["list_id"].to_numpy()
            norms = _fold_norms(X)
            for li in np.unique(lists):
                qis = probing.get(int(li))
                if not qis:
                    continue
                rmask = lists == li
                Xs, ids_s, norms_s = X[rmask], ids[rmask], norms[rmask]
                # cell values are row-independent: scoring a list's
                # rows alone is bitwise-identical to the full kernel
                cos = _fold_cosine(Qm[qis], Xs, norms_s)
                for row_i, qi in enumerate(qis):
                    not_self = ids_s != q_ids[qi]
                    sims, cands = cos[row_i][not_self], ids_s[not_self]
                    if not len(sims):
                        continue
                    # top-k per (query, list, batch) is lossless: the
                    # global winner must win its own list slice
                    top = np.lexsort((cands, -sims))[: min(k, len(sims))]
                    yield pd.DataFrame(
                        {
                            "q_id": q_ids[qi],
                            "neighbor_id": cands[top],
                            "cos_sim": sims[top],
                        }
                    )

    scored = pruned.mapInPandas(score, schema="q_id long, neighbor_id long, cos_sim double")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def build_ivf_index(
    items: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    sample_rows: int = 4096,
    seed: int = 7,
) -> None:
    """Train + assign ONCE, persist partitioned by list id.

    Writes ``<path>/items`` (parquet, ``partitionBy(list_id)``) and
    ``<path>/centroids``. Queries served from the index skip the
    assignment pass entirely, and the probe filter becomes real
    partition pruning — the scan only opens the ~nprobe/nlist fraction
    of files it needs. This is the write-once/query-many posture for a
    100 TB corpus (index build is one full pass; every query batch
    after that touches only probed partitions).
    """
    spark = items.sparkSession
    par = spark.sparkContext.defaultParallelism
    sample = _train_sample(items, id_col, vec_col, sample_rows)
    C = _kmeans_centroids(_matrix(sample), nlist, seed=seed)
    bc_c = spark.sparkContext.broadcast(C)

    def assign(batches):
        Cm = bc_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = _matrix(pdf[vec_col])
            d2 = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
            out = pdf[[id_col, vec_col]].copy()
            out["list_id"] = d2.argmin(axis=1).astype("int64")
            yield out

    schema = f"{id_col} long, {vec_col} array<float>, list_id long"
    assigned = items.repartition(par).mapInPandas(assign, schema=schema)
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(f"{path}/items")
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(C)],
        "list_id long, centroid array<double>",
    )
    cent.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def append_to_ivf_index(
    new_items: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental index maintenance (VERDICT r7 item 3 — the ANN
    sibling of ``incremental_minhash_dedup``): assign a NEW batch of
    vectors to the EXISTING coarse centroids and append them to the
    ``partitionBy(list_id)`` item layout. No retraining, no rewrite of
    existing list partitions — append cost is one scan-local pass over
    the batch plus new files in the touched lists, so it scales with
    the batch size, not the corpus (exactly how FAISS IVF ``add()``
    works after ``train()``). Serving via :func:`knn_ivf_from_index`
    picks the new rows up unchanged, with the same partition pruning.

    Centroids stay FIXED by design: an appended vector lands in the
    same list a full rebuild with the same quantizer would put it in,
    so index+append is EXACTLY equivalent to a rebuild that trained on
    the same sample (asserted in tests). Drift discipline is the
    caller's retrain schedule — when the data distribution moves,
    rebuild with fresh centroids (cheap: one full pass), exactly the
    FAISS posture.

    Ids must be new (dedup upstream) — an anti-join against the corpus
    here would make append cost O(corpus), defeating the point.

    Returns the number of appended rows."""
    spark = new_items.sparkSession
    cent = (
        spark.read.parquet(f"{path}/centroids").orderBy("list_id").toPandas()
    )
    C = np.stack([np.asarray(v, dtype=np.float64) for v in cent["centroid"]])
    bc_c = spark.sparkContext.broadcast(C)

    def assign(batches):
        Cm = bc_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = _matrix(pdf[vec_col])
            d2 = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
            out = pdf[[id_col, vec_col]].copy()
            out["list_id"] = d2.argmin(axis=1).astype("int64")
            yield out

    schema = f"{id_col} long, {vec_col} array<float>, list_id long"
    assigned = new_items.mapInPandas(assign, schema=schema).localCheckpoint()
    n = assigned.count()
    assigned.write.partitionBy("list_id").mode("append").parquet(
        f"{path}/items"
    )
    return n


def append_to_sq_codes(
    new_items: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental append to a persisted :func:`build_sq_codes` table:
    quantize ONLY the new batch with the STORED per-dimension scales
    and append the code rows. Scales stay fixed (same contract as the
    IVF centroids above — retrain on drift, not per batch), so
    append ≡ rebuild-with-same-scales bitwise. Returns appended rows."""
    spark = new_items.sparkSession
    sc = spark.read.parquet(f"{path}/scales").orderBy("dim").toPandas()
    scales_col = F.array(*[F.lit(float(s)) for s in sc["scale"]])
    batch = new_items.select(
        F.col(id_col),
        F.col(vec_col),
        _sq_quantize(scales_col, vec_col).alias("code"),
    ).localCheckpoint()
    n = batch.count()
    batch.write.mode("append").parquet(f"{path}/codes")
    return n


def knn_ivf_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Serve ANN queries from a persisted :func:`build_ivf_index`.

    The ``list_id`` probe filter lands on the partition column, so
    Spark prunes unprobed partitions at planning time (verify with
    ``.explain``: the scan's partitionFilters carry the IN list)."""
    cent = (
        spark.read.parquet(f"{path}/centroids").orderBy("list_id").toPandas()
    )
    C = np.stack([np.asarray(v, dtype=np.float64) for v in cent["centroid"]])
    # explicit schema: an index built from an EMPTY corpus has no part
    # files to infer from (partitionBy wrote only _SUCCESS) — the serve
    # path must still return an empty result, not fail the read
    assigned = spark.read.schema(
        f"{id_col} long, {vec_col} array<float>, list_id long"
    ).parquet(f"{path}/items")
    return _ivf_score(assigned, C, queries, k, id_col, vec_col, nprobe)


def _lsh_near_dup_candidates(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
) -> DataFrame:
    """Distinct unordered candidate pairs (id_a < id_b, with vectors)
    that share a bucket in >= 1 of ``n_tables`` hyperplane tables —
    the blocking stage of ``embedding_near_dup_lsh``.

    r15 note (guide §1.1 — measure first): an id-only candidate stream
    with vectors re-attached to the distinct pair set afterwards (the
    §8 "shuffle keys, not payloads" shape, via broadcast gather or two
    hash joins) was implemented and A/B-measured IN-SESSION at sf0.1:
    2.56 s (this vec-carrying form) vs 4.7 s (gather) / 5.4 s (joins)
    min-of-4 interleaved — the extra count/toPandas driver jobs and
    re-attach stages cost more than the ~130 MB candidate payload
    saves at this scale, so the payload-carrying form stays. The
    r12-measured crossover where gather wins (~100M candidates) is
    already served by ``embedding_near_dup_capped``'s gather kernel."""
    sides = []
    for t in range(n_tables):
        b = lsh_bucket(vec_col, dim, n_planes, seed + 101 * t)
        sides.append(
            items.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("vec"),
                F.lit(t).alias("table"),
                b.alias("bucket"),
            )
        )
    entries = sides[0]
    for s in sides[1:]:
        entries = entries.union(s)
    # materialize the bucketed entries ONCE: each hyperplane bucket is
    # a planes×dim expression tree, and the self-join would otherwise
    # carry TWO copies of all n_tables trees through analysis/codegen
    # (measured: the duplicated-plan compile dominated wall time at
    # small scale); the repartition also spreads the map work of
    # single-split inputs
    par = items.sparkSession.sparkContext.defaultParallelism
    entries = entries.repartition(par).localCheckpoint()
    a = entries.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "table", "bucket"
    )
    bside = entries.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "table", "bucket"
    )
    return (
        a.join(bside, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "vec_a", "vec_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def _score_pairs_exact(cand: DataFrame, threshold: float) -> DataFrame:
    """Exact fold-ordered cosine over a (id_a, id_b, vec_a, vec_b)
    candidate stream; keeps pairs at or above ``threshold``. The fold
    runs per dimension in order, so scores are bitwise-equal to the SQL
    oracle's left-folded term chain."""

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = _matrix(pdf["vec_a"])
            B = _matrix(pdf["vec_b"])
            # pairwise rows (not all-pairs): fold per dimension in order
            acc = np.zeros(len(A))
            na = np.zeros(len(A))
            nb = np.zeros(len(A))
            for i in range(A.shape[1]):
                acc += A[:, i] * B[:, i]
                na += A[:, i] * A[:, i]
                nb += B[:, i] * B[:, i]
            cos = acc / (np.sqrt(na) * np.sqrt(nb))
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cos_sim": cos[keep],
                }
            )

    return cand.mapInPandas(score, schema="id_a long, id_b long, cos_sim double")


def _score_pairs_exact_gather(
    cand: DataFrame, feats: DataFrame, threshold: float
) -> DataFrame:
    """:func:`_score_pairs_exact` for an (id_a, id_b) candidate stream
    with the VECTORS GATHERED from a broadcast corpus matrix instead of
    joined onto every pair: the Arrow pipe then carries 16 bytes per
    candidate, not 2·dim floats — at the r12 sf10 probe's 102M
    candidates that is ~1.6 GB of worker traffic instead of ~52 GB,
    and both vector re-attach joins disappear from the plan. Same
    per-element float32→float64 cast and in-order per-dimension fold
    as the join kernel, so scores are bitwise identical (pinned by
    test). Use only when the corpus fits a driver collect
    (``_GATHER_MAX_ROWS``); the join path remains the unbounded
    fallback."""
    pdf = feats.select("id", "vec").toPandas()
    ids = pdf["id"].to_numpy()
    order = np.argsort(ids)
    ids_sorted = ids[order]
    M = _matrix(pdf["vec"])[order]
    sc = cand.sparkSession.sparkContext
    b_ids = sc.broadcast(ids_sorted)
    b_m = sc.broadcast(M)

    def score(batches):
        idx = b_ids.value
        mat = b_m.value
        for pdf_b in batches:
            if not len(pdf_b):
                continue
            ia = np.searchsorted(idx, pdf_b["id_a"].to_numpy())
            ib = np.searchsorted(idx, pdf_b["id_b"].to_numpy())
            A = mat[ia]
            B = mat[ib]
            acc = np.zeros(len(A))
            na = np.zeros(len(A))
            nb = np.zeros(len(A))
            for i in range(A.shape[1]):
                acc += A[:, i] * B[:, i]
                na += A[:, i] * A[:, i]
                nb += B[:, i] * B[:, i]
            cos = acc / (np.sqrt(na) * np.sqrt(nb))
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf_b["id_a"].to_numpy()[keep],
                    "id_b": pdf_b["id_b"].to_numpy()[keep],
                    "cos_sim": cos[keep],
                }
            )

    return cand.mapInPandas(score, schema="id_a long, id_b long, cos_sim double")


# corpus-size ceiling for the gather kernel's driver collect + matrix
# broadcast (500k × 64 float64 ≈ 256 MB — comfortable under the 8 GB
# local driver, one broadcast per executor on a cluster)
_GATHER_MAX_ROWS = 500_000


def embedding_near_dup_lsh(
    items: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Near-dup pairs via multi-table LSH blocking — the 100 TB path:
    candidates must share a bucket in at least one of ``n_tables``
    hyperplane tables (recall grows with tables, candidate volume
    ~ n²/2^planes per table instead of n²). Exact fold-ordered cosine
    re-ranks candidates, so reported similarities are exact; only
    recall is approximate (contained-in-exact tested)."""
    cand = _lsh_near_dup_candidates(
        items, id_col, vec_col, dim, n_planes, n_tables, seed
    )
    return _score_pairs_exact(cand, threshold)


def plane_projection(vec_col: str, dim: int, seed: int):
    """Signed 1-D projection of a vector column onto ONE seeded
    gaussian hyperplane — the continuous companion of ``lsh_bucket``'s
    sign bits, used as a sort key (vectors with high cosine project to
    nearby values). Same string-built left-folded expression as
    lsh_bucket so the value is bitwise-reproducible in the SQL
    oracle's term chain."""
    if not isinstance(vec_col, str):
        raise TypeError("plane_projection needs the vector COLUMN NAME")
    (plane,) = _planes(dim, 1, seed)
    # same HOF left fold as lsh_bucket (r15): identical IEEE values in
    # the same order, one compact expression instead of a ~2·dim chain
    consts = ", ".join(f"{p!r}D" for p in plane)
    return F.expr(
        f"aggregate(sequence(0, {dim - 1}), CAST(0 AS DOUBLE), "
        f"(acc, j) -> acc + CAST({vec_col}[j] AS DOUBLE) * "
        f"element_at(array({consts}), j + 1))"
    )


# seed offset for the projection planes so they never collide with the
# bucket planes (which use seed + 101*t)
_PROJ_SEED_OFFSET = 5000


def project_features(
    items: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    n_tables: int = 8,
    bucket_bits: int = 2,
    seed: int = 7,
) -> DataFrame:
    """(id, vec, b0, p0, ..): per-pass hyperplane sign bucket + the
    norm-scaled 1-D projection, computed in ONE Arrow pass — the
    shared featurizer of ``embedding_near_dup_capped`` and the
    ingest-time embedding dedup index. All plane dots fold per
    dimension IN ORDER, bitwise-equal to the SQL oracle's left-folded
    term chains (the _score_pairs_exact discipline); as Spark
    expressions the 24 dot trees blew the JVM's 64 KB
    whole-stage-codegen method limit and deopted the hot scan."""
    if not 1 <= bucket_bits <= 62:
        # buckets are int64 bit patterns: bit k set via `1 << k`, so 62
        # is the last shift that can't touch the sign bit. Silent
        # overflow here would produce platform-dependent buckets at
        # exactly the >=2^31-bucket scale the knob targets.
        raise ValueError(
            f"bucket_bits={bucket_bits} out of range [1, 62] for the "
            "int64 sign-bucket encoding"
        )
    bucket_planes = [
        _planes(dim, bucket_bits, seed + 101 * t) for t in range(n_tables)
    ]
    proj_planes = [
        _planes(dim, 1, seed + 101 * t + _PROJ_SEED_OFFSET)[0]
        for t in range(n_tables)
    ]
    feat_schema = ", ".join(
        ["id long", "vec array<float>"]
        + [f"b{t} bigint, p{t} double" for t in range(n_tables)]
    )

    def featurize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = _matrix(pdf[vec_col])
            n = len(V)
            nrm = np.zeros(n)
            for i in range(dim):
                nrm += V[:, i] * V[:, i]
            nrm = np.sqrt(nrm)
            out = {"id": pdf[id_col], "vec": pdf[vec_col]}
            for t in range(n_tables):
                bits = np.zeros(n, dtype=np.int64)
                for k, plane in enumerate(bucket_planes[t]):
                    acc = np.zeros(n)
                    for i in range(dim):
                        acc += V[:, i] * plane[i]
                    bits |= (acc > 0).astype(np.int64) << np.int64(k)
                acc = np.zeros(n)
                for i in range(dim):
                    acc += V[:, i] * proj_planes[t][i]
                out[f"b{t}"] = bits
                # normalized projection: adjacency tracks ANGULAR
                # closeness even when norms vary
                out[f"p{t}"] = acc / nrm
            yield pd.DataFrame(out)

    return items.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    ).mapInPandas(featurize, schema=feat_schema)


def adaptive_snm_window(n_rows: int) -> int:
    """Corpus-adaptive sorted-neighborhood window for
    ``embedding_near_dup_capped``: W(n) = clamp(16, 64,
    16·(⌊log2 n⌋ − 7)). Rationale (the P27b log-corpus-knob lesson):
    at FIXED W the bounded candidate set n·W·T shrinks relative to the
    ~n² true pair mass, so recall decays a decade per decade (measured
    0.68 → 0.25 at sf0.01 → sf0.1, threshold 0.35). Scaling W with
    log(corpus) buys recall back where it is cheap (small corpora pay
    nothing: W=16 below 512 rows) while the 64 ceiling — reached by
    ~4k rows — pins candidate growth back to linear-in-n above it, so
    the three-decade probe profile (≤ ~4×/decade) is preserved on the
    measured sf1 → sf10 decade. ⌊log2 n⌋ is integer-robust across
    engines: a faithfully-rounded log2 is exact at powers of two and
    ≥ 2⁻⁴⁰ from an integer everywhere else, so Python's math.log2 and
    the oracle's SQL LOG2 floor identically."""
    import math

    if n_rows < 2:
        return 16
    return min(64, max(16, 16 * (math.floor(math.log2(n_rows)) - 7)))


#: plane count the probe-pass SQL twin expands statically — the
#: adaptive bit count gates a PREFIX of these planes (``_planes`` is
#: prefix-stable: ``random.Random(seed)`` draws sequentially, so the
#: first b planes of a 12-plane table equal ``_planes(dim, b, seed)``).
#: 12 bits = 4096 buckets; corpora whose occupancy outgrows that are
#: still SAFE (the window join caps candidates at n·W regardless of
#: bucket size — bits only target recall, never cost) but callers can
#: raise ``probe_bits`` explicitly for >10M-vector corpora.
MAX_PROBE_BITS = 12


def adaptive_bucket_bits(n_rows: int) -> int:
    """Corpus-adaptive sign-bucket width for the near-dup PROBE passes
    (the P27b ingest-index knob re-applied to batch dedup): bits(n) =
    clamp(2, 12, ⌊log2 n⌋ − 6), i.e. expected bucket occupancy held in
    [64, 128). Too few bits and a probe pass degenerates into the
    coarse SNM order (no new recall); too many and the all-signs-match
    probability (1 − θ/π)^bits kills per-pass recall at loose
    thresholds. Occupancy ≈ the SNM window means one window-join pass
    over the (bucket, projection, id) order covers essentially every
    same-bucket pair while staying STRICTLY linear (n·W candidates)
    even when real-embedding sign buckets skew hot. Same cross-engine
    ⌊log2⌋ robustness argument as ``adaptive_snm_window``."""
    import math

    return min(
        MAX_PROBE_BITS, max(2, math.floor(math.log2(max(n_rows, 2))) - 6)
    )


def embedding_near_dup_capped(
    items: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    n_tables: int = 8,
    window: int | None = None,
    bucket_bits: int = 2,
    seed: int = 7,
    n_probe_tables: int = 8,
    probe_bits: int | None = None,
) -> DataFrame:
    """BOUNDED-default embedding near-dup — ``embedding_near_dup``'s
    100 TB serving path with the honest-cap reporting discipline
    (VERDICT r10 item 1, the P26d/P78b/R97b pattern). Candidate volume
    is LINEAR by construction: ``n_tables`` sorted-neighborhood passes,
    each ranking the corpus by (``bucket_bits``-plane sign bucket,
    norm-scaled 1-D hyperplane projection, id) with the distributed
    frozen-boundary rank (operators/linkage.py — never a single-task
    global window) and pairing each row with its ``window`` nearest
    neighbors — n·W·tables candidates total. The sign bucket groups
    same-orthant vectors and the normalized projection orders by
    angle within them, so cosine-close vectors sort adjacently and
    multi-pass recall compounds exactly like P26d's (name,
    reversed-name) passes. Exact fold-ordered cosine verifies every
    candidate, so reported similarities are exact. All 24 plane dots
    run in ONE Arrow pass with per-dimension in-order folds
    (bitwise-equal to the SQL oracle's left-folded chains) — as Spark
    expressions they blew the JVM's 64 KB whole-stage-codegen method
    limit and deopted the hot scan to interpreted eval.

    NOT the fixed-plane LSH join (``embedding_near_dup_lsh``): that
    path's candidate volume is ~n²/2^planes per table — a CONSTANT
    reduction of the quadratic, which this round's sf10 probe caught
    filling 75 GB of shuffle spill at 200k vectors. Here a 10x corpus
    costs 10x candidates, period.

    Honest-cap columns on every output row: ``compared_pairs``
    (distinct candidate pairs the kernel verified — exact) and
    ``dropped_pairs`` (choose(n,2) − compared — the exact pair mass
    the cap excluded). Because the true pair set grows ~n² while
    bounded candidates grow ~n, recall NECESSARILY decays with scale —
    at FIXED W=16 it fell 0.68 (sf0.01) → 0.25 (sf0.1) at threshold
    0.35. The default ``window=None`` is therefore CORPUS-ADAPTIVE
    (``adaptive_snm_window``): W grows with log2(corpus) up to a
    ceiling of 64, which bought recall back to 0.563 at sf0.1 at the
    SAME wall (13.3 s vs 14.2 s — the extra candidates ride the same
    Arrow verify pass; RECALL_EVAL.json) while keeping candidate
    growth linear-in-n above ~4k rows. ``embedding_near_dup_recall_eval``
    is the registered harness that measures this recall/cost point
    against the exact sibling; dropped_pairs keeps the residual decay
    visible on every row, and the exact sibling stays registered for
    total recall.

    r13 PROBE passes (VERDICT r12 item 1): ``n_probe_tables`` further
    window-join passes whose sort key leads with a corpus-adaptive
    FINE sign bucket (``adaptive_bucket_bits``: occupancy held near
    the window) instead of the coarse 2-bit orthant — the P27b
    ingest-index knob applied to batch dedup. With occupancy ≈ W one
    pass covers essentially every same-fine-bucket pair, so per-pass
    recall is the all-signs-match probability rather than
    1-D-projection adjacency luck, and the passes compound: measured
    0.563 → 0.828 recall at sf0.1/threshold 0.35 for 1.66× candidates
    at 1.24× wall (RECALL_EVAL.json). Budget stays strictly linear —
    every probe pass is the same n·W window join, so a hot bucket
    still yields ≤ W candidates per row.

    Plan shape: ONE materialized feature projection (``n_tables``
    plane expressions over one scan), ONE bounded boundary-sample
    collect shared by all distributed ranks, ``n_tables`` n·W
    equi-joins on the anchor rank, one distinct over the linear
    candidate union, two hash joins to re-attach vectors, one
    Arrow-batched scoring pass, one broadcast 1-row scalar join for
    the mass columns."""
    feats = project_features(
        items, id_col, vec_col, dim, n_tables, bucket_bits, seed
    ).localCheckpoint()
    n_rows = feats.count()
    if window is None:
        # corpus-adaptive default — see adaptive_snm_window. The count
        # is cheap (feats is checkpointed) and deterministic, so the
        # DuckDB twin recomputes the same W from COUNT(*).
        window = adaptive_snm_window(n_rows)
    if probe_bits is None:
        # corpus-adaptive fine buckets for the probe passes — see
        # adaptive_bucket_bits. Same COUNT(*)-derived determinism as W.
        probe_bits = adaptive_bucket_bits(n_rows)
    order_flat = [c for t in range(n_tables) for c in (f"b{t}", f"p{t}")]
    wide = _order_sample(feats, order_flat + ["id"])
    from dimagi_data_platform_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    cand = None
    for t in range(n_tables):
        smp = [(r[2 * t], r[2 * t + 1], r[-1]) for r in wide]
        p = sorted_neighborhood_pairs(
            feats, [f"b{t}", f"p{t}", "id"], "id", window=window, sample=smp
        ).select("id_a", "id_b")
        cand = p if cand is None else cand.union(p)
    if n_probe_tables:
        # PROBE passes (r13, the P27b sign-bucket discipline): the same
        # window-join machinery over ``n_probe_tables`` fresh orders
        # whose PRIMARY key is a corpus-adaptive FINE sign bucket
        # (occupancy ≈ W, adaptive_bucket_bits) instead of the coarse
        # 2-bit orthant. With occupancy ~the window, one pass covers
        # essentially every same-fine-bucket pair, so per-pass recall
        # at threshold θ is ~(1 − θ̂/π)^bits per table — far better
        # targeted than the coarse order, where a W-window spans
        # mostly unrelated rows. Budget is UNCHANGED in shape: n·W per
        # pass, window-capped, skew-immune (a hot bucket still yields
        # ≤ W candidates per row). Probe tables continue the coarse
        # seed schedule at indices n_tables..n_tables+n_probe_tables−1
        # (bucket planes seed+101·T, projections +5000), so the SQL
        # twin derives every plane from the same two seed lines.
        # Featurized FROM the checkpointed feats (id, vec), not the
        # raw input — one extra Arrow pass over local-checkpoint rows,
        # never a recompute of the upstream plan.
        pfeats = project_features(
            feats, "id", "vec", dim, n_probe_tables, probe_bits,
            seed + 101 * n_tables,
        ).localCheckpoint()
        porder_flat = [
            c for t in range(n_probe_tables) for c in (f"b{t}", f"p{t}")
        ]
        pwide = _order_sample(pfeats, porder_flat + ["id"])
        for t in range(n_probe_tables):
            smp = [(r[2 * t], r[2 * t + 1], r[-1]) for r in pwide]
            p = sorted_neighborhood_pairs(
                pfeats, [f"b{t}", f"p{t}", "id"], "id",
                window=window, sample=smp,
            ).select("id_a", "id_b")
            cand = cand.union(p)
    # materialize the ID PAIRS ONLY (2 longs/row), never the pairs
    # with both vectors attached: the r12 sf10 probe measured the old
    # pairs-with-vectors checkpoint at ~100 GB for 102M candidates
    # (pair rows × 2 × dim floats) — the vectors re-attach lazily
    # below and stream straight into the Arrow verify pass. DISK_ONLY
    # (serialized, ~16 B/row) rather than localCheckpoint's
    # deserialized in-memory rows, which at 102M pairs GC-thrashed an
    # 8 GB local heap.
    from pyspark import StorageLevel

    cand = (
        cand.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
        .persist(StorageLevel.DISK_ONLY)
    )
    n_cand = cand.count()  # exact compared-pair mass (joins below are FK)
    all_pairs = n_rows * (n_rows - 1) // 2
    if n_rows <= _GATHER_MAX_ROWS:
        # gather kernel: id-only Arrow traffic + broadcast corpus
        # matrix — see _score_pairs_exact_gather for the measured
        # 52 GB → 1.6 GB pipe reduction at sf10
        scored = _score_pairs_exact_gather(cand, feats, threshold)
    else:
        a = feats.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
        b = feats.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
        if n_rows <= 2_000_000:
            # the vector map is a few hundred MB here — broadcast both
            # sides so the candidate stream never shuffles. Beyond
            # that, fall through to shuffle joins (a 10^9+-vector
            # corpus should be on the LSH/ingest-index paths anyway).
            a, b = F.broadcast(a), F.broadcast(b)
        scored = _score_pairs_exact(cand.join(a, "id_a").join(b, "id_b"), threshold)
    return (
        scored
        .withColumn("compared_pairs", F.lit(n_cand).cast("long"))
        .withColumn(
            "dropped_pairs", F.lit(all_pairs - n_cand).cast("long")
        )
    )


def _order_sample(df: DataFrame, cols: list[str]) -> list[tuple]:
    """ONE bounded boundary-sample collect shared across a multi-pass
    query's distributed ranks (same sampling contract as
    frozen_range_pid; boundary quality affects only balance, never
    rank correctness)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    n_target = max(par * 20, 200)
    proj = df.select(*cols)
    cnt = proj.count()
    if cnt == 0:
        return []
    if cnt <= 4 * n_target:
        return [tuple(r) for r in proj.collect()]
    frac = min(1.0, (3.0 * n_target) / cnt)
    return [
        tuple(r)
        for r in proj.sample(False, frac, seed=42).limit(8 * n_target).collect()
    ]


def _block_pair_replicate(
    assigned: DataFrame, id_col: str, vec_col: str, block_target: int
) -> DataFrame:
    """Per-cluster block-pair replication for bounded pairwise compare.

    Each cluster of c rows splits into B = ceil(c / block_target)
    blocks; every row is replicated into the B block-pair groups
    (bi <= bj) containing its block — one explode, all JVM-side, so an
    unbounded hot cluster costs extra tasks, never executor memory.
    Every unordered within-cluster pair lands in exactly one
    (list_id, bi, bj) group. Cluster counts are one tiny aggregate
    (<= nlist rows) broadcast back on.
    """
    counts = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("_cnt"))
    t = assigned.join(F.broadcast(counts), "list_id")
    n_blocks = F.greatest(
        F.lit(1), F.ceil(F.col("_cnt") / F.lit(block_target))
    ).cast("int")
    blk = F.pmod(F.crc32(F.col(id_col).cast("string")), n_blocks).cast("int")
    t = t.withColumn("_blk", blk).withColumn(
        "_g",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_blocks - 1),
                lambda o: F.struct(
                    F.least(o, F.col("_blk")).alias("bi"),
                    F.greatest(o, F.col("_blk")).alias("bj"),
                ),
            )
        ),
    )
    return t.select(
        id_col,
        vec_col,
        "list_id",
        "_blk",
        F.col("_g.bi").alias("bi"),
        F.col("_g.bj").alias("bj"),
    )


def semantic_dedup(
    items: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    sample_rows: int = 4096,
    seed: int = 7,
    block_target: int = 2048,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means-partition the
    embedding space into ``nlist`` clusters, then within each cluster
    drop every item whose cosine similarity to a LOWER-id cluster
    member reaches ``threshold`` (the min-id representative of each
    semantic near-dup group survives).

    Returns one row per item: (id, list_id, is_kept, matched_id,
    cos_sim) — dropped rows carry their highest-similarity lower-id
    match (ties to the lowest id), kept rows carry nulls.

    Scale posture: centroids train on a bounded driver-side sample
    (like the IVF coarse quantizer); assignment is one scan-local
    mapInPandas pass; the pairwise compare is confined to each cluster
    — the SemDeDup trade: O(sum of cluster²) instead of O(n²). Hot
    clusters are SUB-BLOCKED with the same block-pair decomposition as
    ``embedding_near_dup_pairs``: a cluster of c rows splits into
    B = ceil(c / block_target) blocks, every row replicates into the B
    block-pair groups containing its block, and no task ever holds more
    than ~2·block_target rows — an unbounded hot cluster costs extra
    tasks, never executor memory. Per-group best-matches are reduced to
    the global best per id (max cos, ties to the lowest matched id),
    which is bitwise-identical to the single-group kernel because cell
    values are grouping-independent. Rows-only vs the oracle gate
    (k-means is not SQL-expressible); semantics unit-tested against the
    exact within-cluster pair set.
    """
    spark = items.sparkSession
    par = spark.sparkContext.defaultParallelism
    sample = _train_sample(items, id_col, vec_col, sample_rows)
    C = _kmeans_centroids(_matrix(sample), nlist, seed=seed)
    bc_c = spark.sparkContext.broadcast(C)

    def assign(batches):
        Cm = bc_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = _matrix(pdf[vec_col])
            d2 = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
            out = pdf[[id_col, vec_col]].copy()
            out["list_id"] = d2.argmin(axis=1).astype("int64")
            yield out

    assigned = items.repartition(par).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} array<float>, list_id long"
    )

    assigned = assigned.localCheckpoint()
    rep = _block_pair_replicate(assigned, id_col, vec_col, block_target)

    def best_matches(key, pdf: pd.DataFrame) -> pd.DataFrame:
        """Per (cluster, block-pair) group: every row's best lower-id
        match >= threshold among group members, considering each
        unordered pair exactly once (within-block pairs only in the
        bi == bj group)."""
        empty = pd.DataFrame({"id": [], "matched_id": [], "cos_sim": []}).astype(
            {"id": "int64", "matched_id": "int64", "cos_sim": "float64"}
        )
        bi, bj = int(key[1]), int(key[2])
        left = pdf[pdf["_blk"] == bi]
        if bi == bj:
            ids = left[id_col].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            X = _matrix(left[vec_col])[order]
            cos = _fold_cosine(X, X, _fold_norms(X))
            dup = (cos >= threshold) & (ids[:, None] > ids[None, :])
            has = dup.any(axis=1)
            if not has.any():
                return empty
            masked = np.where(dup, cos, -np.inf)
            best = masked.argmax(axis=1)  # ties -> first index = lowest id
            return pd.DataFrame(
                {
                    "id": ids[has],
                    "matched_id": ids[best][has],
                    "cos_sim": cos[np.arange(len(ids)), best][has],
                }
            ).astype({"id": "int64", "matched_id": "int64"})
        right = pdf[pdf["_blk"] == bj]
        if not len(left) or not len(right):
            return empty
        a_ids = left[id_col].to_numpy()
        b_ids = right[id_col].to_numpy()
        A = _matrix(left[vec_col])
        B = _matrix(right[vec_col])
        # cell values are grouping-independent (see embedding_near_dup
        # kernel note), so per-group bests reduce exactly
        cos = _fold_cosine(A, B, _fold_norms(B))
        out_ids, out_match, out_cos = [], [], []
        for rows, cols, mat in ((a_ids, b_ids, cos), (b_ids, a_ids, cos.T)):
            # candidates must be LOWER-id and >= threshold; ties among
            # equal cos -> lowest candidate id, so sort candidate axis
            order = np.argsort(cols)
            cols_s = cols[order]
            m = (mat[:, order] >= threshold) & (cols_s[None, :] < rows[:, None])
            has = m.any(axis=1)
            if not has.any():
                continue
            masked = np.where(m, mat[:, order], -np.inf)
            best = masked.argmax(axis=1)
            out_ids.append(rows[has])
            out_match.append(cols_s[best][has])
            out_cos.append(masked[np.arange(len(rows)), best][has])
        if not out_ids:
            return empty
        return pd.DataFrame(
            {
                "id": np.concatenate(out_ids),
                "matched_id": np.concatenate(out_match),
                "cos_sim": np.concatenate(out_cos),
            }
        ).astype({"id": "int64", "matched_id": "int64"})

    partial = rep.groupBy("list_id", "bi", "bj").applyInPandas(
        best_matches, schema="id long, matched_id long, cos_sim double"
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos_sim"), F.col("matched_id"))
    # internal name: the kernel's "id" column would collide with a
    # caller-passed id_col="id" in the join below
    best = (
        partial.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(F.col("id").alias("_match_src"), "matched_id", "cos_sim")
    )
    return assigned.join(
        best, assigned[id_col] == best["_match_src"], "left"
    ).select(
        F.col(id_col),
        "list_id",
        F.col("_match_src").isNull().alias("is_kept"),
        "matched_id",
        "cos_sim",
    )


# --------------------------------------------------------------------------
# IVF-PQ: product-quantized inverted-file ANN (the FAISS-style 100 TB
# index layout — coarse lists for pruning, m_sub-byte codes for
# scan bandwidth, asymmetric-distance lookup tables for scoring)
# --------------------------------------------------------------------------


def _pq_codebooks(
    R: np.ndarray, m_sub: int, ksub: int, seed: int
) -> np.ndarray:
    """Per-subspace k-means codebooks over residual sub-vectors.

    Returns (m_sub, ksub, dsub). Deterministic: each subspace trains
    with its own derived seed so codebooks don't mirror each other."""
    dsub = R.shape[1] // m_sub
    books = np.zeros((m_sub, ksub, dsub))
    for m in range(m_sub):
        sub = R[:, m * dsub : (m + 1) * dsub]
        cb = _kmeans_centroids(sub, ksub, seed=seed + 31 * m)
        books[m, : len(cb)] = cb
    return books


def _pq_encode(R: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Nearest-codeword index per subspace: (n, m_sub) uint8-range ints."""
    m_sub, _, dsub = books.shape
    codes = np.zeros((len(R), m_sub), dtype=np.int64)
    for m in range(m_sub):
        sub = R[:, m * dsub : (m + 1) * dsub]
        d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = d2.argmin(axis=1)
    return codes


def knn_ivfpq(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    m_sub: int = 8,
    ksub: int = 16,
    rerank_factor: int = 8,
    sample_rows: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """IVF-PQ ANN: coarse k-means lists prune the scan (IVF), residual
    product-quantization codes replace the float column in the scoring
    scan (PQ), and an exact fold-ordered cosine reranks the
    ``rerank_factor * k`` ADC survivors per query.

    Plan shape (all distributed, one Arrow pass over probed lists):

    1. Train coarse centroids + per-subspace residual codebooks on a
       deterministic bounded sample (driver-side, tiny — same posture
       as the IVF/SQ quantizers; at 100 TB index quality depends on
       centroid spread, not on seeing every row).
    2. One ``mapInPandas`` encode pass tags every item with
       ``(list_id, m_sub code bytes)``. Persisted, this is the index:
       ``m_sub`` bytes/vector instead of ``4*dim`` — a 32x scan-size
       reduction at dim=64/m=8, which is the entire point at scale.
    3. Queries build per-(query, subspace) asymmetric-distance lookup
       tables (ADC): ``LUT[m][j] = <q_sub_m, codebook[m][j]>`` plus the
       exact ``<q, coarse_centroid>`` term per probed list, broadcast
       to the scan. Approximate score of an item is a pure table-gather
       ``<q,c_l> + sum_m LUT[m][code_m]`` — no float vector touched.
    4. Probed-list pruning happens BEFORE the kernel (codegen filter;
       partition pruning when the encode pass is persisted
       ``partitionBy(list_id)`` exactly like :func:`build_ivf_index`).
    5. Survivors join back to the full-precision column for the exact
       rerank — reported ``cos_sim`` is bitwise-equal to
       :func:`knn_bruteforce` (same fold chain), so approximation only
       affects WHICH candidates are seen, never their reported scores.

    Recall is governed by (nprobe/nlist, m_sub*log2(ksub) bits,
    rerank_factor) — tested against brute force.
    """
    spark = items.sparkSession
    par = spark.sparkContext.defaultParallelism
    sample = _train_sample(items, id_col, vec_col, sample_rows)
    X = _matrix(sample)
    C = _kmeans_centroids(X, nlist, seed=seed)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    books = _pq_codebooks(X - C[d2.argmin(axis=1)], m_sub, ksub, seed)
    bc = spark.sparkContext.broadcast((C, books))

    def encode(batches):
        Cm, Bm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = _matrix(pdf[vec_col])
            dd = ((V[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
            assign = dd.argmin(axis=1)
            codes = _pq_encode(V - Cm[assign], Bm)
            out = pdf[[id_col]].copy()
            out["list_id"] = assign.astype("int64")
            out["pq_code"] = [row.tolist() for row in codes]
            yield out

    encoded = items.repartition(par).mapInPandas(
        encode, schema=f"{id_col} long, list_id long, pq_code array<int>"
    )

    q_pdf = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).toPandas()
    Q = _matrix(q_pdf["q_vec"])
    qd2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd2, axis=1)[:, :nprobe]
    dsub = Q.shape[1] // m_sub
    # ADC tables: LUT[q, m, j] = <q_sub_m, codebook[m][j]>; coarse term
    # <q, centroid_l> exact per (query, probed list)
    lut = np.einsum(
        "qmd,mjd->qmj", Q.reshape(len(Q), m_sub, dsub), books
    )
    qc_dot = Q @ C.T
    bc_q = spark.sparkContext.broadcast(
        (q_pdf["q_id"].to_numpy(), probes, lut, qc_dot)
    )

    probe_union = sorted({int(p) for p in probes.ravel()})
    pruned = encoded.filter(F.col("list_id").isin(probe_union))
    r = rerank_factor * k

    def adc_score(batches):
        q_ids, probe_lists, LUT, QC = bc_q.value
        probing: dict[int, list[int]] = {}
        for qi, pl in enumerate(probe_lists):
            for li in pl:
                probing.setdefault(int(li), []).append(qi)
        m_idx = np.arange(LUT.shape[1])
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            lists = pdf["list_id"].to_numpy()
            codes = np.stack([np.asarray(c) for c in pdf["pq_code"]])
            for li in np.unique(lists):
                qis = probing.get(int(li))
                if not qis:
                    continue
                rmask = lists == li
                ids_s, codes_s = ids[rmask], codes[rmask]
                # gather: per item, sum_m LUT[q, m, code_m] — slice the
                # probing queries FIRST so the fancy-index materializes
                # (len(qis), n_items, m), not (n_queries, n_items, m)
                gathered = LUT[qis][:, m_idx[None, :], codes_s]
                for row_i, qi in enumerate(qis):
                    score = gathered[row_i].sum(axis=1) + QC[qi, li]
                    not_self = ids_s != q_ids[qi]
                    sc, cands = score[not_self], ids_s[not_self]
                    if not len(sc):
                        continue
                    top = np.lexsort((cands, -sc))[: min(r, len(sc))]
                    yield pd.DataFrame(
                        {
                            "q_id": q_ids[qi],
                            "neighbor_id": cands[top],
                            "adc_score": sc[top],
                        }
                    )

    cands = pruned.mapInPandas(
        adc_score, schema="q_id long, neighbor_id long, adc_score double"
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.desc("adc_score"), F.col("neighbor_id")
    )
    survivors = (
        cands.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= r)
        .select("q_id", "neighbor_id")
    )
    exact = (
        survivors.join(
            items.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
                )
            ),
            "q_id",
        )
        .withColumn("cos_sim", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def _lit_arr(plane: list[float]):
    """Literal double array as ONE parsed expression (py4j-cheap)."""
    return F.expr("array(" + ", ".join(f"{p!r}D" for p in plane) + ")")


def _hof_dot(vec_col, arr):
    """Left-folded dot product as a higher-order function — the SAME
    ((0+t0)+t1)+... chain as dot_fixed / the oracle SQL, but the
    generated code is a LOOP, not 64 inlined terms: an unrolled
    512-term chain costs ~1.3s of janino compilation PER RUN at query
    scale (same lesson as _sq_score_and_rerank's HOF rerank), the HOF
    compiles in microseconds and evaluates identically."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    prods = F.zip_with(col, arr, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)


def knn_ivf_flat(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    nlist: int = 8,
    seed: int = 23,
) -> DataFrame:
    """IVF-Flat ANN with a FIXED literal coarse quantizer: the nlist
    centroids are seeded gaussians (not k-means-trained), so — unlike
    knn_ivf/knn_ivfpq — the ENTIRE mechanism (argmax-dot list
    assignment, top-nprobe probe, exact cosine rerank) is a
    deterministic closed-form expression that an SQL oracle replays
    bitwise. This is the driver-checkable twin of the trained IVF
    family: same candidate-pruning shape, centroid quality traded for
    verifiability.

    Scale: corpus list assignment is SCAN-LOCAL whole-stage-codegen
    (nlist literal dot chains + one CASE argmax — no shuffle, no
    window); queries explode to nprobe probe rows and broadcast; the
    candidate join touches ~nprobe/nlist of the corpus; the only
    full-width shuffle is the final per-query top-k over candidates.
    """
    cents = _planes(dim, nlist, seed)
    dcols = [
        _hof_dot(vec_col, _lit_arr(pl)).alias(f"_d{i}")
        for i, pl in enumerate(cents)
    ]
    dnames = [f"_d{i}" for i in range(nlist)]
    # first-wins >= chain == deterministic smallest-index argmax
    argmax = "CASE " + " ".join(
        "WHEN "
        + " AND ".join(f"_d{i} >= _d{j}" for j in range(nlist) if j != i)
        + f" THEN {i}"
        for i in range(nlist - 1)
    ) + f" ELSE {nlist - 1} END"
    par = items.sparkSession.sparkContext.defaultParallelism
    c = (
        items.repartition(par)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.sqrt(_hof_dot(vec_col, F.col(vec_col))).alias("c_norm"),
            *dcols,
        )
        .withColumn("list_id", F.expr(argmax).cast("int"))
        .drop(*dnames)
        # stage barrier, deliberately: fusing the nlist dot chains +
        # argmax CASE with the probe join's cosine chain in ONE
        # whole-stage-codegen method exceeds janino's 64KB limit and
        # silently falls back to interpreted eval (~2x slower here).
        # The exchange splits codegen into two compilable stages AND
        # co-locates each inverted list — the layout a persisted IVF
        # index has on disk.
        .repartition("list_id")
    )
    q0 = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(_hof_dot(vec_col, F.col(vec_col))).alias("q_norm"),
        *dcols,
    )
    stack = "stack({}, {}) AS (list_id, cd)".format(
        nlist, ", ".join(f"{i}, _d{i}" for i in range(nlist))
    )
    stacked = q0.selectExpr("q_id", "q_vec", "q_norm", stack)
    w_probe = Window.partitionBy("q_id").orderBy(F.desc("cd"), "list_id")
    probes = (
        stacked.withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= nprobe)
        .select("q_id", "q_vec", "q_norm", F.col("list_id").cast("int").alias("list_id"))
    )
    cand = (
        F.broadcast(probes)
        .join(c, "list_id")
        .filter(F.col("q_id") != F.col("neighbor_id"))
    )
    cos = _hof_dot("q_vec", F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = cand.withColumn("cos_sim", cos)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def semantic_dedup_flat(
    items: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    nlist: int = 8,
    seed: int = 23,
) -> DataFrame:
    """SemDeDup with the FIXED literal coarse quantizer — the driver-
    checkable twin of :func:`semantic_dedup` (k-means is not SQL-
    expressible; the literal argmax-dot quantizer is). Same keep rule:
    within each cluster, an item is dropped when some LOWER-id member
    reaches ``threshold`` cosine; dropped rows carry their best match
    (max cosine, ties to the lowest id). Absent matches encode as
    matched_id = -1 / cos_sim = 0.0 — COALESCE, not NULL, so nullable
    ints never round-trip pandas as float64 (the r3 dtype artifact).

    Scale: assignment is scan-local codegen behind the same stage
    barrier as knn_ivf_flat; the within-cluster compare is a list_id-
    keyed self-join (O(Σ cluster²) — the SemDeDup trade). The TRAINED
    semantic_dedup remains the scale path: it sub-blocks hot clusters
    so no task ever materializes a cluster; this twin is the
    verification instrument on the same mechanism.
    """
    cents = _planes(dim, nlist, seed)
    dcols = [
        _hof_dot(vec_col, _lit_arr(pl)).alias(f"_d{i}")
        for i, pl in enumerate(cents)
    ]
    argmax = "CASE " + " ".join(
        "WHEN "
        + " AND ".join(f"_d{i} >= _d{j}" for j in range(nlist) if j != i)
        + f" THEN {i}"
        for i in range(nlist - 1)
    ) + f" ELSE {nlist - 1} END"
    # repartition first — a small corpus arrives as ONE parquet split
    # and the nlist dot chains would run in a single task (same note as
    # minhash_signatures); at real scale the scan is already split.
    par = items.sparkSession.sparkContext.defaultParallelism
    assigned = (
        items.repartition(par)
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.sqrt(_hof_dot(vec_col, F.col(vec_col))).alias("nrm"),
            *dcols,
        )
        .withColumn("list_id", F.expr(argmax).cast("long"))
        .drop(*[f"_d{i}" for i in range(nlist)])
        # materialize ONCE: three consumers (both join sides + the
        # final keep join) would each re-run the nlist dot chains —
        # measured 3.2s -> 1.1s at sf0.1. The checkpoint is also the
        # stage barrier that keeps the assignment chains and the
        # cosine chain in separate codegen methods (see knn_ivf_flat).
        .localCheckpoint()
    )
    # block-salted within-cluster join: with only nlist join keys the
    # pair compute would coalesce into <= nlist tasks (AQE squeezed it
    # to ONE at sf0.1 — the whole cosine pass serialized). Salting the
    # a-side into B blocks and replicating the b-side across them
    # spreads the pairwise work over B*nlist tasks. The replication is
    # B copies of the CORPUS rows (B a constant parallelism knob, so
    # shuffle volume stays linear) — acceptable for this verification
    # twin; at true corpus scale use the TRAINED semantic_dedup, whose
    # per-cluster block-pair decomposition replicates each row only
    # into its own cluster's ceil(c/block_target) blocks.
    B = items.sparkSession.sparkContext.defaultParallelism
    a = assigned.select(
        "list_id",
        F.pmod(F.col("id"), F.lit(B)).cast("int").alias("blk"),
        F.col("id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        "list_id",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("blk"),
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("nrm").alias("nb"),
    ).withColumn("blk", F.col("blk").cast("int"))
    cos = _hof_dot("vec_a", F.col("vec_b")) / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(b, ["list_id", "blk"])
        .filter(F.col("id_b") < F.col("id_a"))
        .withColumn("cos_sim", cos)
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos_sim"), "id_b")
    best = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("id_a", F.col("id_b").alias("bm_id"), F.col("cos_sim").alias("bm_cos"))
    )
    return (
        assigned.select("id", "list_id")
        .join(best, assigned.id == best.id_a, "left")
        .withColumn(
            "is_kept",
            F.coalesce(F.col("bm_cos") < F.lit(threshold), F.lit(True)),
        )
        .select(
            F.col("id").alias(id_col),
            "list_id",
            "is_kept",
            F.when(F.col("is_kept"), F.lit(-1))
            .otherwise(F.col("bm_id"))
            .cast("long")
            .alias("matched_id"),
            F.when(F.col("is_kept"), F.lit(0.0))
            .otherwise(F.col("bm_cos"))
            .alias("cos_sim"),
        )
    )


# --------------------------------------------------------------------------
# IVF-PQ with FIXED literal quantizers — the driver-checkable twin of
# knn_ivfpq (k-means coarse centroids and residual codebooks are not
# SQL-expressible; seeded-literal ones are, so assignment, PQ encode,
# ADC table-gather scoring, and the exact rerank all replay bitwise in
# the DuckDB oracle).
# --------------------------------------------------------------------------


def pq_flat_params(
    dim: int = DEFAULT_DIM,
    nlist: int = 8,
    m_sub: int = 8,
    ksub: int = 4,
    seed: int = 23,
):
    """Shared literal quantizers for knn_ivfpq_flat and its oracle.

    Returns (centroids, books, bconst) where
    ``bconst[l][m][j] = <centroid_l_sub_m, book_mj> + ||book_mj||^2/2``
    — the per-(list, subspace, codeword) constant that folds the
    residual into the encode argmin: argmin_j ||(v - c_l)_m - b_mj||^2
    == argmax_j (<v_m, b_mj> - bconst[l][m][j]).  Precomputed in plain
    Python floats and interpolated as the SAME literal into both
    engines, so there is no cross-engine arithmetic to drift."""
    dsub = dim // m_sub
    cents = _planes(dim, nlist, seed)
    books = [_planes(dsub, ksub, seed + 1000 + 31 * m) for m in range(m_sub)]
    bconst = [
        [
            [
                sum(
                    cents[li][m * dsub + t] * books[m][j][t]
                    for t in range(dsub)
                )
                + sum(books[m][j][t] * books[m][j][t] for t in range(dsub)) / 2.0
                for j in range(ksub)
            ]
            for m in range(m_sub)
        ]
        for li in range(nlist)
    ]
    return cents, books, bconst


def knn_ivfpq_flat(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    nlist: int = 8,
    m_sub: int = 8,
    ksub: int = 4,
    rerank_factor: int = 4,
    seed: int = 23,
) -> DataFrame:
    """IVF-PQ ANN with FIXED literal quantizers: same plan shape as
    :func:`knn_ivfpq` (coarse-list pruning -> PQ-code scoring scan ->
    exact rerank) but every stage is a closed-form codegen expression
    an SQL oracle replays bitwise.  Quantizer quality is traded for
    verifiability exactly as in :func:`knn_ivf_flat`; the trained
    knn_ivfpq remains the quality/scale instrument on the SAME
    mechanism, so hash-matching this twin certifies that mechanism.

    Plan shape (scale story):
    1. Corpus: argmax-dot coarse assignment (scan-local codegen), then
       per-subspace codeword argmax on the residual folded into
       literal constants — the encoded table is (id, list_id, m_sub
       SMALL codes): the 4*dim-byte float column never reaches the
       scoring scan (the PQ bandwidth claim, here 64 floats -> 8
       codes).  localCheckpoint = the persisted-index posture and the
       janino stage barrier.
    2. Queries: top-nprobe lists by the same literal dots; per-query
       ADC lookup table = m_sub*ksub literal sub-dots, broadcast.
    3. Scoring: candidates = probed lists only (~nprobe/nlist of the
       corpus); adc = <q,c_l> + sum_m LUT[m][code_m] — a pure CASE
       gather over code columns, no float vector touched.
    4. Top ``rerank_factor*k`` per query join BACK to the float table
       for the exact fold-ordered cosine; reported scores are bitwise
       brute-force scores (approximation picks candidates, never
       scores).
    """
    dsub = dim // m_sub
    cents, books, bconst = pq_flat_params(dim, nlist, m_sub, ksub, seed)
    dcols = [
        _hof_dot(vec_col, _lit_arr(pl)).alias(f"_d{i}")
        for i, pl in enumerate(cents)
    ]
    argmax_list = "CASE " + " ".join(
        "WHEN "
        + " AND ".join(f"_d{i} >= _d{j}" for j in range(nlist) if j != i)
        + f" THEN {i}"
        for i in range(nlist - 1)
    ) + f" ELSE {nlist - 1} END"
    par = items.sparkSession.sparkContext.defaultParallelism

    assigned = (
        items.repartition(par)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_v"),
            *dcols,
        )
        .withColumn("list_id", F.expr(argmax_list).cast("int"))
        .drop(*[f"_d{i}" for i in range(nlist)])
        # barrier: keeps the nlist dot chains out of the encode stage's
        # codegen method (janino 64KB cliff — same as knn_ivf_flat)
        .repartition("list_id")
    )
    # per-(m, j) residual score e_mj = <v_sub_m, b_mj> - bconst[list][m][j]
    ecols = []
    for m in range(m_sub):
        sub = F.slice(F.col("_v"), m * dsub + 1, dsub)
        for j in range(ksub):
            lit_b = _lit_arr(books[m][j])
            const_case = "CASE list_id " + " ".join(
                f"WHEN {li} THEN {bconst[li][m][j]!r}D" for li in range(nlist)
            ) + " END"
            ecols.append(
                (_hof_dot(sub, lit_b) - F.expr(const_case)).alias(f"_e{m}_{j}")
            )
    code_cases = [
        (
            "CASE "
            + " ".join(
                "WHEN "
                + " AND ".join(
                    f"_e{m}_{j} >= _e{m}_{jj}" for jj in range(ksub) if jj != j
                )
                + f" THEN {j}"
                for j in range(ksub - 1)
            )
            + f" ELSE {ksub - 1} END"
        )
        for m in range(m_sub)
    ]
    encoded = (
        assigned.select("neighbor_id", "list_id", "_v", *ecols)
        .select(
            "neighbor_id",
            "list_id",
            *[
                F.expr(code_cases[m]).cast("int").alias(f"code_{m}")
                for m in range(m_sub)
            ],
        )
        # the persisted PQ index: id + list + m_sub codes, NO floats —
        # materialized once, every query batch scans only this
        .localCheckpoint()
    )

    qcols = [
        _hof_dot(vec_col, _lit_arr(pl)).alias(f"_d{i}")
        for i, pl in enumerate(cents)
    ]
    lutcols = [
        _hof_dot(F.slice(F.col("q_vec"), m * dsub + 1, dsub), _lit_arr(books[m][j])).alias(
            f"lut_{m}_{j}"
        )
        for m in range(m_sub)
        for j in range(ksub)
    ]
    q0 = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), *qcols
    ).select("q_id", "q_vec", *[f"_d{i}" for i in range(nlist)], *lutcols)
    stack = "stack({}, {}) AS (list_id, cd)".format(
        nlist, ", ".join(f"{i}, _d{i}" for i in range(nlist))
    )
    lut_names = [f"lut_{m}_{j}" for m in range(m_sub) for j in range(ksub)]
    stacked = q0.selectExpr("q_id", *lut_names, stack)
    w_probe = Window.partitionBy("q_id").orderBy(F.desc("cd"), "list_id")
    probes = (
        stacked.withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= nprobe)
        .select(
            "q_id",
            F.col("list_id").cast("int").alias("list_id"),
            "cd",
            *lut_names,
        )
    )
    gather = [
        "CASE code_{m} ".format(m=m)
        + " ".join(f"WHEN {j} THEN lut_{m}_{j}" for j in range(ksub))
        + " END"
        for m in range(m_sub)
    ]
    adc = "cd + " + " + ".join(gather)
    cand = (
        F.broadcast(probes)
        .join(encoded, "list_id")
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("adc_score", F.expr(adc))
    )
    r = rerank_factor * k
    w_adc = Window.partitionBy("q_id").orderBy(
        F.desc("adc_score"), "neighbor_id"
    )
    survivors = (
        cand.withColumn("_rk", F.row_number().over(w_adc))
        .filter(F.col("_rk") <= r)
        .select("q_id", "neighbor_id")
    )
    exact = (
        survivors.join(
            items.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"),
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
                )
            ),
            "q_id",
        )
        .withColumn(
            "cos_sim",
            _hof_dot("q_vec", F.col("c_vec"))
            / (
                F.sqrt(_hof_dot("q_vec", F.col("q_vec")))
                * F.sqrt(_hof_dot("c_vec", F.col("c_vec")))
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def label_centroids_fixed(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean vectors via the L51 fixed-point discipline:
    coordinate sums accumulate as exact floor(x·1e6) integers
    (order-independent), one IEEE division per cell closes, and the
    array is rebuilt in dim order. Returns (label, centroid
    array<double>, n_vecs) — a |labels|-row table, broadcastable.

    Scale: posexplode is scan-local; the aggregate is |labels|·dim
    keys with map-side partials (identical to embedding_label_centroids,
    plans/queries.py L51)."""
    cells = emb.select(
        F.col(label_col).cast("long").alias("label"),
        F.posexplode(vec_col).alias("pos", "x"),
    ).select(
        "label",
        "pos",
        F.floor(F.col("x").cast("double") * F.lit(1000000.0))
        .cast("long")
        .alias("xq"),
    )
    per_cell = cells.groupBy("label", "pos").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("xq").cast("long").alias("sq"),
    )
    return (
        per_cell.groupBy("label")
        .agg(
            F.max("n_vecs").cast("long").alias("n_vecs"),
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("sq"), F.col("n_vecs")))
            ).alias("cells"),
        )
        .select(
            "label",
            "n_vecs",
            F.transform(
                "cells",
                lambda c: c["sq"].cast("double")
                / (c["n_vecs"] * F.lit(1000000)).cast("double"),
            ).alias("centroid"),
        )
    )


def silhouette_scores(
    emb: DataFrame,
    cents: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified silhouette per vector against a small centroid table:
    a = cosine distance (1 − cos) to the OWN-label centroid, b = min
    distance to any OTHER label's centroid, sil = (b−a)/max(a,b).
    Distances are left-folded double chains over the array (the same
    association order as the oracle's literal per-dim expansion).

    Scale: one broadcast join against the |labels|-row centroid table
    per vector — no pairwise vector work."""
    c = F.broadcast(
        cents.select(
            F.col("label").alias("c_label"), F.col("centroid").alias("c_vec")
        )
    )
    v = emb.select(
        F.col("vec_id"),
        F.col(label_col).cast("long").alias("label"),
        F.col(vec_col).alias("vec"),
    )
    j = v.crossJoin(c)
    dot = F.aggregate(
        F.zip_with("vec", "c_vec", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(
            F.transform("vec", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nc = F.sqrt(
        F.aggregate(
            F.transform("c_vec", lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    d = j.select(
        "vec_id",
        "label",
        "c_label",
        (F.lit(1.0) - dot / (nv * nc)).alias("dist"),
    )
    own = d.filter(F.col("label") == F.col("c_label")).select(
        "vec_id", "label", F.col("dist").alias("a")
    )
    other = (
        d.filter(F.col("label") != F.col("c_label"))
        .groupBy("vec_id")
        .agg(F.min("dist").alias("b"))
    )
    return own.join(other, "vec_id").select(
        "vec_id",
        "label",
        "a",
        "b",
        (
            (F.col("b") - F.col("a"))
            / F.greatest(F.col("a"), F.col("b"))
        ).alias("sil"),
    )


def build_ivfpq_index(
    items: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    m_sub: int = 8,
    ksub: int = 16,
    sample_rows: int = 4096,
    seed: int = 7,
) -> None:
    """Persist the FAISS-style IVF-PQ index :func:`knn_ivfpq` computes
    inline — write once, serve many (the same posture as
    :func:`build_ivf_index` / :func:`build_sq_codes`, completing the
    persisted-index trio). Layout:

    - ``{path}/centroids``  — nlist coarse centroids (driver-tiny),
    - ``{path}/codebooks``  — m_sub × ksub residual codebook rows,
    - ``{path}/codes``      — (id, pq_code) ``partitionBy(list_id)``:
      m_sub bytes per vector instead of 4·dim — the 32× scan shrink is
      the point; probed-list pruning becomes PARTITION pruning,
    - ``{path}/vectors``    — full-precision (id, vector) for the
      exact rerank (candidate-sized random access, never scanned).

    Training sample = lowest ``sample_rows`` ids (deterministic), so a
    rebuild over base ∪ appended-higher-ids trains identically — the
    property the append-equivalence tests pin.
    """
    spark = items.sparkSession
    par = spark.sparkContext.defaultParallelism
    sample = _train_sample(items, id_col, vec_col, sample_rows)
    X = _matrix(sample)
    C = _kmeans_centroids(X, nlist, seed=seed)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    books = _pq_codebooks(X - C[d2.argmin(axis=1)], m_sub, ksub, seed)

    cent_rows = [
        (int(i), [float(v) for v in C[i]]) for i in range(len(C))
    ]
    spark.createDataFrame(
        cent_rows, "list_id long, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    book_rows = [
        (int(m), int(j), [float(v) for v in books[m][j]])
        for m in range(books.shape[0])
        for j in range(books.shape[1])
    ]
    spark.createDataFrame(
        book_rows, "m long, j long, codeword array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")

    _ivfpq_encode_append(
        items.repartition(par), path, C, books, id_col, vec_col, "overwrite"
    )


def _ivfpq_encode_append(
    new_items: DataFrame,
    path: str,
    C,
    books,
    id_col: str,
    vec_col: str,
    mode: str,
) -> int:
    spark = new_items.sparkSession
    bc = spark.sparkContext.broadcast((C, books))

    def encode(batches):
        Cm, Bm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = _matrix(pdf[vec_col])
            dd = ((V[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
            assign = dd.argmin(axis=1)
            codes = _pq_encode(V - Cm[assign], Bm)
            out = pdf[[id_col, vec_col]].copy()
            out["list_id"] = assign.astype("int64")
            out["pq_code"] = [row.tolist() for row in codes]
            yield out

    encoded = new_items.mapInPandas(
        encode,
        schema=f"{id_col} long, {vec_col} array<float>, "
        "list_id long, pq_code array<int>",
    ).localCheckpoint()
    n = encoded.count()
    encoded.select(id_col, "list_id", "pq_code").write.partitionBy(
        "list_id"
    ).mode(mode).parquet(f"{path}/codes")
    encoded.select(id_col, vec_col).write.mode(
        "append" if mode == "append" else "overwrite"
    ).parquet(f"{path}/vectors")
    return n


def append_to_ivfpq_index(
    new_items: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental IVF-PQ maintenance — the PQ member of the append
    family (:func:`append_to_ivf_index` / :func:`append_to_sq_codes`):
    encode ONLY the new batch against the STORED coarse centroids and
    codebooks and append to the list partitions + vector table.
    Quantizers stay fixed (retrain on drift, the FAISS posture), so
    index+append ≡ a rebuild whose training sample lies in the base.
    Returns appended rows."""
    spark = new_items.sparkSession
    cent = spark.read.parquet(f"{path}/centroids").orderBy("list_id").toPandas()
    C = np.stack([np.asarray(v, dtype=np.float64) for v in cent["centroid"]])
    bk = spark.read.parquet(f"{path}/codebooks").orderBy("m", "j").toPandas()
    m_sub = int(bk["m"].max()) + 1
    ksub = int(bk["j"].max()) + 1
    dsub = len(bk["codeword"].iloc[0])
    books = np.zeros((m_sub, ksub, dsub))
    for _, row in bk.iterrows():
        books[int(row["m"]), int(row["j"])] = np.asarray(row["codeword"])
    return _ivfpq_encode_append(
        new_items, path, C, books, id_col, vec_col, "append"
    )


def knn_ivfpq_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rerank_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve top-k from a persisted IVF-PQ index: probed lists prune as
    PARTITIONS of the code table (never a full scan), scoring is the
    ADC table-gather over m_sub-byte codes, and the exact rerank joins
    the candidate-sized survivor set back to the stored full-precision
    vectors — reported cos_sim is bitwise the brute-force chain."""
    cent = spark.read.parquet(f"{path}/centroids").orderBy("list_id").toPandas()
    C = np.stack([np.asarray(v, dtype=np.float64) for v in cent["centroid"]])
    bk = spark.read.parquet(f"{path}/codebooks").orderBy("m", "j").toPandas()
    m_sub = int(bk["m"].max()) + 1
    ksub = int(bk["j"].max()) + 1
    dsub = len(bk["codeword"].iloc[0])
    books = np.zeros((m_sub, ksub, dsub))
    for _, row in bk.iterrows():
        books[int(row["m"]), int(row["j"])] = np.asarray(row["codeword"])

    q_pdf = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).toPandas()
    Q = _matrix(q_pdf["q_vec"])
    qd2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd2, axis=1)[:, :nprobe]
    lut = np.einsum("qmd,mjd->qmj", Q.reshape(len(Q), m_sub, dsub), books)
    qc_dot = Q @ C.T
    bc_q = spark.sparkContext.broadcast(
        (q_pdf["q_id"].to_numpy(), probes, lut, qc_dot)
    )
    probe_union = sorted({int(p) for p in probes.ravel()})
    pruned = spark.read.parquet(f"{path}/codes").filter(
        F.col("list_id").isin(probe_union)
    )
    r = rerank_factor * k

    def adc_score(batches):
        q_ids, probe_lists, LUT, QC = bc_q.value
        probing: dict[int, list[int]] = {}
        for qi, pl in enumerate(probe_lists):
            for li in pl:
                probing.setdefault(int(li), []).append(qi)
        m_idx = np.arange(LUT.shape[1])
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            lists = pdf["list_id"].to_numpy()
            codes = np.stack([np.asarray(c) for c in pdf["pq_code"]])
            for li in np.unique(lists):
                qis = probing.get(int(li))
                if not qis:
                    continue
                rmask = lists == li
                ids_s, codes_s = ids[rmask], codes[rmask]
                gathered = LUT[qis][:, m_idx[None, :], codes_s]
                for row_i, qi in enumerate(qis):
                    score = gathered[row_i].sum(axis=1) + QC[qi, li]
                    not_self = ids_s != q_ids[qi]
                    sc, cands_ = score[not_self], ids_s[not_self]
                    if not len(sc):
                        continue
                    top = np.lexsort((cands_, -sc))[: min(r, len(sc))]
                    yield pd.DataFrame(
                        {
                            "q_id": q_ids[qi],
                            "neighbor_id": cands_[top],
                            "adc_score": sc[top],
                        }
                    )

    cands = pruned.mapInPandas(
        adc_score, schema="q_id long, neighbor_id long, adc_score double"
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.desc("adc_score"), F.col("neighbor_id")
    )
    survivors = (
        cands.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= r)
        .select("q_id", "neighbor_id")
    )
    vectors = spark.read.parquet(f"{path}/vectors")
    exact = (
        survivors.join(
            vectors.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"),
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
                )
            ),
            "q_id",
        )
        .withColumn("cos_sim", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )
