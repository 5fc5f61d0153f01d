"""Approximate sketch aggregations — the 100 TB path for distincts and
percentiles.

Exact COUNT(DISTINCT) is a two-phase shuffle of every distinct key;
HLL++ (`approx_count_distinct`) is one pass, fixed memory, mergeable.
Exact percentiles need a full sort per group; KLL/GK-style
`percentile_approx` is one pass with bounded error. Both are the right
default at scale, with the exact queries kept as the correctness gate.

Not SQL-oracle-checkable (engine-specific sketch internals) → rows-only
in the driver gate + error-bound tests in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], key: str, rsd: float = 0.02
) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(key, rsd).alias(f"approx_distinct_{key}")
    )


def approx_percentiles_by(
    df: DataFrame,
    group_cols: list[str],
    value: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    agg = F.percentile_approx(
        value, F.array(*[F.lit(p) for p in percentiles]), accuracy
    ).alias("approx_pcts")
    out = df.groupBy(*group_cols).agg(agg)
    for i, p in enumerate(percentiles):
        out = out.withColumn(f"p{int(p * 100)}", F.col("approx_pcts")[i])
    return out.drop("approx_pcts")


def mg_partials(df: DataFrame, key: str, capacity: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries: (key, partial_count), at
    most ``capacity`` rows per partition. The mergeable first stage of
    heavy_hitters — also reused by the streaming maintenance path
    (streaming/heavy_hitters_stream.py), whose per-batch summaries sum
    under the same additive error bound."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for val, cnt in pdf[key].value_counts().items():
                counters[val] = counters.get(val, 0) + int(cnt)
            excess = len(counters) - capacity
            if excess > 0:
                by_count = sorted(counters.items(), key=lambda kv: kv[1])
                dec = by_count[excess - 1][1]
                counters = {
                    v: c - dec for v, c in by_count[excess:] if c > dec
                }
        if counters:
            yield pd.DataFrame(
                {key: list(counters), "partial_count": list(counters.values())}
            )

    field = df.schema[key].dataType.simpleString()
    return df.select(key).mapInPandas(
        summarize, schema=f"{key} {field}, partial_count long"
    )


def heavy_hitters(
    df: DataFrame,
    key: str,
    capacity: int = 64,
    top_k: int = 20,
) -> DataFrame:
    """Misra-Gries heavy hitters over ``key`` — (key, est_count) for
    the ``top_k`` most frequent values, without a full groupBy of every
    distinct key.

    Each partition keeps a capped summary of ``capacity`` counters
    (classic Misra-Gries: overflow decrements all counters, evicting
    zeros), so per-partition state is O(capacity) and the shuffle
    carries at most ``capacity`` rows per partition — vs the exact
    groupBy whose shuffle is every distinct key in the dataset. After
    summing per-partition summaries, any value with true frequency
    > N/capacity is guaranteed present, and every estimate e satisfies
    true - N/capacity <= e <= true (per-partition bounds add under
    merge). The estimate is a LOWER bound, so ordering by it never
    promotes a rare key above a frequent one by more than the bound.

    Batches update via vectorized value_counts; the decrement loop
    touches only the O(capacity) summary dict.
    """
    partials = mg_partials(df, key, capacity)
    return (
        partials.groupBy(key)
        .agg(F.sum("partial_count").alias("est_count"))
        .orderBy(F.desc("est_count"), key)
        .limit(top_k)
    )


def _cms_row_buckets(key, width: int, depth: int, seed: int):
    """One struct per sketch row: (row_id, bucket) from independently
    seeded PORTABLE hashes — shared by build and probe so both sides
    hash identically (pure codegen, no Python). The hash is the repo's
    engine-portable idiom (md5 → 60-bit prefix → mod width; identical
    text yields the identical cell in Spark AND DuckDB/Postgres), so a
    sketch built here can be probed — and oracle-checked — anywhere."""
    col = F.col(key) if isinstance(key, str) else key
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_id"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws(":", F.lit(str(seed + i)), col)),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(width)
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key: str, width: int = 2048, depth: int = 4, seed: int = 7
) -> DataFrame:
    """Count-Min Sketch of ``key`` frequencies: (row_id, bucket, cnt),
    at most depth*width rows regardless of input size.

    ONE scan: the depth bucket assignments fan out scan-locally via
    explode, and the aggregate's map-side partials are bounded by
    depth*width counters per task — the shuffle carries sketch cells,
    never keys. Mergeable by construction (cell-wise addition), so
    per-day sketches roll up to any grain with a second tiny aggregate,
    and estimates are one-sided: est >= true always, est <= true +
    eps*N with probability 1 - (1/2)^depth for width = 2/eps (Cormode &
    Muthukrishnan). The exact-groupBy twin stays the correctness gate.
    """
    return (
        df.select(F.explode(_cms_row_buckets(key, width, depth, seed)).alias("rb"))
        .select("rb.row_id", "rb.bucket")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys_df: DataFrame,
    key: str,
    width: int = 2048,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Point-estimate frequencies for ``keys_df[key]`` from a
    :func:`cms_build` sketch: hash each probe key with the SAME seeded
    chain, broadcast-join the (<= depth*width row) sketch, and take the
    min counter across rows. Probe work scales with the probe set, not
    the corpus the sketch summarized."""
    probes = keys_df.select(
        key, F.explode(_cms_row_buckets(key, width, depth, seed)).alias("rb")
    ).select(key, "rb.row_id", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(key)
        .agg(F.min("cnt").cast("long").alias("est_count"))
    )


def kmv_hash(col) -> Column:
    """Portable KMV hash: 15-hex md5 prefix as a 60-bit long — exact
    on both engines (the minhash idiom), so KMV sketches are bitwise-
    reproducible unlike HLL binaries."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_partial(
    df: DataFrame, key: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per-group KMV sketch: the k smallest DISTINCT hash values of
    ``key`` (dedup before ranking so tie order never matters).
    Returns (group_cols..., h) rows — at most k per group; the
    persistable sketch artifact."""
    h = kmv_hash(key)
    per = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        per.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(*group_cols, "h")
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge KMV sketches to the (coarser) ``group_cols`` grain: hash
    SET union, re-take the k smallest. Associative and idempotent —
    per-batch/per-cell partials merge to exactly the sketch of the
    union (the defining mergeable-sketch property, here bitwise)."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        sketches.select(*group_cols, "h")
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(*group_cols, "h")
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Distinct-count estimate per group: (k-1)/(h_k/2^60) when the
    sketch is full, exact sketch size below k (Bar-Yossef et al.
    2002). ONE IEEE division — hash-checkable end to end."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("h").cast("long").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / (F.col("kth_hash").cast("double") / F.lit(float(2**60)))
    )
    return agg.withColumn("approx_distinct", est)


# --------------------------------------------------------------------------
# Exactness-banded DETERMINISTIC sketch companions (r13, VERDICT r12
# item 4 — the R91 DDSketch discipline applied to the HLL / quantile /
# heavy-hitter trio): each eval emits a sketch estimate NEXT TO the
# exact value with the realized error, and the estimator itself is
# md5-derived + integer/IEEE-arithmetic-only, so BOTH columns replay
# bitwise in the DuckDB twin. The engine-native sketches above
# (approx_count_distinct / percentile_approx / Misra-Gries partials)
# stay registered rows-only for the native surface; these companions
# make the approximation CONTRACT itself oracle-checkable.
# --------------------------------------------------------------------------

HLL_P_BITS = 8  # 256 registers; standard error ~1.04/sqrt(256) = 6.5%
_HLL_M = 1 << HLL_P_BITS
# alpha_256 (Flajolet et al. 2007) as a literal both engines parse
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_POW2_53 = float(1 << 53)


def hll_distinct_eval(
    df: DataFrame, group_cols: list[str], key: str
) -> DataFrame:
    """Deterministic HLL distinct-count per group WITH the exactness
    band: (group, est_distinct, exact_distinct, rel_err, v_empty).

    The sketch is a faithful HyperLogLog (Flajolet et al. 2007) whose
    hash is md5 (engine-portable, the minhash/simhash discipline):
    register = first 8 md5 hex bits, rho = leading-zero rank of the
    next 52 bits (computed as 53 − bitlength via ``bin()``, no
    floats). Register maxima aggregate exactly; the harmonic-mean
    denominator Σ2^(−Mj) is computed as the EXACT integer
    Σ2^(53−Mj) (Mj ≤ 53, so every term is a positive long), and the
    estimate is a fixed left-to-right chain of IEEE +,*,/ on
    exactly-derived inputs — bitwise identical across engines. The
    small-range linear-counting branch m·ln(m/V) takes ln only from a
    LITERAL integer lookup (``_ln_int_literal``). Mergeable by
    construction: per-partition register maxima combine under max —
    the same property the native HLL++ path relies on.

    Scale: one distinct shuffle at (group, key) grain, then a
    256-rows-per-group register aggregate; the exact column is the
    correctness-gate cost, not the serving path's.
    """
    regs = hll_registers(df, group_cols, key)
    est = _hll_estimate(regs, group_cols)
    exact = df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(key)).cast("long").alias("exact_distinct")
    )
    return (
        est.join(exact, group_cols)
        .withColumn(
            "rel_err",
            F.col("est_distinct") / F.col("exact_distinct").cast("double")
            - F.lit(1.0),
        )
        .select(
            *group_cols, "est_distinct", "exact_distinct", "rel_err", "v_empty"
        )
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], key: str
) -> DataFrame:
    """The deterministic HLL SKETCH itself: per group, the occupied
    registers (``__reg``) with their rho maxima (``mj``) — md5 hash,
    so identical in any engine. This IS the mergeable state: sketches
    union by register-wise MAX (``hll_merge``), the property the
    production hll_sketch_agg/hll_union_agg rollup relies on."""
    el = df.select(*group_cols, F.col(key).cast("string").alias("__k")).distinct()
    h = F.md5(F.col("__k"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    w = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    # rho = leading-zero rank of the 52-bit window, 1-indexed:
    # 53 - bitlength(w); an all-zero window scores the cap 53.
    rho = F.when(F.col("__w") == F.lit(0), F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(F.col("__w")))
    )
    return (
        el.select(*group_cols, reg.alias("__reg"), w.alias("__w"))
        .withColumn("__rho", rho.cast("long"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("mj"))
    )


def hll_merge(regs: DataFrame, to_cols: list[str]) -> DataFrame:
    """Union-merge sketches DOWN to a coarser grain: register-wise MAX
    over the surviving group columns — exactly hll_union_agg's
    semantics, and exactly equal to re-sketching the raw keys at the
    coarse grain (max is associative), which is what makes persisted
    fine-grain sketches answer any coarser distinct query without a
    rescan."""
    return regs.groupBy(*to_cols, "__reg").agg(F.max("mj").alias("mj"))


def _hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., est_distinct, v_empty) from a register table — exact
    dyadic harmonic sum, literal-ln linear-counting branch, fixed IEEE
    op order (see hll_distinct_eval)."""
    per = regs.groupBy(*group_cols).agg(
        F.sum(
            # SQL-form shiftleft: the PySpark wrapper only takes a
            # literal shift amount
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mj AS INT))")
        )
        .cast("long")
        .alias("s_scaled"),
        F.count(F.lit(1)).cast("long").alias("occupied"),
    )
    v = (F.lit(_HLL_M) - F.col("occupied")).cast("long")
    # every EMPTY register contributes 2^-0 = 1 to the harmonic sum,
    # i.e. 2^53 in the scaled-integer form
    raw = (
        F.lit(_HLL_ALPHA)
        * F.lit(float(_HLL_M * _HLL_M))
        * F.lit(_POW2_53)
        / (
            F.col("s_scaled") + F.col("v_empty") * F.lit(1 << 53).cast("long")
        ).cast("double")
    )
    import math

    ln_v = F.expr(
        "CASE CAST(v_empty AS INT) "
        + " ".join(
            f"WHEN {x} THEN CAST({math.log(x)!r} AS DOUBLE)"
            for x in range(1, _HLL_M)
        )
        + " END"
    )
    est = F.when(
        (F.col("raw_est") <= F.lit(2.5 * _HLL_M)) & (F.col("v_empty") > 0),
        F.lit(float(_HLL_M)) * (F.lit(math.log(_HLL_M)) - ln_v),
    ).otherwise(F.col("raw_est"))
    return (
        per.withColumn("v_empty", v)
        .withColumn("raw_est", raw)
        .withColumn("est_distinct", est)
        .select(*group_cols, "est_distinct", "v_empty")
    )


def hll_union_rollup_eval(
    df: DataFrame,
    fine_cols: list[str],
    coarse_cols: list[str],
    key: str,
) -> DataFrame:
    """L37b: the MERGEABLE-ROLLUP companion of segment_distinct_union
    with the exactness band — persist deterministic HLL sketches at
    the FINE grain, answer the COARSE-grain distinct query by
    register-wise union-merge (never rescanning the keys), and emit
    the merged estimate NEXT TO the exact coarse distinct count, the
    realized relative error, and the number of fine sketches merged.
    Because ``max`` is associative the merged registers are provably
    identical to direct coarse-grain sketching — the property that
    lets a 100 TB warehouse store per-(day, shard) sketches once and
    serve any rollup; here that identity is hash-checked against the
    DuckDB twin end to end rather than asserted."""
    fine = hll_registers(df, fine_cols, key)
    n_sketches = (
        fine.select(*fine_cols)
        .distinct()
        .groupBy(*coarse_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_fine_sketches"))
    )
    merged = hll_merge(fine, coarse_cols)
    est = _hll_estimate(merged, coarse_cols)
    exact = df.groupBy(*coarse_cols).agg(
        F.count_distinct(F.col(key)).cast("long").alias("exact_distinct")
    )
    return (
        est.join(exact, coarse_cols)
        .join(n_sketches, coarse_cols)
        .withColumn(
            "rel_err",
            F.col("est_distinct") / F.col("exact_distinct").cast("double")
            - F.lit(1.0),
        )
        .select(
            *coarse_cols,
            "n_fine_sketches",
            "est_distinct",
            "exact_distinct",
            "rel_err",
            "v_empty",
        )
    )


def sampled_quantile_eval(
    df: DataFrame,
    group_cols: list[str],
    value: str,
    key: str,
    percentiles: tuple[int, ...] = (50, 90, 99),
    pct_keep: int = 20,
) -> DataFrame:
    """Deterministic hash-sampled quantiles per group WITH the
    exactness band: for each (group, q) emit the rank-at-ceil quantile
    of an md5-Bernoulli sample (keep iff md5(key) mod 100 < pct_keep)
    next to the exact quantile and the realized relative error. The
    sample is the canonical bounded-memory quantile path when a
    mergeable sketch is unavailable: deterministic (replayable,
    mergeable by union), one scan, expected pct_keep% state.

    Both quantiles ride per-(group, value) counts + a value-grain
    running sum — never a row-grain sort window.
    """
    hsel = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    base = df.select(
        *group_cols, F.col(value).alias("v"), hsel.alias("__h")
    )

    def rank_quantiles(rows: DataFrame, est_name: str) -> DataFrame:
        per_v = rows.groupBy(*group_cols, "v").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        wcum = (
            Window.partitionBy(*group_cols)
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = per_v.withColumn("cum", F.sum("c").over(wcum).cast("long"))
        tot = per_v.groupBy(*group_cols).agg(
            F.sum("c").cast("long").alias("n")
        )
        probes = tot.select(
            *group_cols,
            "n",
            F.explode(
                F.array(*[F.lit(q) for q in percentiles])
            ).alias("q"),
        ).withColumn(
            "target", F.expr("CAST((q * n + 99) DIV 100 AS BIGINT)")
        )
        return (
            cum.join(probes, group_cols)
            .filter(F.col("cum") >= F.col("target"))
            .groupBy(*group_cols, "q", "n")
            .agg(F.min("v").alias(est_name))
        )

    est = rank_quantiles(
        base.filter(F.col("__h") < pct_keep), "est_value"
    ).withColumnRenamed("n", "n_sample")
    exact = rank_quantiles(base, "exact_value").withColumnRenamed(
        "n", "n_total"
    )
    # LEFT join from the exact side: a group whose Bernoulli sample is
    # empty stays visible (NULL est_value/n_sample) instead of being
    # silently dropped; rel_err is NULL (not inf/undefined) when the
    # exact quantile is zero or negative (ADVICE r13).
    return (
        exact.join(est, group_cols + ["q"], "left")
        .withColumn(
            "rel_err",
            F.when(
                F.col("exact_value") > 0,
                F.col("est_value").cast("double")
                / F.col("exact_value").cast("double")
                - F.lit(1.0),
            ),
        )
        .select(
            *group_cols, "q", "n_total", "n_sample", "est_value",
            "exact_value", "rel_err",
        )
    )


def frequent_summary_eval(
    terms: DataFrame,
    key: str,
    owner: str,
    n_shards: int = 32,
    capacity: int = 64,
    top_k: int = 20,
) -> DataFrame:
    """Deterministic Misra-Gries ("Frequent") heavy hitters WITH the
    exactness band: (key, est_count, exact_count, underestimate,
    bound_total). Classic MG is order-dependent (the decrement cascade
    follows the stream); the batch-equivalent summary used here is
    ORDER-INVARIANT and therefore engine-replayable: per deterministic
    shard (md5 of the ``owner`` column mod ``n_shards``), count keys
    exactly, keep the ``capacity`` heaviest (count desc, key), and
    subtract the (capacity+1)-th count from each — the standard
    offset form of the MG summary with the identical guarantee
    true − thr ≤ est ≤ true per shard. Summaries merge by summing, so
    global: exact − Σ_shard thr ≤ est ≤ exact; bound_total = Σ thr is
    emitted so the realized underestimate is checkable against the
    theoretical bound on every row.

    Scale: the shuffle carries ≤ (capacity+1) rows per (shard) after
    the per-shard aggregate — the same bounded-state contract as the
    streaming MG partials; the exact column is the gate's cost.
    """
    shard = (
        F.conv(F.substring(F.md5(F.col(owner).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % n_shards
    )
    per = terms.select(F.col(key).alias("k"), shard.alias("shard")).groupBy(
        "shard", "k"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wrk = Window.partitionBy("shard").orderBy(F.desc("c"), "k")
    ranked = per.withColumn("rk", F.row_number().over(wrk))
    thr = ranked.filter(F.col("rk") == capacity + 1).select(
        "shard", F.col("c").alias("thr")
    )
    partials = (
        ranked.filter(F.col("rk") <= capacity)
        .join(thr, "shard", "left")
        .select(
            "k",
            (F.col("c") - F.coalesce(F.col("thr"), F.lit(0))).alias("p"),
        )
        .filter(F.col("p") > 0)
    )
    est = partials.groupBy("k").agg(F.sum("p").cast("long").alias("est_count"))
    exact = per.groupBy("k").agg(F.sum("c").cast("long").alias("exact_count"))
    bound = thr.agg(F.sum("thr").cast("long").alias("bound_total"))
    return (
        est.join(exact, "k")
        .crossJoin(F.broadcast(bound))
        .withColumn(
            "underestimate", (F.col("exact_count") - F.col("est_count")).cast("long")
        )
        .select(
            F.col("k").alias(key),
            "est_count",
            "exact_count",
            "underestimate",
            F.coalesce(F.col("bound_total"), F.lit(0)).cast("long").alias("bound_total"),
        )
        .orderBy(F.desc("est_count"), key)
        .limit(top_k)
    )
