"""Artifact-replay oracles for the TRAINED-quantizer queries
(VERDICT r8 item 7) — promoting knn_ivf / knn_sq_rerank /
semantic_dedup / knn_ivfpq from rows-only to hash-gated.

The trained quantizers are deterministic given the data: the training
sample is ``ORDER BY vec_id LIMIT 4096`` (operators/similarity.py
``_train_sample``), k-means is seeded driver-side numpy
(``_kmeans_centroids``), and every assignment/probe is a pure function
of (data, trained values). So the oracle generator re-derives the SAME
trained values OUTSIDE Spark — DuckDB reads the parquet, the *actual*
training functions run on the same float64 matrix — and interpolates
them into generated SQL, exactly the flat-twin trick
(``_ivf_flat_sql`` / ``_sq_flat_sql``) but with real trained
parameters:

- ``knn_ivf``: item→list assignments (probed lists only) and per-query
  probe sets interpolate as literal tables; cosine scoring + top-k
  ranking run IN SQL (the full fold chain, like knn_bruteforce).
- ``knn_sq_rerank``: the trained per-dimension scales interpolate as
  literals; quantization, integer-dot candidate selection, and the
  exact rerank all run IN SQL (the knn_sq_flat shape).
- ``semantic_dedup``: cluster assignments interpolate; the
  within-cluster >=threshold lower-id best-match and keep rule run IN
  SQL (the semantic_dedup_flat shape, NULL-encoded kept rows).
- ``knn_ivfpq``: trained selection (coarse assign → ADC lookup-table
  scoring → top-R survivors) replays in numpy — the ADC sums are
  numpy-reduction-ordered, not a SQL left fold, so re-deriving them in
  SQL could flip candidates on last-ulp ties — and the survivor sets
  interpolate as literals; the exact cosine rerank + final ranking
  (the part the query actually REPORTS) run IN SQL.

Still rows-only, with the reason: ``unigram_tokenizer_train`` (hard-EM
with an Arrow Viterbi E-step — the training loop itself is the output
and is not SQL-expressible; its fixed-vocab encode twin
``unigram_viterbi_encode`` is hash-gated), and the engine-internal
sketches ``approx_*`` / ``segment_distinct_union`` (HLL++/KLL/
Misra-Gries internals are engine-specific by design; their mergeable
portable twins ``segment_distinct_kmv`` / ``cms_term_counts`` /
``order_value_ddsketch`` are hash-gated).

The generator is keyed by sf_dir: the driver gate runs at sf0.01 (the
default); tests/parity.py points it at whatever sf it checks via
``SPARK_GRAFT_ORACLE_SF``.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from dimagi_data_platform_spark.plans.oracle import _COS_QC, _vdot


def _load_embeddings(sf_dir: str):
    """(ids, X float64) ordered by vec_id — the same rows and order the
    Spark paths see (vec_id is unique, so ORDER BY vec_id is total)."""
    import duckdb

    p = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(p):
        return None, None
    pdf = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{p}' ORDER BY vec_id"
    ).fetchdf()
    if not len(pdf):
        return np.array([], dtype=np.int64), np.zeros((0, 64))
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return pdf["vec_id"].to_numpy(), X


def _centroids(X: np.ndarray, nlist: int, seed: int = 7) -> np.ndarray:
    from dimagi_data_platform_spark.operators.similarity import (
        _kmeans_centroids,
    )

    sample = X[:4096]  # ORDER BY id LIMIT 4096 == first rows of sorted X
    if not len(sample):
        sample = np.zeros((1, 64))
    return _kmeans_centroids(sample, nlist, seed=seed)


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """The exact mapInPandas assignment expression (row-independent, so
    batching cannot change it)."""
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1)


def _values(rows, cast="BIGINT") -> str:
    return ", ".join(
        "(" + ", ".join(f"CAST({v} AS {cast})" for v in r) + ")" for r in rows
    )


def _knn_ivf_sql(ids, X, k=5, nlist=64, nprobe=4) -> str:
    C = _centroids(X, nlist)
    qmask = ids < 10
    Q = X[qmask]
    q_ids = ids[qmask]
    qd2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd2, axis=1)[:, :nprobe]  # same call as _ivf_score
    probe_rows = [
        (int(q_ids[i]), int(li))
        for i in range(len(q_ids))
        for li in probes[i]
    ]
    probe_union = {int(p) for p in probes.ravel()}
    asn = _assign(X, C)
    asn_rows = [
        (int(ids[i]), int(asn[i]))
        for i in range(len(ids))
        if int(asn[i]) in probe_union
    ]
    if not probe_rows or not asn_rows:
        return (
            "SELECT CAST(NULL AS BIGINT) AS q_id, CAST(NULL AS BIGINT) AS "
            "neighbor_id, CAST(NULL AS DOUBLE) AS cos_sim, CAST(NULL AS "
            'BIGINT) AS "rank" WHERE FALSE'
        )
    return f"""
WITH probes(q_id, list_id) AS (VALUES {_values(probe_rows)}),
asn(vec_id, list_id) AS (VALUES {_values(asn_rows)}),
base AS (
  SELECT vec_id, embedding,
         sqrt({_vdot('embedding', 'embedding')}) AS nrm
  FROM embeddings),
q AS (
  SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_norm
  FROM base WHERE vec_id < 10),
c AS (
  SELECT b.vec_id AS neighbor_id, b.embedding AS c_vec, b.nrm AS c_norm,
         asn.list_id
  FROM base b JOIN asn USING (vec_id)),
scored AS (
  SELECT q_id, neighbor_id,
         {_vdot('q_vec', 'c_vec')} / (q_norm * c_norm) AS cos_sim
  FROM probes JOIN q USING (q_id) JOIN c USING (list_id)
  WHERE q_id <> neighbor_id),
r AS (
  SELECT q_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT)
           AS "rank"
  FROM scored)
SELECT q_id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= {k}
"""


def _knn_sq_sql(ids, X, k=5, rerank_factor=4, dim=64) -> str:
    """The _sq_flat_sql shape with the TRAINED per-dimension scales
    interpolated (one literal divisor per element instead of the flat
    twin's single scale)."""
    S = X[:4096] if len(X) else np.zeros((1, dim))
    scales = np.maximum(np.abs(S).max(axis=0) / 127.0, 1e-12)
    r = rerank_factor * k

    def code(src: str) -> str:
        els = ", ".join(
            f"GREATEST(-127, LEAST(127, CAST(round(CAST({src}[{i + 1}] AS "
            f"DOUBLE) / ({float(s)!r})) AS INT)))"
            for i, s in enumerate(scales)
        )
        return f"[{els}]"

    idot = "(CAST(0 AS BIGINT) + " + " + ".join(
        f"CAST(q_code[{i}] AS BIGINT) * CAST(c_code[{i}] AS BIGINT)"
        for i in range(1, dim + 1)
    ) + ")"
    return f"""
WITH c AS (
  SELECT vec_id AS neighbor_id, embedding AS c_vec,
         {code('embedding')} AS c_code
  FROM embeddings),
q AS (
  SELECT vec_id AS q_id, embedding AS q_vec,
         {code('embedding')} AS q_code
  FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q_id, neighbor_id, q_vec, c_vec, {idot} AS int_score
  FROM q CROSS JOIN c WHERE q_id <> neighbor_id),
cand AS (
  SELECT q_id, neighbor_id, q_vec, c_vec FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY int_score DESC, neighbor_id) AS crk
    FROM scored)
  WHERE crk <= {r}),
ex AS (
  SELECT q_id, neighbor_id, {_COS_QC} AS cos_sim FROM cand),
rr AS (
  SELECT q_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT)
           AS "rank"
  FROM ex)
SELECT q_id, neighbor_id, cos_sim, "rank" FROM rr WHERE "rank" <= {k}
"""


def _semantic_dedup_sql(ids, X, threshold=0.35, nlist=16) -> str:
    C = _centroids(X, nlist)
    asn = _assign(X, C)
    asn_rows = [(int(ids[i]), int(asn[i])) for i in range(len(ids))]
    if not asn_rows:
        return (
            "SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS BIGINT) AS "
            "list_id, CAST(NULL AS BOOLEAN) AS is_kept, CAST(NULL AS BIGINT) "
            "AS matched_id, CAST(NULL AS DOUBLE) AS cos_sim WHERE FALSE"
        )
    return f"""
WITH asn(vec_id, list_id) AS (VALUES {_values(asn_rows)}),
a AS (
  SELECT e.vec_id AS id, e.embedding AS vec,
         sqrt({_vdot('e.embedding', 'e.embedding')}) AS nrm, asn.list_id
  FROM embeddings e JOIN asn ON asn.vec_id = e.vec_id),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, a.list_id,
         {_vdot('a.vec', 'b.vec')} / (a.nrm * b.nrm) AS cos_sim
  FROM a JOIN a b USING (list_id)
  WHERE b.id < a.id),
best AS (
  SELECT id_a, id_b AS bm_id, cos_sim AS bm_cos
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY id_a ORDER BY cos_sim DESC, id_b) AS rk
        FROM pairs WHERE cos_sim >= {threshold!r})
  WHERE rk = 1)
SELECT a.id AS vec_id, a.list_id,
       best.id_a IS NULL AS is_kept,
       best.bm_id AS matched_id,
       best.bm_cos AS cos_sim
FROM a LEFT JOIN best ON best.id_a = a.id
"""


def _knn_ivfpq_sql(
    ids, X, k=5, nlist=16, nprobe=6, m_sub=8, ksub=16, rerank_factor=8
) -> str:
    from dimagi_data_platform_spark.operators.similarity import (
        _pq_codebooks,
        _pq_encode,
    )

    S = X[:4096] if len(X) else np.zeros((1, 64))
    C = _centroids(X, nlist)
    d2s = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    books = _pq_codebooks(S - C[d2s.argmin(axis=1)], m_sub, ksub, seed=7)
    # encode the corpus exactly like the mapInPandas pass
    asn = _assign(X, C)
    codes = _pq_encode(X - C[asn], books)
    qmask = ids < 10
    Q, q_ids = X[qmask], ids[qmask]
    if not len(Q):
        return (
            "SELECT CAST(NULL AS BIGINT) AS q_id, CAST(NULL AS BIGINT) AS "
            "neighbor_id, CAST(NULL AS DOUBLE) AS cos_sim, CAST(NULL AS "
            'BIGINT) AS "rank" WHERE FALSE'
        )
    qd2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd2, axis=1)[:, :nprobe]
    dsub = Q.shape[1] // m_sub
    lut = np.einsum("qmd,mjd->qmj", Q.reshape(len(Q), m_sub, dsub), books)
    qc_dot = Q @ C.T
    r = rerank_factor * k
    # replay the ADC selection: per probed list, score = LUT gather +
    # coarse term; global top-R per query (desc score, asc id) — the
    # same lexsort/window rule as the Spark plan
    surv_rows: list[tuple[int, int]] = []
    for qi in range(len(Q)):
        cand_scores: list[tuple[float, int]] = []
        for li in probes[qi]:
            rmask = asn == li
            ids_s, codes_s = ids[rmask], codes[rmask]
            if not len(ids_s):
                continue
            score = lut[qi][np.arange(m_sub)[None, :], codes_s].sum(
                axis=1
            ) + qc_dot[qi, li]
            not_self = ids_s != q_ids[qi]
            cand_scores += list(zip(score[not_self], ids_s[not_self]))
        cand_scores.sort(key=lambda t: (-t[0], t[1]))
        surv_rows += [
            (int(q_ids[qi]), int(nid)) for _, nid in cand_scores[:r]
        ]
    if not surv_rows:
        return (
            "SELECT CAST(NULL AS BIGINT) AS q_id, CAST(NULL AS BIGINT) AS "
            "neighbor_id, CAST(NULL AS DOUBLE) AS cos_sim, CAST(NULL AS "
            'BIGINT) AS "rank" WHERE FALSE'
        )
    return f"""
WITH surv(q_id, neighbor_id) AS (VALUES {_values(surv_rows)}),
ex AS (
  SELECT surv.q_id, surv.neighbor_id, {_COS_QC} AS cos_sim
  FROM surv
  JOIN (SELECT vec_id, embedding AS q_vec FROM embeddings) q
    ON q.vec_id = surv.q_id
  JOIN (SELECT vec_id, embedding AS c_vec FROM embeddings) c
    ON c.vec_id = surv.neighbor_id),
rr AS (
  SELECT q_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT)
           AS "rank"
  FROM ex)
SELECT q_id, neighbor_id, cos_sim, "rank" FROM rr WHERE "rank" <= {k}
"""


@lru_cache(maxsize=4)
def generate_trained_oracles(sf_dir: str) -> dict[str, str]:
    """Trained-quantizer oracle SQL for one sf_dir (cached — training
    the tiny quantizers takes ~1 s)."""
    ids, X = _load_embeddings(sf_dir)
    if ids is None:
        return {}
    return {
        "knn_ivf": _knn_ivf_sql(ids, X),
        "knn_sq_rerank": _knn_sq_sql(ids, X),
        "semantic_dedup": _semantic_dedup_sql(ids, X),
        "knn_ivfpq": _knn_ivfpq_sql(ids, X),
    }
