"""Three-decade ingest-scale certification for the streaming dedup
paths (P27 minhash docs, P27b embedding vectors).

The ingest modules claim "work per batch scales with the BATCH, never
with corpus²" (streaming/ingest_dedup.py docstring). This tool turns
that claim into a measured curve: for each corpus decade (sf0.1 →
sf1 → sf10, 100x), it seeds the persisted signature / feature index
from the decade's full corpus, then pushes the SAME fixed probe batch
(500 rows drawn deterministically from sf0.1, ids offset out of the
corpus key space) through the committed batch function and times each
batch end to end — index read, probe join, intra-batch dedup, sink +
index writes.

Reading the curve: per-batch cost has a corpus-linear term (the probe
scans the persisted index — at 100 TB that is the columnar scan of a
signature sidecar, not the corpus itself) plus a batch-sized term.
The certified property is that the per-batch wall grows FAR slower
than the corpus (ratio at 100x corpus << 100x), i.e. the probe never
shuffles or re-pairs the corpus. A superlinear or ~100x reading here
means the batch side lost its broadcast pin or the corpus got
shuffled — the defect class the r10 sf10 probe caught in
ngram_jaccard_pairs.

    python tools/make_scaled_sf.py --mult 10  --out .artifacts/sf1
    python tools/make_scaled_sf.py --mult 100 --out .artifacts/sf10
    python tools/ingest_scale_cert.py [--out INGEST_SCALE_CERT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
BATCH_ROWS = 500
N_BATCHES = 3
ID_OFFSET = 1_000_000_000


DECADE_SUBSET: list[str] = []


def _decades() -> dict[str, str]:
    full = {
        "sf0.1": SF01,
        "sf1": os.path.join(REPO, ".artifacts", "sf1"),
        "sf10": os.path.join(REPO, ".artifacts", "sf10"),
    }
    if DECADE_SUBSET:
        return {k: v for k, v in full.items() if k in DECADE_SUBSET}
    return full


def _fixed_doc_batches(spark):
    """N_BATCHES fixed 500-doc batches from sf0.1 (same rows at every
    decade), ids offset above every corpus key. Every ODD row is
    token-remapped (the make_scaled_sf replica trick: zero shared
    shingles with the corpus) so each batch is half known near-dups
    (must drop) and half fresh content (must survive) — both the
    probe-hit and the survivor-write paths get exercised and timed."""
    docs = (
        spark.read.parquet(f"{SF01}/documents.parquet")
        .orderBy("doc_id")
        .limit(BATCH_ROWS * N_BATCHES)
        .collect()
    )
    out = []
    for b in range(N_BATCHES):
        rows = docs[b * BATCH_ROWS : (b + 1) * BATCH_ROWS]
        data = []
        for i, r in enumerate(rows):
            text = r["text"]
            if i % 2 == 1:
                text = " ".join(
                    f"{tok}qzc{b}" for tok in text.split()
                )
            data.append((r["doc_id"] + ID_OFFSET * (b + 1), text))
        out.append(
            spark.createDataFrame(
                data, "doc_id long, text string"
            ).coalesce(4)
        )
    return out


def _fixed_vec_batches(spark):
    vecs = (
        spark.read.parquet(f"{SF01}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(BATCH_ROWS * N_BATCHES)
        .collect()
    )
    out = []
    for b in range(N_BATCHES):
        rows = vecs[b * BATCH_ROWS : (b + 1) * BATCH_ROWS]
        data = []
        for i, r in enumerate(rows):
            vec = r["embedding"]
            if i % 2 == 1:  # fresh: negated vector (cosine -1 vs original)
                vec = [-x for x in vec]
            data.append((r["vec_id"] + ID_OFFSET * (b + 1), vec))
        out.append(
            spark.createDataFrame(
                data, "vec_id long, embedding array<float>"
            ).coalesce(4)
        )
    return out


def cert_minhash(spark, work: str) -> dict:
    from dimagi_data_platform_spark.operators.minhash import minhash_signatures
    from dimagi_data_platform_spark.streaming.ingest_dedup import (
        ingest_batch_dedup,
    )

    batches = _fixed_doc_batches(spark)
    res = {}
    for decade, sf_dir in _decades().items():
        idx = os.path.join(work, f"mh_idx_{decade}")
        out = os.path.join(work, f"mh_out_{decade}")
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = corpus.count()
        t0 = time.time()
        minhash_signatures(corpus).write.mode("overwrite").parquet(
            f"{idx}/batch_id=0"
        )
        t_seed = round(time.time() - t0, 3)
        t_batches = []
        for b, bdf in enumerate(batches, start=1):
            bdf = bdf.localCheckpoint()  # exclude batch construction
            t0 = time.time()
            ingest_batch_dedup(spark, bdf, b, idx, out)
            t_batches.append(round(time.time() - t0, 3))
        kept = spark.read.parquet(out).count()
        res[decade] = {
            "corpus_docs": n_docs,
            "t_index_seed": t_seed,
            "t_batches": t_batches,
            "t_batch_min": min(t_batches),
            "batch_rows": BATCH_ROWS,
            "kept_total": kept,
        }
        print(json.dumps({"path": "minhash", "decade": decade, **res[decade]}),
              flush=True)
    return res


def cert_embed(spark, work: str) -> dict:
    from dimagi_data_platform_spark.streaming.ingest_embed_dedup import (
        DEFAULT_BUCKET_BITS,
        ingest_batch_embed_dedup,
        seed_embed_dedup_index,
    )

    batches = _fixed_vec_batches(spark)
    res = {}
    for decade, sf_dir in _decades().items():
        idx = os.path.join(work, f"em_idx_{decade}")
        out = os.path.join(work, f"em_out_{decade}")
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_vecs = corpus.count()
        t0 = time.time()
        # the seed helper writes features AND the _bits.json sidecar,
        # so a probe at a mismatched bucket_bits fails loudly instead
        # of silently matching nothing
        seed_embed_dedup_index(
            corpus, idx, bucket_bits=DEFAULT_BUCKET_BITS
        )
        t_seed = round(time.time() - t0, 3)
        t_batches = []
        for b, bdf in enumerate(batches, start=1):
            bdf = bdf.localCheckpoint()
            t0 = time.time()
            ingest_batch_embed_dedup(spark, bdf, b, idx, out)
            t_batches.append(round(time.time() - t0, 3))
        kept = spark.read.parquet(out).count()
        res[decade] = {
            "corpus_vecs": n_vecs,
            "t_index_seed": t_seed,
            "t_batches": t_batches,
            "t_batch_min": min(t_batches),
            "batch_rows": BATCH_ROWS,
            "kept_total": kept,
        }
        print(json.dumps({"path": "embed", "decade": decade, **res[decade]}),
              flush=True)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(REPO, "INGEST_SCALE_CERT.json")
    )
    ap.add_argument("--work", default=os.path.join(REPO, ".artifacts", "ingest_cert"))
    ap.add_argument("--decades", default="", help="comma subset, e.g. sf0.1,sf1")
    ap.add_argument("paths", nargs="*", help="subset: minhash embed")
    args = ap.parse_args()
    if args.decades:
        DECADE_SUBSET[:] = args.decades.split(",")

    from dimagi_data_platform_spark.session import get_spark

    spark = get_spark("ingest-scale-cert")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.work, exist_ok=True)

    report: dict = {
        "protocol": (
            f"{N_BATCHES} fixed {BATCH_ROWS}-row probe batches (same rows "
            "at every decade) through the committed ingest batch "
            "functions against a corpus-seeded persisted index; "
            "per-batch wall includes index read, probe, intra-batch "
            "dedup, and both idempotent writes. t_batch_min is the "
            "comparison statistic (later batches pay the same corpus "
            "term; the min strips warmup noise)."
        ),
    }
    if not args.paths or "minhash" in args.paths:
        report["minhash"] = cert_minhash(spark, args.work)
    if not args.paths or "embed" in args.paths:
        report["embed"] = cert_embed(spark, args.work)
    # MERGE into any existing artifact rather than overwrite: the
    # committed JSON can carry sections (historical probes, decades or
    # paths not in this run's subset) that a fresh run would otherwise
    # silently destroy, replacing a full certification with a partial
    # one.
    merged: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    for key, val in report.items():
        if key in ("minhash", "embed") and isinstance(merged.get(key), dict):
            merged[key].update(val)  # per-decade merge
        else:
            merged[key] = val
    for path in ("minhash", "embed"):
        d = merged.get(path, {})
        if "sf10" in d and "sf0.1" in d:
            r = round(d["sf10"]["t_batch_min"] / d["sf0.1"]["t_batch_min"], 2)
            merged[f"{path}_batch_cost_x_at_100x_corpus"] = r
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
