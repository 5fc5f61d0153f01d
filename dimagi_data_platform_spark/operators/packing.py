"""Training-batch assembly operators: deterministic corpus shuffle +
sharding, greedy sequence packing, and cross-corpus span dedup.

These are the last-mile ops between a cleaned corpus and a training
run: give every document a reproducible pseudo-random position
(shard_assign), bin documents into fixed token budgets so no context
window is wasted (pack_documents), and drop exact span repeats across
the corpus the way CCNet/Gopher pipelines drop duplicated lines
(span_dedup).

Scale posture:
- shard_assign is a projection + one row_number shuffle keyed by shard;
  shard count is a knob — raise it with corpus size so per-shard
  position windows stay bounded.
- pack_documents runs the inherently-sequential first-fit scan per
  shard, but only over the NARROW (id, hash, n_tokens) projection
  (~24 bytes/row — a 10^10-doc corpus across 4096 shards is ~6 MB per
  group), then joins assignments back to full rows. Shards are the
  parallel unit; packing never sees document text.
- span_dedup shuffles once on span_text for the first-occurrence
  window and once on doc_id for reassembly; spans are fixed-width, so
  volume is ~n_tokens/span_width rows of short strings.

The per-row hash is the md5-derived 60-bit integer (identical in every
engine), so all three outputs are deterministic and fully
oracle-checkable — reproducibility is a feature here: re-running the
pipeline on the same corpus must yield byte-identical shards/packs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dimagi_data_platform_spark.functions.text import tokens, ws_token_count


def _portable_hash(id_col: str, tag: str):
    """60-bit md5-prefix hash of ``id || tag`` — non-negative, and
    bit-identical in DuckDB via CAST('0x'||substr(md5(..),1,15) AS
    BIGINT)."""
    tagged = F.concat(F.col(id_col).cast("string"), F.lit(tag))
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")


def shard_assign(
    df: DataFrame,
    n_shards: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, pos): deterministic global shuffle into n_shards.

    ``pos`` is the row's position within its shard under hash order —
    together (shard, pos) is a reproducible random permutation of the
    corpus, the thing a training loader needs so that run N and run
    N+1 read identical batches.
    """
    h = _portable_hash(id_col, f"#shard{seed}")
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), h.alias("h"))
        .withColumn("shard", F.col("h") % n_shards)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def pack_documents(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, shard, pack_id, n_tokens): greedy first-fit packing.

    Documents are scanned in shard-hash order; a document goes into the
    current pack unless that would exceed ``budget`` tokens, in which
    case it starts the next pack (a document longer than the budget
    gets a pack of its own). The scan is sequential BY DESIGN — pack
    boundaries depend on every prior document — so the parallel unit is
    the shard and the per-shard scan runs in one Arrow batch over the
    narrow projection.
    """
    h = _portable_hash(id_col, f"#shard{seed}")
    narrow = docs.select(
        F.col(id_col),
        h.alias("h"),
        ws_token_count(text_col).alias("n_tokens"),
    ).withColumn("shard", F.col("h") % n_shards)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["h", id_col]).reset_index(drop=True)
        pack_ids = []
        pack_id, acc = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if pack_id == 0 or acc + t > budget:
                pack_id += 1
                acc = t
            else:
                acc += t
            pack_ids.append(pack_id)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf[[id_col, "shard", "pack_id", "n_tokens"]]

    return narrow.groupBy("shard").applyInPandas(
        pack, schema=f"{id_col} long, shard long, pack_id long, n_tokens long"
    )


def span_dedup(
    docs: DataFrame,
    span_width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_spans, n_kept, clean_text): drop exact repeated spans.

    Text splits into consecutive non-overlapping ``span_width``-token
    spans; only the globally FIRST occurrence of each span text (by
    (doc_id, span index)) survives, and each document is reassembled
    from its surviving spans in order — the line-dedup step of
    CCNet-style corpus cleaning, expressed as explode → one
    first-occurrence window on span_text → ordered re-aggregation.
    """
    t = tokens(text_col)
    n_spans = F.ceil(F.size(t) / F.lit(span_width)).cast("int")
    span_at = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.concat_ws(
            " ", F.slice(t, (i * span_width + 1).cast("int"), span_width)
        ),
    )
    spans = docs.select(
        F.col(id_col), F.posexplode(span_at).alias("idx", "span_text")
    )
    w = Window.partitionBy("span_text").orderBy(id_col, "idx")
    marked = spans.withColumn("keep", F.row_number().over(w) == 1)
    kept_struct = F.when(F.col("keep"), F.struct("idx", "span_text"))
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["span_text"],
            ),
        ).alias("clean_text"),
    )
