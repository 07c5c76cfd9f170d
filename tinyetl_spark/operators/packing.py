"""Token-budget shard packing — the last step of a training-data
pipeline: lay the curated corpus out as fixed-budget shards ("fill each
shard with ~100M tokens, in a stable document order") so downstream
loaders stream uniform units.

The natural formulation is a running sum of per-doc weights over the
global document order — but a bare `Window.orderBy(id)` funnels the
whole corpus through ONE task (Spark warns, then dies at scale). This
implements the classic two-level distributed prefix sum instead:

1. chunk the id space (`id // chunk_size` — deterministic, no sampling,
   order-aligned by construction),
2. aggregate one weight-sum row per chunk and prefix-sum THOSE — a
   window over O(ids / chunk_size) tiny rows, broadcast back,
3. per-chunk exclusive cumsum (window partitioned BY chunk — parallel),
   global prefix = chunk offset + intra-chunk cumsum.

At 10^10 docs with chunk_size 10^6 the serial step sees 10^4 rows; the
data path is one groupBy shuffle + one partitioned window. A doc's shard
is the shard its first token lands in (floor of the exclusive prefix /
budget), so shard ids are dense, monotone in id, and a doc larger than
the budget occupies its own shard(s) — deterministic for any engine
that can compute a running sum, which is what the DuckDB oracle does.

No reference equivalent (TinyETL has no sharding surface); part of the
training-data operator set (SURVEY.md §2.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_shards(df: DataFrame, id_col: str, weight_col: str,
                shard_weight: int, chunk_size: int = 1 << 20) -> DataFrame:
    """Assign every row a ``shard_id`` so consecutive ids (by ``id_col``)
    fill shards of ~``shard_weight`` total ``weight_col``.

    ``chunk_size`` trades serial-step size against chunk granularity:
    the only non-parallel work is a window over one row per occupied
    chunk. Weights must be non-negative; ids must be unique.
    """
    if shard_weight < 1:
        raise ValueError(f"shard_weight must be >= 1, got {shard_weight}")
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    idc, w = F.col(id_col), F.col(weight_col)
    chunked = df.withColumn("_chunk", F.floor(idc / F.lit(chunk_size)))
    per_chunk = chunked.groupBy("_chunk").agg(F.sum(w).alias("_cw"))
    head = Window.orderBy("_chunk") \
                 .rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_chunk.select(
        "_chunk", F.coalesce(F.sum("_cw").over(head), F.lit(0))
                   .alias("_off"))
    intra = Window.partitionBy("_chunk").orderBy(id_col) \
                  .rowsBetween(Window.unboundedPreceding, -1)
    pre = (F.col("_off")
           + F.coalesce(F.sum(w).over(intra), F.lit(0))).cast("long")
    return (chunked.join(F.broadcast(offsets), "_chunk")
                   .withColumn("_pre", pre)
                   .withColumn("shard_id",
                               F.expr(f"_pre div {int(shard_weight)}"))
                   .drop("_chunk", "_off", "_pre"))


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_size: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Split each document into fixed-size token chunks with overlap —
    the pre-training prep step between curation and shard packing (one
    training example per chunk; the overlap keeps context across chunk
    boundaries).

    Chunks start at token positions 1, 1+stride, ... (stride =
    chunk_size - overlap); a start is kept iff it is the first OR sits
    at most ``n - overlap`` (this covers every token with no chunk that
    is a pure suffix of its predecessor — the last kept chunk always
    reaches the end because start + chunk_size - 1 > n - 1 + stride -
    stride = n - 1). Docs with empty text produce no chunks.

    Returns (id, chunk_id 1-based, text, n_tokens) — pure Catalyst
    (tokenize + sequence + filter + posexplode + slice), zero shuffle,
    zero Python; fuses into the scan projection at any scale.
    """
    if overlap < 0 or overlap >= chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = df.select(
        F.col(id_col), F.split(norm, " ").alias("_toks")
    ).filter(norm != "")
    n = F.size("_toks")
    starts = F.filter(
        F.sequence(F.lit(1), n, F.lit(stride)),
        lambda s: (s == 1) | (s <= n - F.lit(overlap)))
    return (toks.select(
                id_col,
                F.posexplode(starts).alias("_i", "_s"), "_toks")
                .select(
                    F.col(id_col),
                    (F.col("_i") + 1).alias("chunk_id"),
                    F.array_join(
                        F.slice("_toks", F.col("_s"), chunk_size), " ")
                     .alias(text_col),
                    F.least(F.lit(chunk_size), n - F.col("_s") + 1)
                     .alias("n_tokens")))
