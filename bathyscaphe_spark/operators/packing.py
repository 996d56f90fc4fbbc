"""Sequence packing: greedy fill of fixed-capacity training chunks.

LLM pretraining consumes fixed-length token windows; feeding one short
document per window wastes most of it, so pipelines PACK documents
back-to-back into chunks of ≤ capacity tokens (the public GPT/T5
"example packing" recipe).  Greedy first-fit-in-order is the standard
variant: walk documents in a canonical order, append to the open chunk,
start a new chunk when the next document would overflow (an oversized
document gets a chunk of its own).

Packing is inherently sequential *within* an ordered stream — so the
unit of parallelism is the GROUP (source, shard, language bucket …):
each group packs independently, and chunk ids only need to be unique
within a group (training shards are written per group anyway).  That is
exactly Spark's ``applyInPandas`` shape: one shuffle on the group key,
then a per-group kernel that is a single O(n) integer pass over numpy
arrays.  Groups at 100 TB are whatever granularity keeps them
executor-sized — hash-bucket the corpus into ~10⁵ groups and the
biggest group is a few GB.

Determinism: order within a group is (id ASC); the kernel is pure
integer arithmetic — identical output at any parallelism, mirrored
exactly by a recursive-CTE oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each row a ``chunk_id`` (0-based per group) by greedy
    first-fit packing in ``id_col`` order.  Input columns are passed
    through; adds ``chunk_id: long``.

    Rows with ``tokens > capacity`` occupy a chunk alone; rows with
    null/negative token counts pack as 0 tokens.
    """
    out_schema = (
        f"{group_col} string, {id_col} long, {tokens_col} long, chunk_id long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = (
            pdf[tokens_col].fillna(0).clip(lower=0).to_numpy(dtype=np.int64)
        )
        chunk = np.empty(len(toks), dtype=np.int64)
        cid, fill = 0, 0
        for i, t in enumerate(toks):
            if i > 0 and fill + t > capacity:
                cid += 1
                fill = 0
            fill += t
            chunk[i] = cid
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                id_col: pdf[id_col],
                tokens_col: toks,
                "chunk_id": chunk,
            }
        )

    return (
        df.select(group_col, id_col, tokens_col)
        .groupBy(group_col)
        .applyInPandas(_pack, schema=out_schema)
    )


def chunk_stats(packed: DataFrame, group_col: str, tokens_col: str) -> DataFrame:
    """Packing-efficiency summary per group: chunks, docs, token fill."""
    per_chunk = packed.groupBy(group_col, "chunk_id").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(tokens_col).alias("fill"),
    )
    return per_chunk.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("docs").alias("n_docs"),
        F.sum("fill").alias("total_tokens"),
        F.max("fill").alias("max_fill"),
    )


def shard_balance(
    docs: DataFrame,
    key_col: str,
    tokens_col: str,
    n_shards: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """Assign documents to ``n_shards`` output shards with near-equal
    TOKEN totals — the balanced-writer step after packing/mixing: a
    training run reads shards in parallel, so the slowest shard is the
    epoch's critical path and hash-only assignment leaves the tail to
    luck.

    Two-phase, scale-shaped like ``token_budget_sample``: documents
    hash (md5, engine-stable) into ``n_buckets`` buckets; per-bucket
    token sums (ONE map-side-combinable aggregation, n_buckets rows)
    are ranked by (tokens desc, bucket asc) and dealt to shards in
    SERPENTINE order (0..K-1, K-1..0, …) — the classic LPT-flavored
    greedy at bucket granularity; the tiny bucket→shard map broadcasts
    back onto the documents.  Balance error is bounded by the largest
    bucket, so raise ``n_buckets`` as the corpus grows (10⁵ buckets at
    100 TB keeps buckets ~GB-sized); the only Window runs over the
    BUCKET table, never the corpus.

    Output: input columns + (bucket, shard).  Deterministic,
    bit-identical at any parallelism.
    """
    k = int(n_shards)
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(int(n_buckets)),
    )
    with_b = docs.withColumn("bucket", bucket)
    sums = with_b.groupBy("bucket").agg(
        F.sum(F.col(tokens_col)).cast("long").alias("_btok")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("_btok"), F.asc("bucket"))
    r = F.row_number().over(w) - 1
    assign = sums.select(
        "bucket",
        F.when(
            (r.cast("long") % (2 * k)) < k, r.cast("long") % (2 * k)
        )
        .otherwise(2 * k - 1 - (r.cast("long") % (2 * k)))
        .alias("shard"),
    )
    return with_b.join(F.broadcast(assign), "bucket").select(
        *docs.columns, "bucket", "shard"
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Split each document's token sequence into training windows of
    ≤ ``size`` tokens advancing by ``stride`` (overlap = size − stride;
    the public HF ``return_overflowing_tokens`` convention) — the
    long-document step BEFORE ``pack_sequences``: packing fills chunks
    with whole rows, so a 100k-token page must first become windows or
    it occupies an oversized chunk alone and the tail of the document
    never trains.

    Window starts are k·stride for k = 0..k_last with
    k_last = ceil((n − size)/stride) clamped at 0 — the first window
    that reaches the document's end is the last (no fully-contained
    duplicate tail windows), a ≤ size document yields exactly one
    window, and an empty document yields none (explode semantics).

    Pure codegen: split → sequence → explode → slice; the fan-out is
    ~n/stride rows per document with no shuffle at all — chunking is a
    map-only stage whatever the corpus size, and the (id, chunk_idx)
    key is deterministic at any parallelism.

    Output: (id, chunk_idx, start, n_tokens, chunk_text).
    """
    if not (1 <= stride <= size):
        raise ValueError(f"need 1 <= stride <= size, got {stride}/{size}")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    t = df.select(F.col(id_col), toks.alias("_t")).where(F.size("_t") > 0)
    k_last = F.expr(
        f"CASE WHEN size(_t) <= {size} THEN 0"
        f" ELSE (size(_t) - {size} + {stride} - 1) DIV {stride} END"
    )
    exploded = t.select(
        id_col,
        "_t",
        F.explode(F.sequence(F.lit(0), k_last.cast("int"))).alias("chunk_idx"),
    )
    start = F.col("chunk_idx").cast("long") * stride
    chunk = F.slice(F.col("_t"), start.cast("int") + 1, size)
    return exploded.select(
        id_col,
        F.col("chunk_idx"),
        start.alias("start"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
