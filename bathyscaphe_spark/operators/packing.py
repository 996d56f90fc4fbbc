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
