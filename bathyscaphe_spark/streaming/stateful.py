"""Custom stateful streaming operator: online URL-seen deduplication.

The batch engine dedupes per round (D1/D2); a live deployment that
consumes a continuous URL stream needs the same semantics online.  This
is the ``applyInPandasWithState`` pattern from the north-star guidance:
state is keyed by a hash shard (bounded key cardinality, each shard's
state is a compact uint64 hash set), every micro-batch emits only the
URLs whose hash was never seen in any earlier batch.

Exactness matches the batch engine: first occurrence wins, duplicates
within and across micro-batches are dropped.  State survives process
restarts via the checkpoint — pair with a DURABLE sink (foreachBatch →
parquet); the memory sink cannot recover from a checkpoint.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

N_SHARDS_DEFAULT = 64

OUTPUT_SCHEMA = StructType(
    [StructField("url", StringType()), StructField("url_hash", LongType())]
)
STATE_SCHEMA = StructType([StructField("seen", StringType())])  # csv of hashes


def _dedup_shard(key, pdfs, state: GroupState):
    seen: set[int] = set()
    if state.exists:
        (csv,) = state.get
        if csv:
            seen = {int(x) for x in csv.split(",")}
    out_urls: list[str] = []
    out_hashes: list[int] = []
    for pdf in pdfs:
        for url, h in zip(pdf["url"], pdf["url_hash"]):
            h = int(h)
            if h not in seen:
                seen.add(h)
                out_urls.append(url)
                out_hashes.append(h)
    state.update((",".join(str(x) for x in sorted(seen)),))
    yield pd.DataFrame({"url": out_urls, "url_hash": out_hashes})


def streaming_seen_dedup(
    url_stream: DataFrame, n_shards: int = N_SHARDS_DEFAULT
) -> DataFrame:
    """url_stream(url, url_hash) → first-occurrence stream.

    Keyed by ``url_hash % n_shards`` so state is hash-partitioned across
    executors exactly like the batch seen table; at real scale the state
    store backend (RocksDB) holds each shard.
    """
    keyed = url_stream.withColumn(
        "_shard", F.pmod(F.col("url_hash"), F.lit(n_shards))
    )
    return keyed.groupBy("_shard").applyInPandasWithState(
        _dedup_shard,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
