"""Sharded Bloom filter over the URL-seen set.

The reference bounds seen-set memory by storing 64-bit FNV hashes instead
of URLs (scheduler.go:106-107, issue #130).  At 10^10-URL scale even the
hash set is ~80 GB — too big to broadcast whole.  The north-star design
maintains a **sharded Bloom filter** over the ``seen`` table as broadcast
executor-side state — built distributed once, then *incrementally folded*
each round with ``or_delta`` (O(Δ) per round; a full-table rebuild only
when the capacity doubles — amortized O(1) rescans):

* shard = ``url_hash % num_shards`` — at real scale only the shards a
  partition can touch need to be resident (here all shards broadcast,
  since the sandbox filter is ~MBs),
* k bit positions per key derive from the 64-bit FNV hash itself by
  double hashing — no re-hashing of the URL string,
* the filter is built distributed: each partition ORs its keys into a
  local bit array (numpy, vectorized) and ``treeReduce(bitwise_or)``
  combines them logarithmically.

Exactness: the Bloom filter is only a router.  Candidates that are
*definitely new* (bit miss) skip the shuffle entirely; the *maybe seen*
remainder goes through the exact anti-join.  No false drops, strictly
less shuffle volume — at 10^10-frontier scale the bit-miss fast path is
the common case for freshly discovered URLs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


class ShardedBloom:
    def __init__(self, bits_per_shard: int, num_shards: int, num_hashes: int,
                 packed: np.ndarray):
        self.bits_per_shard = bits_per_shard
        self.num_shards = num_shards
        self.num_hashes = num_hashes
        self.packed = packed  # uint8, size num_shards * bits_per_shard / 8

    # -- bit math (vectorized, shared by build and probe) -------------------
    @staticmethod
    def _positions(h_signed: np.ndarray, bits_per_shard: int, num_shards: int,
                   num_hashes: int) -> np.ndarray:
        """Global bit indices, shape (n, k)."""
        h = h_signed.astype(np.uint64)
        shard = (h % np.uint64(num_shards)).astype(np.uint64)
        h1 = h >> np.uint64(1)
        # mix for the second hash (splitmix-style constant)
        h2 = (h * np.uint64(0x9E3779B97F4A7C15)) ^ (h >> np.uint64(31))
        h2 = h2 | np.uint64(1)  # odd
        i = np.arange(num_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(bits_per_shard)
        return (shard[:, None] * np.uint64(bits_per_shard) + pos).astype(np.int64)

    @staticmethod
    def sized_params(expected_items: int, fpp: float = 0.01,
                     num_shards: int = 8) -> tuple[int, int, int]:
        """(bits_per_shard, num_shards, num_hashes) for a target capacity.
        Deterministic — two filters sized for the same capacity are
        bit-compatible and can be OR-combined."""
        n = max(expected_items, 1)
        m_total = int(-n * math.log(fpp) / (math.log(2) ** 2))
        bits_per_shard = max(64, (m_total // num_shards + 63) // 64 * 64)
        k = max(1, round(bits_per_shard * num_shards / n * math.log(2)))
        return bits_per_shard, num_shards, min(k, 8)

    @classmethod
    def _packed_from(cls, df: DataFrame, col: str, bits_per_shard: int,
                     num_shards: int, num_hashes: int) -> np.ndarray:
        """Distributed bit-array build: each partition ORs its keys into a
        local array; ``treeReduce(bitwise_or)`` combines logarithmically."""
        nbytes = num_shards * bits_per_shard // 8
        bps, ns, k = bits_per_shard, num_shards, num_hashes

        def _build_partition(rows):
            arr = np.zeros(nbytes, dtype=np.uint8)
            hashes = np.fromiter((r[0] for r in rows if r[0] is not None),
                                 dtype=np.int64)
            if hashes.size:
                idx = cls._positions(hashes, bps, ns, k).ravel()
                np.bitwise_or.at(arr, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
            yield arr

        return (
            df.select(col).rdd
            .mapPartitions(_build_partition)
            .treeReduce(np.bitwise_or)
        )

    @classmethod
    def build(cls, df: DataFrame, col: str, expected_items: int,
              fpp: float = 0.01, num_shards: int = 8) -> "ShardedBloom":
        """Distributed build from a hash column (long)."""
        bps, ns, k = cls.sized_params(expected_items, fpp, num_shards)
        return cls(bps, ns, k, cls._packed_from(df, col, bps, ns, k))

    def or_delta(self, df: DataFrame, col: str) -> "ShardedBloom":
        """Return a NEW filter = self ∪ the delta's keys (bloom insertion
        is a commutative OR, so incrementally folding each round's seen Δ
        is bit-identical to a from-scratch rebuild at the same capacity).
        The input array is copied, never mutated — a broadcast of the old
        filter stays valid."""
        delta = self._packed_from(
            df, col, self.bits_per_shard, self.num_shards, self.num_hashes
        )
        return ShardedBloom(
            self.bits_per_shard, self.num_shards, self.num_hashes,
            np.bitwise_or(self.packed, delta),
        )

    def might_contain_np(self, h_signed: np.ndarray) -> np.ndarray:
        if h_signed.size == 0:
            return np.zeros(0, dtype=bool)
        idx = self._positions(
            h_signed, self.bits_per_shard, self.num_shards, self.num_hashes
        )
        bits = (self.packed[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return bits.all(axis=1)


def bloom_anti_join(
    cand: DataFrame, seen_keys: DataFrame, col: str, bloom: ShardedBloom
) -> DataFrame:
    """Exact anti-join accelerated by the Bloom router.

    ``definitely new`` (bit miss) bypasses the shuffle; ``maybe seen``
    goes through the exact left-anti join.  Result set is identical to a
    plain anti-join.
    """
    spark = cand.sparkSession
    b = spark.sparkContext.broadcast(bloom)

    @pandas_udf(BooleanType())
    def _might_contain(s: pd.Series) -> pd.Series:
        h = s.to_numpy(dtype=np.int64, na_value=0)
        return pd.Series(b.value.might_contain_np(h))

    flagged = cand.withColumn("_maybe_seen", _might_contain(F.col(col)))
    definitely_new = flagged.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = (
        flagged.where(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(seen_keys, col, "left_anti")
    )
    return definitely_new.unionByName(maybe)
