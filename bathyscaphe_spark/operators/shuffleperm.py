"""Deterministic global corpus shuffle via a Feistel-network bijection.

Every training epoch wants the corpus in a fresh pseudorandom order,
and at 100 TB the obvious tools are all wrong: ``ORDER BY rand()`` is
nondeterministic under retries, ``ORDER BY md5(id)`` collides (two
docs, one key — ties broken by physical order, i.e. by partitioning),
and materializing a shuffled copy per epoch multiplies storage by the
epoch count.  The classic fix (public: Black & Rogaway's cycle-walking
ciphers, and the shuffle used by tf.data / webdataset-style loaders)
is a **format-preserving permutation**: a small Feistel network over a
power-of-two domain maps every id to a unique pseudorandom position —
a bijection by construction, so ties are IMPOSSIBLE, no tiebreaker
column, no comparison of hash bytes.

    pos = feistel(id, keys(epoch))          # 4 rounds, 2k-bit domain

Properties that matter at scale:

* **pure codegen** — four rounds of shift/xor/multiply-add are JVM
  column expressions; one narrow projection, zero shuffles of its own.
  The epoch order is then ``ORDER BY pos`` (or range-partition by
  ``pos`` for shard-parallel readers) — exactly one exchange, the one
  any global reorder must pay;
* **O(1) state per epoch** — the permutation is the four round keys;
  nothing is materialized, any shard of the epoch can be regenerated
  independently (reader k takes ``pos % n_shards = k``);
* **bit-identical at any parallelism** — positions depend only on
  (id, epoch), never on partition layout, so re-runs, retries and
  different cluster sizes agree;
* **int64-exact** — with half-width ``k ≤ 23`` bits the largest
  intermediate is ``(2^23−1)·2654435761 + 2^32 < 2^56``, far inside
  signed-64 range in both Spark and the DuckDB oracle.

Domain: ids must lie in ``[0, 4^k)``; positions land in the same
domain (sparse if ids are — the ORDER is what's consumed, density is
irrelevant).  ``k = 16`` covers 4.3 G documents; ``k = 23`` covers
7·10^13.

Reference scope note: the reference crawler (creekorful/bathyscaphe)
stops at indexing; epoch shuffling is part of the training-data
pipeline this engine adds on top (brief: "operations a large-scale
training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEISTEL_ROUNDS = 4
# Knuth multiplicative-hashing constant (2^32 / golden ratio) — public.
FEISTEL_MULT = 2654435761
_GOLDEN64 = 0x9E3779B97F4A7C15
MAX_HALF_BITS = 23


def feistel_keys(epoch: int, rounds: int = FEISTEL_ROUNDS) -> list[int]:
    """Per-round 32-bit keys derived from the epoch number (Weyl
    sequence on the 64-bit golden ratio, high half kept).  Pure Python
    — the same literals are inlined into the Spark expression and the
    DuckDB oracle, so both engines run the identical permutation."""
    return [
        ((_GOLDEN64 * (epoch * rounds + r + 1)) % (1 << 64)) >> 32
        for r in range(rounds)
    ]


def _check_half_bits(half_bits: int) -> None:
    if not 2 <= half_bits <= MAX_HALF_BITS:
        raise ValueError(
            f"half_bits must be in [2, {MAX_HALF_BITS}] for int64-exact "
            f"arithmetic, got {half_bits}"
        )


def feistel_pos(id_col: Column, keys: list[int], half_bits: int) -> Column:
    """Position of ``id_col`` under the Feistel permutation: a pure
    column expression (shift/and/xor/multiply — whole-stage codegen).

    One round: ``(hi, lo) → (lo, hi XOR F(lo, key))`` with the round
    function ``F(x, key) = ((x·MULT + key) >> 7) & mask`` — the right
    shift discards the weakly-mixed low bits of the odd-constant
    multiply before masking back to ``k`` bits.
    """
    _check_half_bits(half_bits)
    mask = (1 << half_bits) - 1
    hi = F.shiftright(id_col, half_bits).bitwiseAND(F.lit(mask))
    lo = id_col.bitwiseAND(F.lit(mask))
    for key in keys:
        fx = (
            F.shiftright(lo * F.lit(FEISTEL_MULT) + F.lit(key), 7)
            .bitwiseAND(F.lit(mask))
        )
        hi, lo = lo, hi.bitwiseXOR(fx)
    return F.shiftleft(hi, half_bits).bitwiseOR(lo)


def feistel_pos_py(v: int, keys: list[int], half_bits: int) -> int:
    """Python mirror of :func:`feistel_pos` (tests assert equality)."""
    mask = (1 << half_bits) - 1
    hi, lo = (v >> half_bits) & mask, v & mask
    for key in keys:
        fx = ((lo * FEISTEL_MULT + key) >> 7) & mask
        hi, lo = lo, hi ^ fx
    return (hi << half_bits) | lo


def feistel_pos_sql(id_expr: str, keys: list[int], half_bits: int) -> str:
    """The identical permutation as a DuckDB scalar expression (oracle
    side).  Built by unrolling the rounds symbolically over ``id_expr``.
    """
    _check_half_bits(half_bits)
    mask = (1 << half_bits) - 1
    hi = f"(({id_expr}) >> {half_bits}) & {mask}"
    lo = f"({id_expr}) & {mask}"
    for key in keys:
        fx = f"((({lo}) * {FEISTEL_MULT} + {key}) >> 7) & {mask}"
        hi, lo = lo, f"xor({hi}, {fx})"
    return f"((({hi}) << {half_bits}) | ({lo}))"


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epochs: list[int],
    half_bits: int = 16,
    n_shards: int = 8,
) -> DataFrame:
    """Epoch reading order for ``df``: one row per (document, epoch)
    with the document's pseudorandom position, its reader shard
    (``pos % n_shards``) and its sequence number within the shard
    (``pos // n_shards``).

    One scan of ``df``; all epochs are computed in the same narrow
    projection (an exploded array of per-epoch structs — position
    expressions differ only in their inlined round keys).  Consumers
    sort or range-partition by (epoch, pos); shard ``k`` of epoch ``e``
    filters ``shard = k`` and sorts by ``seq`` — no coordination, no
    materialized permutation.

    Output: (id, epoch, pos, shard, seq).
    """
    cid = F.col(id_col)
    per_epoch = [
        F.struct(
            F.lit(e).cast("int").alias("epoch"),
            feistel_pos(cid, feistel_keys(e), half_bits).alias("pos"),
        )
        for e in epochs
    ]
    ex = F.explode(F.array(*per_epoch)).alias("x")
    return (
        df.select(cid.alias(id_col), ex)
        .select(
            id_col,
            F.col("x.epoch").alias("epoch"),
            F.col("x.pos").alias("pos"),
        )
        # integer div/mod (never float division — exact for any n_shards)
        .withColumn("shard", F.expr(f"pos % {n_shards}"))
        .withColumn("seq", F.expr(f"pos div {n_shards}"))
    )
