"""Bounded-buffer exact k-smallest sampling per key (salted tournament).

Why this exists: several rollups want "the k lexicographically-smallest
values per key" as a deterministic sample next to exact counts (anchor
texts per link target, spoof-variant spellings per confusable skeleton,
…).  The direct ``slice(array_sort(collect_list(v)), 1, k)`` is correct
but its aggregation buffer holds EVERY value of the key before slicing —
at 10^10-URL scale a hot key (a popular link target collects millions of
anchors; one spoof campaign mints unbounded variant hosts) turns that
buffer into a task OOM.  This is the same defect class the r3 verdict
flagged on ``release_manifest``'s whole-shard ``collect_list`` digest.

The fix is a multi-level tournament:

1. ``groupBy(key, v).count()`` — exact multiplicities; hash-aggregate
   state is one counter per group, map-side combinable, never a list.
2. level 1: ``groupBy(key, hash(v) % fanout^(levels-1))`` keeps only
   the k smallest distinct values per salt cell.
3. levels 2..: each merge level folds ``fanout`` cells into one, so its
   input — and its aggregation buffer — is ≤ ``fanout·k`` structs, a
   compile-time constant, regardless of the data.

A value dropped at any level is ≥ the k smallest of its cell, so it can
never be among the global k smallest — the tournament is exact, not
approximate.  Cells also carry partial sums, so exact totals
(Σ multiplicity, distinct-value count) survive to the final merge
without a second pass over the input.

Buffer honesty: every level EXCEPT the first is hard-bounded at
``fanout·k`` entries.  Level 1's buffer is data-dependent —
``distinct(v) / fanout^(levels-1)`` expected per cell — so the bound is
probabilistic, tightening geometrically with ``levels``: the defaults
(fanout 64, levels 3) divide a 10^9-distinct-value adversarial key
across 4096 cells (~244k small structs per buffer, megabytes); raise
``levels`` to 4 (262144 cells) if keys beyond 10^10 distinct values are
plausible.  This is a strictly stronger guarantee than the whole-key
``collect_list`` it replaces (divisor 1).  The cell hash is salted with
the KEY columns (``xxhash64(key…, v)``), so the cell layout differs per
key: a value set crafted to collide into one cell of a fixed
``xxhash64(v)`` would reproduce the whole-key buffer for EVERY key it
appears under — with the key salt an adversary must re-solve the
collision per key, and an accidental hot cell under one key is
independent of every other key's layout.  Against a deliberate
per-key collision attack the leaf bound remains probabilistic
(raising ``levels`` does not defeat a crafted set); the hard
``fanout·k`` bound on all merge levels is unconditional either way.

Determinism: output arrays sort by (value asc); ties are impossible
within a key because stage 1 already made values distinct.  Identical
at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def smallest_k_by_key(
    df: DataFrame,
    key_cols: list[str],
    val_col: str,
    k: int,
    fanout: int = 64,
    levels: int = 3,
) -> DataFrame:
    """Per key: the ``k`` smallest DISTINCT values of ``val_col`` with
    exact multiplicities, plus exact totals — aggregation buffers per
    the module docstring (all merge levels hard-bounded at fanout·k;
    the leaf level divided across fanout^(levels-1) salt cells).

    Returns one row per key: ``key_cols…,
    smallest: array<struct<val, n>>`` (sorted by val asc, ≤ k entries,
    ``n`` = exact multiplicity of that value in ``df``),
    ``n_rows`` (exact Σ multiplicities over ALL values, not just the k
    kept), ``n_distinct`` (exact distinct-value count).  Null values
    are dropped, matching the ``collect_list`` semantics this replaces.
    """
    if levels < 2:
        raise ValueError("levels must be >= 2")
    df = df.where(F.col(val_col).isNotNull())
    cells = fanout ** (levels - 1)
    cnt = (
        df.groupBy(*key_cols, val_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            *key_cols,
            F.struct(F.col(val_col).alias("val"), F.col("_n").alias("n")).alias(
                "_s"
            ),
            F.pmod(F.xxhash64(*key_cols, val_col), F.lit(cells)).alias(
                "_cell"
            ),
        )
    )
    cur = cnt.groupBy(*key_cols, "_cell").agg(
        F.slice(F.array_sort(F.collect_list("_s")), 1, k).alias("_top"),
        F.sum(F.col("_s").getField("n")).alias("_rows"),
        F.count(F.lit(1)).alias("_vals"),
    )
    # merge levels: fold fanout cells per group (buffer ≤ fanout·k)
    for lvl in range(levels - 2, 0, -1):
        cur = (
            cur.withColumn("_cell", F.pmod(F.col("_cell"), F.lit(fanout**lvl)))
            .groupBy(*key_cols, "_cell")
            .agg(
                F.slice(
                    F.array_sort(F.flatten(F.collect_list("_top"))), 1, k
                ).alias("_top"),
                F.sum("_rows").alias("_rows"),
                F.sum("_vals").alias("_vals"),
            )
        )
    return cur.groupBy(*key_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_top"))), 1, k
        ).alias("smallest"),
        F.sum("_rows").alias("n_rows"),
        F.sum("_vals").alias("n_distinct"),
    )


def multiset_prefix(smallest: Column, k: int) -> Column:
    """The first ``k`` elements of the MULTISET a ``smallest`` array
    (from :func:`smallest_k_by_key` over a STRING value column — the
    fold accumulator is typed array<string>) describes: each value
    repeated ``min(n, remaining)`` times, in value order — i.e. exactly
    ``slice(array_sort(collect_list(v)), 1, k)`` of the raw values,
    rebuilt from the bounded representation.  Pure codegen
    (aggregate/concat/array_repeat), no UDF; ``array_repeat`` is
    clamped to ``k`` so a million-row multiplicity never materializes.
    """
    return F.aggregate(
        smallest,
        F.array().cast("array<string>"),
        lambda acc, s: F.slice(
            F.concat(
                acc,
                F.array_repeat(
                    s["val"], F.least(s["n"], F.lit(k)).cast("int")
                ),
            ),
            1,
            k,
        ),
    )
