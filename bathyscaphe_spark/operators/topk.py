"""Bounded-state exact k-smallest sampling per key (salted tournament).

Why this exists: several rollups want "the k lexicographically-smallest
values per key" as a deterministic sample next to exact counts (anchor
texts per link target, spoof-variant spellings per confusable skeleton,
…).  The direct ``slice(array_sort(collect_list(v)), 1, k)`` is correct
but its aggregation buffer holds EVERY value of the key before slicing —
at 10^10-URL scale a hot key (a popular link target collects millions of
anchors; one spoof campaign mints unbounded variant hosts) turns that
buffer into a task OOM.  This is the same defect class the r3 verdict
flagged on ``release_manifest``'s whole-shard ``collect_list`` digest.

The fix is a two-level tournament with bounded buffers at every stage:

1. ``groupBy(key, v).count()`` — exact multiplicities; hash-aggregate
   state is one counter per group, map-side combinable, never a list.
2. level 1: ``groupBy(key, hash(v) % fanout)`` keeps only the k smallest
   distinct values per salt cell (buffer ≈ distinct(v)/fanout).
3. level 2: ``groupBy(key)`` merges the ≤ fanout·k survivors (buffer
   ≤ fanout·k structs, a compile-time constant).

A value dropped at level 1 is ≥ the k smallest of its cell, so it can
never be among the global k smallest — the tournament is exact, not
approximate.  Level-1 cells also carry partial sums, so exact totals
(Σ multiplicity, distinct-value count) survive to level 2 without a
second pass over the input.

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
) -> DataFrame:
    """Per key: the ``k`` smallest DISTINCT values of ``val_col`` with
    exact multiplicities, plus exact totals — all with bounded
    aggregation buffers.

    Returns one row per key: ``key_cols…,
    smallest: array<struct<val, n>>`` (sorted by val asc, ≤ k entries,
    ``n`` = exact multiplicity of that value in ``df``),
    ``n_rows`` (exact Σ multiplicities over ALL values, not just the k
    kept), ``n_distinct`` (exact distinct-value count).
    """
    # null values are dropped, matching the collect_list semantics this
    # replaces (a null would otherwise form its own count group)
    df = df.where(F.col(val_col).isNotNull())
    cnt = (
        df.groupBy(*key_cols, val_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            *key_cols,
            F.struct(F.col(val_col).alias("val"), F.col("_n").alias("n")).alias(
                "_s"
            ),
            F.pmod(F.xxhash64(val_col), F.lit(fanout)).alias("_cell"),
        )
    )
    lvl1 = cnt.groupBy(*key_cols, "_cell").agg(
        F.slice(F.array_sort(F.collect_list("_s")), 1, k).alias("_top"),
        F.sum(F.col("_s").getField("n")).alias("_rows"),
        F.count(F.lit(1)).alias("_vals"),
    )
    return lvl1.groupBy(*key_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_top"))), 1, k
        ).alias("smallest"),
        F.sum("_rows").alias("n_rows"),
        F.sum("_vals").alias("n_distinct"),
    )


def multiset_prefix(smallest: Column, k: int) -> Column:
    """The first ``k`` elements of the MULTISET a ``smallest`` array
    (from :func:`smallest_k_by_key`) describes: each value repeated
    ``min(n, remaining)`` times, in value order — i.e. exactly
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
