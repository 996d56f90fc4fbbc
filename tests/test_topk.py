"""smallest_k_by_key / multiset_prefix — the bounded-buffer tournament
must be EXACTLY equal to the naive whole-key collect_list it replaces
(operators/topk.py), including on hot keys far wider than the fanout."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bathyscaphe_spark.operators.topk import multiset_prefix, smallest_k_by_key


def _naive(rows, k):
    """key -> (sorted multiset prefix, n_rows, n_distinct)."""
    by_key: dict[str, list[str]] = {}
    for key, val in rows:
        by_key.setdefault(key, []).append(val)
    out = {}
    for key, vals in by_key.items():
        out[key] = (sorted(vals)[:k], len(vals), len(set(vals)))
    return out


def _check(spark, rows, k, fanout, levels=3):
    df = spark.createDataFrame(rows, "key string, val string").repartition(5)
    got = (
        smallest_k_by_key(df, ["key"], "val", k, fanout=fanout, levels=levels)
        .select(
            "key",
            multiset_prefix(F.col("smallest"), k).alias("sample"),
            "n_rows",
            "n_distinct",
        )
        .collect()
    )
    want = _naive(rows, k)
    assert len(got) == len(want)
    for r in got:
        w_sample, w_rows, w_distinct = want[r["key"]]
        assert list(r["sample"]) == w_sample, r["key"]
        assert r["n_rows"] == w_rows
        assert r["n_distinct"] == w_distinct


class TestSmallestKByKey:
    def test_matches_naive_on_random_data(self, spark):
        rng = random.Random(7)
        rows = [
            (f"k{rng.randrange(6)}", f"v{rng.randrange(40):03d}")
            for _ in range(500)
        ]
        _check(spark, rows, k=16, fanout=4)

    def test_hot_key_wider_than_fanout(self, spark):
        # one key with 300 distinct values through a fanout of 8: every
        # salt cell truncates, yet the global k-smallest must be exact
        rows = [("hot", f"v{i:04d}") for i in range(300)] * 2
        rows += [("cold", "only")]
        _check(spark, rows, k=10, fanout=8)

    def test_multiset_repeats_within_cap(self, spark):
        # 'aaa' appears 20 times: the 5-prefix is all 'aaa', and the
        # clamped array_repeat must not materialize 20 copies mid-fold
        rows = [("k", "aaa")] * 20 + [("k", "bbb")] * 3
        _check(spark, rows, k=5, fanout=4)

    def test_cap_not_binding(self, spark):
        rows = [("k", "b"), ("k", "a"), ("k", "a")]
        _check(spark, rows, k=16, fanout=64)

    def test_levels_equivalent(self, spark):
        # 2-, 3- and 4-level tournaments must all equal the naive result
        rows = [
            (f"k{i % 4}", f"v{(i * 11) % 60:03d}") for i in range(300)
        ]
        for levels in (2, 3, 4):
            _check(spark, rows, k=9, fanout=4, levels=levels)

    def test_parallelism_invariant(self, spark):
        rows = [
            (f"k{i % 3}", f"v{(i * 7) % 50:03d}") for i in range(400)
        ]
        df1 = spark.createDataFrame(rows, "key string, val string").coalesce(1)
        df8 = spark.createDataFrame(rows, "key string, val string").repartition(8)
        out = []
        for df in (df1, df8):
            rs = (
                smallest_k_by_key(df, ["key"], "val", 7, fanout=4)
                .select(
                    "key",
                    F.array_join(
                        multiset_prefix(F.col("smallest"), 7), "|"
                    ).alias("s"),
                    "n_rows",
                    "n_distinct",
                )
                .collect()
            )
            out.append(sorted((r["key"], r["s"], r["n_rows"], r["n_distinct"]) for r in rs))
        assert out[0] == out[1]
