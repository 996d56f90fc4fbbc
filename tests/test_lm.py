"""CCNet-style bigram-surprisal LM scoring (operators/lm.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bathyscaphe_spark.operators.lm import (
    SURPRISAL_SCALE,
    bigram_surprisal,
    ppl_buckets,
)


def _scores(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_bigrams"], r["mean_surprisal"])
        for r in bigram_surprisal(df).collect()
    }


def test_hand_computed_surprisal(spark):
    # corpus bigrams: doc1 = (a b), (b a), (a b); doc2 = (a b), (b c)
    # c1: a=3, b=2   V = 2 prefixes   c2: (a b)=3, (b a)=1, (b c)=1
    # add-1 surprisal: (a b) = 1e6*(3+2)//(3+1) = 1.25e6
    #                  (b a) = (b c) = 1e6*(2+2)//(1+1) = 2e6
    got = _scores(spark, [(1, "a b a b"), (2, "a b c")])
    s_ab, s_b_ = 1_250_000, 2_000_000
    # doc1: bigrams ab, ba, ab
    assert got[1] == (3, (2 * s_ab + s_b_) // 3)
    # doc2: bigrams ab, bc
    assert got[2] == (2, (s_ab + s_b_) // 2)


def test_short_docs_drop_out(spark):
    got = _scores(spark, [(1, "only"), (2, "   "), (3, "two tokens")])
    assert set(got) == {3}
    # single prefix: V=1, c1=1, c2=1 -> 1e6*(1+1)//(1+1) = SCALE
    assert got[3] == (1, SURPRISAL_SCALE)


def test_repeated_text_is_more_fluent(spark):
    # a doc made of one repeated phrase shares all its bigrams with the
    # corpus mass -> lower mean surprisal than a doc of unique words
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((99, "zyx wvu tsr qpo nml kji"))
    got = _scores(spark, rows)
    assert got[0][1] < got[99][1]
    assert all(got[i] == got[0] for i in range(10))


def test_bucket_thresholds_and_partition_invariance(spark):
    # 30 docs, three fluency tiers: repeated phrase / mixed / unique junk
    # ids all ≡ 0 (mod 10) so the threshold sample spans every tier
    rows = []
    for i in range(10):
        rows.append((i * 30, "alpha beta gamma alpha beta gamma"))
    for i in range(10):
        rows.append((i * 30 + 10, f"alpha beta tok{i} gamma alpha"))
    for i in range(10):
        rows.append((i * 30 + 20, f"q{i}a w{i}b e{i}c r{i}d t{i}e y{i}f"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {}
    for parts in (1, 7):
        res = ppl_buckets(bigram_surprisal(df.repartition(parts)))
        out[parts] = sorted(map(tuple, res.collect()))
    # bit-identical at any parallelism
    assert out[1] == out[7]

    buckets = {r[0]: r[3] for r in out[1]}
    # the repeated-phrase tier is never ranked worse than the junk tier
    assert buckets[0] == "head"
    assert buckets[20] == "tail"
    # every doc got a bucket, all three buckets occur
    assert len(buckets) == 30
    assert {"head", "middle", "tail"} <= set(buckets.values())


def test_bucket_cuts_use_sample_values_not_ranks(spark):
    # all-equal scores -> t1 == t2 -> everything lands in 'head'
    rows = [(i, "x y") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = ppl_buckets(bigram_surprisal(df))
    assert {r["ppl_bucket"] for r in res.collect()} == {"head"}


def test_scale_override_preserves_order(spark):
    rows = [(1, "a b a b a b"), (2, "a b c d e f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hi = {r[0]: r[2] for r in bigram_surprisal(df).collect()}
    lo = {r[0]: r[2] for r in bigram_surprisal(df, scale=1000).collect()}
    assert (hi[1] < hi[2]) == (lo[1] < lo[2])


def test_ppl_buckets_empty_sample_yields_null_buckets(spark):
    """Ids avoiding every multiple of sample_mod: no cuts can be
    learned — every bucket is NULL rather than an
    INVALID_INDEX_OF_ZERO runtime error aborting the job."""
    from bathyscaphe_spark.operators.lm import ppl_buckets

    scores = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "doc_id long, mean_surprisal long"
    )
    out = ppl_buckets(scores, sample_mod=10).collect()
    assert len(out) == 3
    assert all(r["ppl_bucket"] is None for r in out)
