"""Integer perceptron trainer (operators/classify.py)."""

from pyspark.sql import functions as F

from bathyscaphe_spark.operators.classify import hashed_features, perceptron_train

# linearly separable by the word 'good'/'bad': the perceptron must
# reach zero training error within a few rounds
DOCS = [
    (1, "good fast table scan", 1),
    (2, "good good merge join", 1),
    (3, "bad slow spill leak", -1),
    (4, "bad bad crash retry", -1),
    (5, "good window sort", 1),
    (6, "bad shuffle skew", -1),
    (7, "", -1),  # zero-token doc: score stays 0 forever
]


def _train(spark, iters=5, partitions=1):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y long").repartition(
        partitions
    )
    return perceptron_train(df, iters=iters)


def _reference_perceptron(docs, n_buckets, iters):
    """Pure-python replica of the full-batch integer recurrence."""
    from bathyscaphe_spark.functions.fnv import fnv1_64_py, unsigned_to_signed

    feats = {}
    for doc_id, text, _y in docs:
        tf = {}
        for tok in text.lower().split():
            b = unsigned_to_signed(fnv1_64_py(tok)) % n_buckets
            tf[b] = tf.get(b, 0) + 1
        feats[doc_id] = tf
    w = {}
    for _ in range(iters):
        upd = {}
        for doc_id, _text, y in docs:
            score = sum(tf * w.get(b, 0) for b, tf in feats[doc_id].items())
            if y * score <= 0:
                for b, tf in feats[doc_id].items():
                    upd[b] = upd.get(b, 0) + y * tf
        for b, d in upd.items():
            w[b] = w.get(b, 0) + d
        w = {b: v for b, v in w.items() if v != 0}
    return w


def test_converges_on_separable_labels(spark):
    _, scored = _train(spark)
    rows = {r.doc_id: r for r in scored.collect()}
    # every doc except the token-less one ends up correctly classified
    for doc_id, _text, y in DOCS:
        r = rows[doc_id]
        assert r.y == y
        if doc_id == 7:
            assert r.score == 0 and r.pred == -1 and not r.correct
        else:
            assert r.correct, (doc_id, r.score, y)


def test_matches_pure_python_recurrence(spark):
    w, _ = _train(spark, iters=3)
    got = {r.bucket: r.w for r in w.collect()}
    want = _reference_perceptron(DOCS, 1 << 18, iters=3)
    assert got == want


def test_bit_identical_across_partitionings(spark):
    a, sa = _train(spark, partitions=1)
    b, sb = _train(spark, partitions=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert sorted(map(tuple, sa.collect())) == sorted(map(tuple, sb.collect()))


def test_hashed_features_fold_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "  ")], "doc_id long, text string"
    )
    rows = hashed_features(df).collect()
    assert {r.doc_id for r in rows} == {1}
    assert sorted(r.tf for r in rows) == [1, 2]
    assert all(0 <= r.bucket < (1 << 18) for r in rows)
