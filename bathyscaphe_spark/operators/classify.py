"""Distributed trained document classifier: full-batch integer
perceptron over hashed token features.

The reference ships no ML, but every production webtext pipeline
(CCNet, RefinedWeb, DCLM) trains a linear quality classifier on seed
labels and scores the crawl with it.  q_quality_classifier covers the
SCORING plumbing; this module covers the TRAINING step as a native
Spark job:

* features: token → FNV-1/64 → ``pmod(h, n_buckets)`` (hashing trick,
  fixed 2^18-dim state no matter the vocabulary — the weight vector
  stays broadcastable at any corpus size),
* model: classic full-batch perceptron (Rosenblatt): per round, score
  every document under the current weights, then
  ``w_b += Σ_{misclassified d} y_d · tf_{d,b}``.  Learning rate 1 and
  BIGINT weights keep every quantity integer-exact, so training is
  bit-identical at any parallelism (sums of integers are
  associative/commutative) — the same determinism contract as
  operators/graph.py pagerank_fp.

Scale shape per round: one broadcast hash join feats⋈weights (weights
≤ n_buckets rows), one map-side-combined groupBy(doc) for scores, one
groupBy(bucket) shuffle for the update — the feature table itself is
built once, persisted, and never reshuffled.  Rounds are a constant
(3-5 in practice; perceptron on separable seed labels converges fast
and production pipelines cap epochs anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.fnv import fnv1_64

N_BUCKETS = 1 << 18


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, bucket, tf): whitespace/lowercase token counts folded onto
    ``n_buckets`` hash buckets.  One explode + one partial-agg shuffle;
    the FNV runs over the token stream in Arrow batches."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("token"),
    )
    return (
        toks.select(
            id_col, F.pmod(fnv1_64(F.col("token")), F.lit(n_buckets)).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _scores(
    labels: DataFrame, feats: DataFrame, w: DataFrame, id_col: str
) -> DataFrame:
    """Per-document Σ tf·w under ``w`` (docs with no hot bucket → 0)."""
    hot = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("w")).alias("score"))
    )
    return labels.join(hot, id_col, "left").select(
        id_col, "y", F.coalesce("score", F.lit(0)).alias("score")
    )


def perceptron_train(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "y",
    n_buckets: int = N_BUCKETS,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Train on ``docs(id, text, y∈{+1,-1})``; returns
    ``(weights(bucket, w), scored(id, y, score, pred, correct))`` with
    scores/predictions under the FINAL weights.

    A document with y·score ≤ 0 counts as misclassified (the standard
    perceptron margin rule: an untouched model scores everything 0 and
    the first round trains on the whole batch).
    """
    spark = docs.sparkSession
    labels = docs.select(id_col, F.col(label_col).cast("long").alias("y"))
    feats = hashed_features(docs, id_col, text_col, n_buckets).persist()
    w = spark.createDataFrame([], "bucket long, w long")
    for _ in range(iters):
        mis = _scores(labels, feats, w, id_col).where(
            F.col("y") * F.col("score") <= 0
        )
        upd = (
            feats.join(mis.select(id_col, "y"), id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("tf")).alias("delta"))
        )
        w = (
            w.join(upd, "bucket", "full")
            .select(
                "bucket",
                (F.coalesce("w", F.lit(0)) + F.coalesce("delta", F.lit(0))).alias("w"),
            )
            .where(F.col("w") != 0)
            .localCheckpoint(eager=True)
        )
    scored = _scores(labels, feats, w, id_col).select(
        id_col,
        "y",
        "score",
        F.when(F.col("score") > 0, F.lit(1)).otherwise(F.lit(-1)).alias("pred"),
        (F.col("y") * F.col("score") > 0).alias("correct"),
    )
    feats.unpersist()
    return w, scored
