"""CCNet-style n-gram LM fluency scoring and perplexity bucketing.

The CommonCrawl training-data recipe (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", 2020 — public)
scores every document with an n-gram language model and keeps the
low-perplexity head/middle of the per-corpus score distribution.  The
reference crawler has no LM stage — this is one of the beyond-reference
training-pipeline operators (quality-scoring family).

Everything here is integer fixed-point so results are bit-identical at
any parallelism level and across engines (no float ``log``, no float
accumulation order):

``surprisal(w1, w2) = (SCALE * (c1(w1) + V)) div (c2(w1, w2) + 1)``

the integer-scaled inverse of the Laplace-(add-1)-smoothed conditional
``P(w2 | w1) = (c2 + 1) / (c1 + V)`` with ``V`` = prefix-vocabulary
size.  Smoothing is load-bearing, not a nicety: under raw MLE a hapax
prefix's only continuation has P = 1 (c1 = c2 = 1), so a document of
never-seen-before junk words would score as maximally fluent — add-1
sends exactly those bigrams toward surprisal ≈ SCALE·V/2 instead.
``1/P`` is strictly monotone in ``-log P``, so ranking /
percentile-bucketing documents by mean surprisal yields the same
head/middle/tail split CCNet takes over perplexity, without a single
float in the pipeline.  Overflow headroom: ``SCALE * (c1 + V)`` must
fit an int64 — at 10^12 corpus bigrams drop SCALE to 10^3 or switch the
product to DECIMAL(38,0); both preserve the ordering.

Scale shape (all counts from ONE (doc, w1, w2) partial aggregation):

* within-document bigram multiplicity ``k`` folds duplicates before any
  join, so the count joins see bigram *types* per doc, not occurrences;
* ``c2`` / ``c1`` are two further aggregations of that same table
  (Spark reuses the (doc,w1,w2) exchange), joined back on their own
  keys — ordinary shuffled equi-joins, no broadcast of a corpus-sized
  vocabulary;
* bucketing thresholds are learned on a deterministic doc_id-mod sample
  exactly as CCNet trains its cutoffs once on a sample — the two cut
  values come back as ONE aggregated row attached via a 1-row broadcast
  (the collect()-free scalar-attach pattern used by bm25_search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SURPRISAL_SCALE = 1_000_000


def bigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = SURPRISAL_SCALE,
) -> DataFrame:
    """Per-document mean bigram surprisal under the corpus's own MLE
    bigram model.

    Tokens: lowercase, whitespace-split, empties dropped (the corpus
    tokenization used by vocab_topk / quality_classifier).  Documents
    with fewer than two tokens have no bigrams and drop out — CCNet
    likewise never scores empty documents.

    Returns (id_col, n_bigrams, mean_surprisal); mean_surprisal is the
    integer mean (div) of per-occurrence Laplace-smoothed surprisals,
    ≥ ``scale`` by construction (c2 + 1 ≤ c1 + V always, since V counts
    every distinct prefix and c2 ≤ c1).
    """
    ts = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    toks = docs.select(F.col(id_col), ts.alias("ts")).where(F.size("ts") >= 2)
    big = (
        toks.select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.struct(
                        F.element_at("ts", i).alias("w1"),
                        F.element_at("ts", i + F.lit(1)).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select(id_col, "bg.w1", "bg.w2")
    )
    # one partial agg folds within-doc duplicate bigrams before any join
    bd = big.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    c2 = bd.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    c1 = bd.groupBy("w1").agg(F.sum("k").alias("c1"))
    # V (prefix-vocabulary size) is ONE aggregated row broadcast back —
    # the same collect()-free scalar attach ppl_buckets uses for cuts
    v = c1.agg(F.count(F.lit(1)).alias("v"))
    s = f"k * ((CAST({scale} AS BIGINT) * (c1 + v)) div (c2 + 1))"
    return (
        bd.join(c2, ["w1", "w2"]).join(c1, ["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.expr(s)).alias("ssum"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.expr("ssum div n_bigrams").alias("mean_surprisal"),
        )
    )


def ppl_buckets(
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "mean_surprisal",
    sample_mod: int = 10,
) -> DataFrame:
    """CCNet head/middle/tail bucketing by score tertiles learned on a
    deterministic sample (``id % sample_mod == 0``).

    The cut values t1/t2 are the ceil(n/3)-th and ceil(2n/3)-th smallest
    sample scores; bucketing compares against the VALUES (not ranks), so
    ties land in one bucket deterministically and no global sort or
    single-partition window ever touches the full corpus.  Adds a
    ``ppl_bucket`` column ('head' = most fluent).

    A corpus slice whose ids happen to avoid multiples of
    ``sample_mod`` has no sample to learn cuts from: the bucket is
    NULL for every row (an honest "unbucketed" marker) instead of an
    ``element_at(xs, 0)`` runtime error killing the job.
    """
    sample = scores.where(F.col(id_col) % sample_mod == 0)
    nonempty = F.size("xs") > 0
    cuts = (
        sample.agg(F.sort_array(F.collect_list(score_col)).alias("xs"))
        .select(
            F.when(
                nonempty,
                F.element_at("xs", F.ceil(F.size("xs") / 3).cast("int")),
            ).alias("t1"),
            F.when(
                nonempty,
                F.element_at("xs", F.ceil(F.size("xs") * 2 / 3).cast("int")),
            ).alias("t2"),
        )
    )
    return scores.crossJoin(F.broadcast(cuts)).select(
        scores["*"],
        F.when(F.col("t1").isNull(), F.lit(None).cast("string"))
        .when(F.col(score_col) > F.col("t2"), F.lit("tail"))
        .when(F.col(score_col) > F.col("t1"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("ppl_bucket"),
    )
