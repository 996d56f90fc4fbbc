"""Deterministic stratified sampling (operators/sampling.py)."""

from pyspark.sql import functions as F

from bathyscaphe_spark.operators.sampling import (
    SAMPLE_BUCKETS,
    sample_bucket,
    weighted_sample,
)


def _docs(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )


def test_rates_are_approximately_honored(spark):
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
    kept = (
        weighted_sample(_docs(spark), "doc_id", "source", rates)
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r["source"]: r["count"] for r in kept}
    assert got["src0"] == 1000          # rate 1.0 keeps everything
    assert "src3" not in got            # rate 0.0 keeps nothing
    assert abs(got["src1"] - 500) < 80  # ~binomial(1000, 0.5)
    assert abs(got["src2"] - 250) < 70


def test_nested_rates_are_monotone(spark):
    """rate 0.25's kept set must be a subset of rate 0.5's — the
    ablation-stability property random sampling lacks."""
    d = _docs(spark)
    k50 = {r.doc_id for r in weighted_sample(d, "doc_id", "source", {}, 0.5).collect()}
    k25 = {r.doc_id for r in weighted_sample(d, "doc_id", "source", {}, 0.25).collect()}
    assert k25 <= k50
    assert len(k25) < len(k50)


def test_stable_under_partitioning_and_corpus_growth(spark):
    """A document's fate depends only on its key: repartitioning and
    adding new rows never change which existing rows are kept."""
    rates = {"src0": 0.3, "src1": 0.7}
    small = _docs(spark, 1000)
    big = _docs(spark, 3000)
    kept_small = {r.doc_id for r in weighted_sample(small, "doc_id", "source", rates).collect()}
    kept_big = {r.doc_id for r in weighted_sample(big.repartition(11), "doc_id", "source", rates).collect()}
    assert kept_small == {i for i in kept_big if i < 1000}


def test_bucket_matches_md5_reference(spark):
    import hashlib

    rows = spark.range(50).select(
        F.col("id"), sample_bucket(F.col("id")).alias("b")
    ).collect()
    for r in rows:
        want = int(hashlib.md5(str(r.id).encode()).hexdigest()[:8], 16) % SAMPLE_BUCKETS
        assert r.b == want


def test_default_rate_applies_to_unlisted_strata(spark):
    out = weighted_sample(
        _docs(spark), "doc_id", "source", {"src0": 1.0}, default_rate=0.0
    )
    assert {r.source for r in out.select("source").distinct().collect()} == {"src0"}
