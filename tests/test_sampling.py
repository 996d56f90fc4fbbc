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


# --- token_budget_sample -----------------------------------------------


def _tok_docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
        ((F.col("id") * 7) % 50 + 1).cast("long").alias("n_tokens"),
    )


def _mirror(rows, budgets, default=0):
    """Python reference: per stratum, order by (md5-bucket, key); the
    running total over ALL docs in that order (not just kept ones)
    admits a doc iff the total including it is <= budget — a prefix
    cut, so the kept set closes at the first overflowing doc."""
    import hashlib

    def bucket(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % SAMPLE_BUCKETS

    kept = {}
    by_s = {}
    for r in rows:
        by_s.setdefault(r["source"], []).append(r)
    for s, rs in by_s.items():
        b = budgets.get(s, default)
        tot = 0
        for r in sorted(rs, key=lambda r: (bucket(r["doc_id"]), r["doc_id"])):
            if tot + r["n_tokens"] <= b:
                kept[r["doc_id"]] = tot
            tot += r["n_tokens"]
    return kept


def test_token_budget_matches_python_mirror(spark):
    from bathyscaphe_spark.operators.sampling import token_budget_sample

    d = _tok_docs(spark)
    budgets = {"src0": 4000, "src1": 800, "src2": 0}
    rows = [r.asDict() for r in d.collect()]
    want = _mirror(rows, budgets)
    got = {
        r["doc_id"]: r["tok_before"]
        for r in token_budget_sample(
            d, "doc_id", "source", "n_tokens", budgets
        ).collect()
    }
    assert got == want
    # the budget is actually binding, not vacuous
    assert 0 < len(got) < len(rows)


def test_token_budget_boundary_bucket_exact(spark):
    """A budget landing mid-bucket keeps exactly the within-bucket
    prefix: raising the budget by one doc's tokens admits exactly the
    next doc in (bucket, key) order."""
    from bathyscaphe_spark.operators.sampling import token_budget_sample

    d = _tok_docs(spark, 300)
    rows = [r.asDict() for r in d.collect()]
    for b in (500, 501, 777):
        want = _mirror(rows, {"src0": b, "src1": b, "src2": b})
        got = {
            r["doc_id"]: r["tok_before"]
            for r in token_budget_sample(
                d, "doc_id", "source", "n_tokens", {}, default_budget=b
            ).collect()
        }
        assert got == want, b


def test_token_budget_stable_under_partitioning(spark):
    from bathyscaphe_spark.operators.sampling import token_budget_sample

    d = _tok_docs(spark)
    budgets = {"src0": 3000, "src1": 3000, "src2": 3000}
    a = {
        (r["doc_id"], r["tok_before"])
        for r in token_budget_sample(d, "doc_id", "source", "n_tokens", budgets).collect()
    }
    b = {
        (r["doc_id"], r["tok_before"])
        for r in token_budget_sample(
            d.repartition(17), "doc_id", "source", "n_tokens", budgets
        ).collect()
    }
    assert a == b


class TestTemperatureBudgets:
    def _run(self, spark, rows, budget, parts=3, **kw):
        from bathyscaphe_spark.operators.sampling import temperature_budgets

        df = spark.createDataFrame(rows, "source string, id long, n_tok long")
        out = temperature_budgets(
            df.repartition(parts), "source", "n_tok", budget, **kw
        ).collect()
        return {r.group: r.asDict() for r in out}

    def test_sqrt_temperature_upweights_small_sources(self, spark):
        rows = (
            [("web", i, 1000) for i in range(100)]     # 100k tokens
            + [("code", i, 100) for i in range(10)]    # 1k tokens
            + [("wiki", i, 10) for i in range(4)]      # 40 tokens
        )
        got = self._run(spark, rows, 10_000)
        assert sum(r["uncapped"] for r in got.values()) == 10_000
        # exact isqrt weights
        assert got["web"]["weight"] == 316      # isqrt(100000)
        assert got["code"]["weight"] == 31      # isqrt(1000)
        assert got["wiki"]["weight"] == 6       # isqrt(40)
        # α=1/2 compression: 2500× tokens → ~53× budget, not 2500×
        assert got["web"]["uncapped"] < 100 * got["wiki"]["uncapped"]
        # quota clamps to what the source actually has
        assert got["wiki"]["quota"] == 40 and got["wiki"]["uncapped"] > 40
        assert got["web"]["quota"] == got["web"]["uncapped"]

    def test_isqrt_exact_at_square_boundaries(self, spark):
        from pyspark.sql import functions as F

        from bathyscaphe_spark.operators.sampling import isqrt_col

        vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 10**12 - 1, 10**12,
                (10**6 + 1) ** 2 - 1, (10**6 + 1) ** 2]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = {r.x: r.s for r in df.select("x", isqrt_col(F.col("x")).alias("s")).collect()}
        import math

        assert got == {v: math.isqrt(v) for v in vals}

    def test_partition_invariance(self, spark):
        rows = [(f"s{i % 7}", i, (i * 31) % 900 + 1) for i in range(140)]
        assert self._run(spark, rows, 7777, parts=1) == self._run(
            spark, rows, 7777, parts=13
        )


class TestDsirSelect:
    """DSIR hashed-ngram importance selection — integer micro-nat
    discipline, bit-identical at any parallelism."""

    def _run(self, spark, rows, **kw):
        from pyspark.sql import functions as F

        from bathyscaphe_spark.operators.sampling import dsir_select

        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = dsir_select(df, F.col("source") == "tgt", **kw)
        return {r["doc_id"]: (r["score_micro"], r["selected"]) for r in out.collect()}

    def test_target_like_doc_outscores_dissimilar(self, spark):
        rows = [
            (1, "alpha beta gamma alpha beta", "tgt"),
            (2, "alpha beta gamma", "raw"),       # matches target
            (3, "zulu yankee xray whiskey", "raw"),  # disjoint vocab
        ]
        got = self._run(spark, rows, top_k=2)
        assert got[2][0] > got[3][0]
        assert got[3][1] is False  # lowest scorer not in top-2

    def test_empty_doc_scores_zero(self, spark):
        rows = [(1, "alpha beta", "tgt"), (2, "", "raw")]
        got = self._run(spark, rows)
        assert got[2][0] == 0

    def test_one_row_per_doc_and_topk(self, spark):
        rows = [(i, f"w{i % 5} w{(i + 1) % 5}", "tgt" if i % 4 == 0 else "raw")
                for i in range(24)]
        got = self._run(spark, rows, top_k=6)
        assert len(got) == 24
        assert sum(1 for s, sel in got.values() if sel) == 6

    def test_partition_bit_identity(self, spark):
        from pyspark.sql import functions as F

        from bathyscaphe_spark.operators.sampling import dsir_select

        rows = [(i, " ".join(f"t{(i * j) % 13}" for j in range(1, 12)),
                 "tgt" if i % 5 == 0 else "raw") for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        a = sorted(map(tuple, dsir_select(df.repartition(1), F.col("source") == "tgt").collect()))
        b = sorted(map(tuple, dsir_select(df.repartition(11), F.col("source") == "tgt").collect()))
        assert a == b and len(a) == 60


class TestAssignSplit:
    def _df(self, spark, n=4000):
        return spark.range(n).selectExpr(
            "id AS doc_id", "'l' || CAST(id % 3 AS STRING) AS lang"
        )

    def test_partition_and_rerun_stability(self, spark):
        from bathyscaphe_spark.operators.sampling import assign_split

        df = self._df(spark)
        a = {r["doc_id"]: r["split"] for r in assign_split(df.coalesce(1), "doc_id").collect()}
        b = {r["doc_id"]: r["split"] for r in assign_split(df.repartition(9), "doc_id").collect()}
        assert a == b and len(a) == 4000

    def test_incremental_growth_never_moves_a_doc(self, spark):
        """A doc's split is a function of its key alone — growing the
        corpus cannot reassign earlier docs (the leakage mode)."""
        from bathyscaphe_spark.operators.sampling import assign_split

        small = {r["doc_id"]: r["split"]
                 for r in assign_split(self._df(spark, 500), "doc_id").collect()}
        big = {r["doc_id"]: r["split"]
               for r in assign_split(self._df(spark, 4000), "doc_id").collect()}
        assert all(big[k] == v for k, v in small.items())

    def test_rates_and_stratum_uniformity(self, spark):
        from bathyscaphe_spark.operators.sampling import assign_split

        rows = assign_split(self._df(spark, 9000), "doc_id").groupBy(
            "lang", "split").count().collect()
        frac = {(r["lang"], r["split"]): r["count"] / 3000 for r in rows}
        for lang in ("l0", "l1", "l2"):
            assert 0.96 < frac[(lang, "train")] < 1.0
            assert frac.get((lang, "val"), 0) < 0.03
            assert frac.get((lang, "test"), 0) < 0.03

    def test_salt_decorrelates_from_sample_bucket(self, spark):
        """The split must not align with unsalted sampling buckets —
        otherwise 'keep 1%' samples would be all-test or all-train."""
        from bathyscaphe_spark.operators.sampling import (
            assign_split,
            sample_bucket,
        )

        df = assign_split(self._df(spark, 4000), "doc_id").withColumn(
            "samp", sample_bucket(F.col("doc_id").cast("string"))
        )
        test_rows = df.where("split = 'test'")
        # if correlated, test rows would cluster in the top sample buckets
        lo = test_rows.where("samp < 5000").count()
        hi = test_rows.where("samp >= 5000").count()
        assert lo > 0 and hi > 0

    def test_rate_validation(self, spark):
        import pytest

        from bathyscaphe_spark.operators.sampling import assign_split

        with pytest.raises(ValueError):
            assign_split(self._df(spark, 10), "doc_id",
                         val_per_10k=5000, test_per_10k=5000)
