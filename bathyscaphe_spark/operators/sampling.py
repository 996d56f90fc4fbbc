"""Deterministic stratified sampling for corpus mixing.

Assembling a training corpus from a crawl means mixing strata (domain,
source, language, quality band) at CHOSEN rates — "keep 100% of wiki,
25% of forums" (the public CCNet / The Pile / DoReMi recipe shape).  A
``df.sample(fraction)`` is wrong for this job twice over: the kept set
changes with partitioning/seed plumbing, and per-stratum rates would
need N passes.

``weighted_sample`` keeps a row iff a uniform hash-bucket of its KEY
falls under its stratum's threshold:

    bucket(key) = int(md5(key)[:8 hex], 16) mod 10000   (uniform)
    keep ⇔ bucket < round(rate[stratum] · 10000)

Properties that matter at 100 TB:
* pure codegen — ``md5``/``conv``/``pmod`` and a literal map lookup are
  all JVM column expressions; one scan, zero shuffles, zero UDFs;
* deterministic & stable — the kept set depends only on key bytes, so
  re-runs, retries, different cluster sizes, and INCREMENTAL ingests
  agree (a document's fate never changes when the corpus around it
  grows — the property random sampling cannot give);
* nested rates compose — rate 0.25 keeps a subset of rate 0.5's picks,
  so corpus ablations are monotone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 10_000


def sample_bucket(key: Column) -> Column:
    """Uniform bucket in [0, SAMPLE_BUCKETS): first 8 hex digits of
    md5(key) as an integer, mod buckets.  32 hash bits >> 10^4 buckets,
    so bucket skew is negligible; md5 is byte-stable across engines
    (the DuckDB oracle computes the identical digest)."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(SAMPLE_BUCKETS),
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Rows of ``df`` kept by per-stratum deterministic sampling, with
    the bucket exposed for auditability: input columns + (bucket,
    threshold).  Thresholds are integers (round(rate·10000)) so the
    keep decision is exact integer comparison — no float boundary."""
    thresholds = {s: int(round(r * SAMPLE_BUCKETS)) for s, r in rates.items()}
    default_thr = F.lit(int(round(default_rate * SAMPLE_BUCKETS)))
    if thresholds:
        mapping = F.create_map(
            *[F.lit(x) for s, t in sorted(thresholds.items()) for x in (s, t)]
        )
        thr = F.coalesce(mapping[F.col(strata_col)], default_thr).cast("long")
    else:
        thr = default_thr.cast("long")
    return (
        df.withColumn("bucket", sample_bucket(F.col(key_col)))
        .withColumn("threshold", thr)
        .where(F.col("bucket") < F.col("threshold"))
    )


def assign_split(
    df: DataFrame,
    key_col: str,
    val_per_10k: int = 100,
    test_per_10k: int = 100,
    salt: str = "split:",
) -> DataFrame:
    """Deterministic train/val/test assignment — the release-time split
    every training corpus ships with, as a pure column expression.

    split(key) = 'train' | 'val' | 'test' by the salted md5 bucket of
    the KEY (not the row): re-runs, retries, different cluster sizes,
    and incremental corpus growth never move a document between splits
    (the leakage mode random splits have), and the salt decorrelates
    the split from every sampling decision made with the unsalted
    bucket upstream.  Integer per-10k rates make the boundaries exact;
    strata need no per-stratum logic — a uniform hash of the key is
    uniform within every stratum, so per-language fractions converge to
    the same rates (a driver-checked property of the split query).

    Map-only: zero shuffles, zero UDFs — at 100 TB the split is free,
    riding whatever scan already touches the corpus.
    """
    if val_per_10k + test_per_10k >= SAMPLE_BUCKETS:
        raise ValueError("val+test rates must leave room for train")
    b = sample_bucket(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    train_hi = SAMPLE_BUCKETS - val_per_10k - test_per_10k
    val_hi = SAMPLE_BUCKETS - test_per_10k
    return df.withColumn("split_bucket", b).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_hi, "train")
        .when(F.col("split_bucket") < val_hi, "val")
        .otherwise("test"),
    )


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
) -> DataFrame:
    """Keep documents per stratum until a TOKEN budget is filled — the
    mixing knob LLM corpus recipes actually specify ("200B tokens of
    web, 30B of code"), where ``weighted_sample``'s doc-rate knob is
    only a proxy.

    Semantics (exact, engine-independent): order each stratum by
    (bucket(key), key); the running token total over ALL docs in that
    order admits a doc iff the total including it is ≤ the stratum
    budget — a prefix cut that closes at the first overflowing doc
    (expressible as one SQL window, which is what the oracle runs).
    The hash-bucket prefix makes the kept set a uniform sample; the
    key tie-break makes it total and deterministic.

    Scale design: the naive form is one Window over each whole stratum
    — a single sort task per stratum at 100 TB.  Instead:

    1. aggregate token sums per (stratum, bucket) — one partial-agg
       shuffle to ≤ strata × 10,000 rows;
    2. prefix-sum that tiny table with a Window (driver never sees it);
    3. broadcast-join the classification back: buckets wholly under
       budget keep all docs, buckets wholly past it drop, and only the
       ONE boundary bucket per stratum (~1/10,000 of the data) pays an
       exact within-bucket Window.

    Output: input columns + (bucket, tok_before) for kept rows, where
    tok_before is the stratum's running total before the doc.
    """
    from pyspark.sql import Window

    thr = {s: int(b) for s, b in budgets.items()}
    default_thr = F.lit(int(default_budget))
    if thr:
        mapping = F.create_map(
            *[F.lit(x) for s, b in sorted(thr.items()) for x in (s, b)]
        )
        budget = F.coalesce(mapping[F.col(strata_col)], default_thr).cast("long")
    else:
        budget = default_thr.cast("long")

    d = df.withColumn("bucket", sample_bucket(F.col(key_col))).withColumn(
        "_budget", budget
    )

    per_bucket = d.groupBy(strata_col, "bucket").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("_bsum")
    )
    w_pre = (
        Window.partitionBy(strata_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    classes = per_bucket.select(
        strata_col,
        "bucket",
        F.coalesce(F.sum("_bsum").over(w_pre), F.lit(0)).alias("_pre"),
        F.col("_bsum"),
    )

    j = d.join(F.broadcast(classes), [strata_col, "bucket"])
    whole = j.where(F.col("_pre") + F.col("_bsum") <= F.col("_budget")).withColumn(
        "_intok", F.lit(None).cast("long")
    )
    boundary = j.where(
        (F.col("_pre") < F.col("_budget"))
        & (F.col("_pre") + F.col("_bsum") > F.col("_budget"))
    )
    w_in = (
        Window.partitionBy(strata_col, "bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary = boundary.withColumn(
        "_intok", F.sum(F.col(tokens_col).cast("long")).over(w_in)
    ).where(F.col("_pre") + F.col("_intok") <= F.col("_budget"))

    out_cols = df.columns + ["bucket"]
    w_exact = (
        Window.partitionBy(strata_col, "bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        whole.unionByName(boundary)
        .withColumn(
            "tok_before",
            F.col("_pre")
            + F.coalesce(
                F.sum(F.col(tokens_col).cast("long")).over(w_exact), F.lit(0)
            ),
        )
        .select(*out_cols, "tok_before")
    )


def isqrt_col(x: Column) -> Column:
    """Exact integer square root of a nonnegative BIGINT column: the
    float sqrt rounds, then at most ±1 integer correction pins the
    exact floor — deterministic wherever doubles hold 53 bits of x,
    and replicated verbatim by the oracle."""
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    s = F.when((s + 1) * (s + 1) <= x, s + 1).otherwise(s)
    return F.when(s * s > x, s - 1).otherwise(s)


def temperature_budgets(
    docs: DataFrame,
    group_col: str,
    tokens_col: str,
    total_budget: int,
    max_per_group: int | None = None,
) -> DataFrame:
    """Temperature-scaled corpus mixing budgets — the α-sampling every
    multilingual/multi-source LM run applies (public convention since
    mBERT/XLM: sample source i ∝ tokens_i^α with α < 1 so small
    sources up-weight and the head source stops dominating).  α = 1/2
    here because it is the one nontrivial temperature with an EXACT
    integer form: weight_i = isqrt(Σ tokens_i), then the total token
    budget divides by largest-remainder (Hamilton) apportionment —
    reusing ``politeness.allocate_budget``'s DECIMAL(38,0) exact-sum
    machinery, with each group's budget clamped to what it actually
    has.

    Scale shape: one map-side-combinable groupBy over the corpus, then
    the whole apportionment runs on the GROUP table (sources/langs —
    tens of rows at any corpus size).

    Output: (group, tokens, weight, uncapped, quota) — Σ uncapped ==
    total_budget exactly.
    """
    from .politeness import allocate_budget

    stats = (
        docs.groupBy(F.col(group_col).alias("host"))
        .agg(F.sum(tokens_col).cast("long").alias("pending"))
        .withColumn("weight", isqrt_col(F.col("pending")))
    )
    out = allocate_budget(stats, total_budget, max_per_host=max_per_group)
    return out.join(stats, "host").select(
        F.col("host").alias("group"),
        F.col("pending").alias("tokens"),
        "weight",
        "uncapped",
        "quota",
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    top_k: int = 100,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169 — public): score every raw document by how
    much its hashed-n-gram distribution looks like a TARGET slice
    (``is_target`` marks the exemplar docs, e.g. a trusted source),
    then select the top scorers.  The importance weight is the paper's
    bag-of-hashed-ngrams likelihood ratio

        log w(x) = Σ_g  [ log p̂_target(bucket(g)) − log p̂_raw(bucket(g)) ]

    over unigrams + bigrams, add-one smoothed, FNV-hashed into
    ``n_buckets`` buckets.

    Output: (id, score_micro, selected) — one row per input doc.

    Determinism discipline: each BUCKET's log-ratio term is rounded to
    an integer micro-nat ONCE (a ≤n_buckets-row table), and the
    per-doc score is an exact BIGINT dot product of integer gram
    counts with integer terms — so the score is bit-identical at any
    parallelism (no float summation order anywhere), and the DuckDB
    oracle replicates it exactly.

    Scale design: grams explode JVM-side and immediately reduce to
    (doc, bucket) integer counts (map-side combinable — the only
    corpus-sized shuffle); both count histograms and the term table
    are ≤n_buckets rows, broadcast back; the final top-k is a global
    rank over one small (id, score) table (at petabyte scale swap the
    rank for a sampled score-threshold cut — the scores themselves are
    unchanged).  Zero UDFs outside FNV's Arrow kernel.
    """
    from ..functions.fnv import fnv1_64

    B = int(n_buckets)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    d = docs.select(
        F.col(id_col).alias("_id"), is_target.alias("_tgt"), words.alias("_w")
    )
    uni = d.select("_id", "_tgt", F.explode("_w").alias("_g"))
    bi = d.where(F.size("_w") >= 2).select(
        "_id",
        "_tgt",
        F.explode(
            F.expr(
                "transform(slice(_w, 1, size(_w) - 1),"
                " (x, i) -> concat(x, ' ', element_at(_w, i + 2)))"
            )
        ).alias("_g"),
    )
    grams = uni.unionByName(bi).select(
        "_id", "_tgt", F.pmod(fnv1_64(F.col("_g")), F.lit(B)).alias("_b")
    )
    # dg feeds three consumers (corpus counts, target counts, the doc
    # score join) — checkpoint so the gram explode + FNV kernel run once
    dg = (
        grams.groupBy("_id", "_tgt", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    cr = dg.groupBy("_b").agg(F.sum("_c").alias("_cr"))
    ct = dg.where("_tgt").groupBy("_b").agg(F.sum("_c").alias("_ct"))
    tot = cr.agg(F.sum("_cr").alias("_Tr")).crossJoin(
        F.broadcast(ct.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("_Tt")))
    )
    term = (
        cr.join(ct, "_b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_b",
            F.round(
                F.lit(1_000_000.0)
                * (
                    F.log(F.coalesce(F.col("_ct"), F.lit(0)) + 1)
                    - F.log(F.col("_Tt") + B)
                    - F.log(F.col("_cr") + 1)
                    + F.log(F.col("_Tr") + B)
                ),
                0,
            )
            .cast("long")
            .alias("_t"),
        )
    )
    scores = (
        dg.join(F.broadcast(term), "_b")
        .groupBy("_id")
        .agg(F.sum(F.col("_c") * F.col("_t")).alias("_sc"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score_micro").desc(), F.col(id_col))
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(scores, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_sc", F.lit(0)).cast("long").alias("score_micro"),
        )
        .withColumn("selected", F.row_number().over(w) <= int(top_k))
    )
