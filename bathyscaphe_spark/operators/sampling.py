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
