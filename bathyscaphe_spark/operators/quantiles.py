"""Log-linear quantile histogram — mergeable percentiles in O(bins) state.

Why a crawler needs this: adaptive politeness (operators/politeness.py)
and the refresh planner (operators/recrawl.py) want per-host latency and
response-size *percentiles* (p95 fetch latency decides a host's safe
concurrency; p50 body size feeds the bandwidth budget).  An exact
``percentile()`` keeps every value per group — O(fetches) state that
re-shuffles each round.  A histogram sketch keeps one integer count per
bucket: build is a map-side-combinable groupBy, two rounds MERGE by
adding cells (like the count-min grid in operators/sketch.py), and the
total state per host is ≤ a few hundred rows no matter how many fetches
the host saw.  This is the DDSketch/HdrHistogram idea (Masson, Rim &
Lee, VLDB 2019 "DDSketch"; Tene's HdrHistogram — both public), with the
guarantee: every quantile estimate has bounded RELATIVE error 2^-p.

Determinism discipline (what makes the DuckDB oracle possible): the
canonical formulations bucket by ``ceil(log_gamma(x))`` — a float log,
which provably misbuckets at edges (log2(2^53 - 1) rounds to exactly
53.0 in IEEE doubles, one bucket too high).  Here the bucket index is
pure INTEGER arithmetic on non-negative BIGINT values:

    e   = length(bin(v)) - 1          -- floor(log2(v)), via the binary
                                      -- string both engines render
    bin = v                            if v < 2^p       (exact region)
        = ((e-p) << p) + (v >> (e-p))  otherwise        (log region)

The mapping is monotone and contiguous (max bin of exponent e + 1 =
min bin of exponent e+1), each log-region bucket spans 2^(e-p) values
starting at its lower edge, so the lower-edge representative

    lo(bin) = bin                      if bin < 2^(p+1)
            = (bin - (s << p)) << s,   s = (bin >> p) - 1

under-estimates the true value by < 2^(e-p)/2^e = 2^-p relative.
Quantile query = nearest-rank walk over the cumulative counts in bin
order — one window cumsum, deterministic at any parallelism (no
sampling anywhere, unlike KLL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HIST_PRECISION = 5  # relative error 2^-5 ≈ 3.1%


def bin_index(v: Column, p: int = HIST_PRECISION) -> Column:
    """Bucket index of non-negative bigint ``v`` (integer-exact)."""
    e = (F.length(F.bin(v)) - F.lit(1)).cast("int")
    shift = e - F.lit(p)
    log_bin = (shift.cast("bigint") * F.lit(1 << p)) + F.call_function(
        "shiftright", v, shift
    )
    return F.when(v < F.lit(1 << p), v).otherwise(log_bin).cast("bigint")


def bin_lo(bin_col: Column, p: int = HIST_PRECISION) -> Column:
    """Lower edge (deterministic representative) of a bucket index."""
    s = (F.call_function("shiftright", bin_col, F.lit(p)) - F.lit(1)).cast("int")
    return F.when(bin_col < F.lit(1 << (p + 1)), bin_col).otherwise(
        F.call_function(
            "shiftleft", bin_col - (s.cast("bigint") * F.lit(1 << p)), s
        )
    ).cast("bigint")


def hist_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = HIST_PRECISION,
) -> DataFrame:
    """Histogram over ``df[value_col]`` (must be non-negative integers —
    negatives would need a sign-split pair of histograms; a crawler's
    latencies/sizes never are).

    Output: (*group_cols, bin:bigint, cnt:bigint).  The only shuffle has
    key cardinality |groups| × O(p · 64) with map-side partial counts —
    independent of the number of values.  Two histograms over disjoint
    inputs MERGE by adding cells (see :func:`hist_merge`), which makes
    the sketch a per-round incremental artifact like the Bloom delta.
    """
    group_cols = group_cols or []
    v = F.col(value_col).cast("bigint")
    return (
        df.select(*group_cols, bin_index(v, p).alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Merge histograms built over disjoint inputs: bin-wise count sum
    (exactly equal to a from-scratch build over the union)."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame,
    qs: list[int],
    group_cols: list[str] | None = None,
    p: int = HIST_PRECISION,
) -> DataFrame:
    """Nearest-rank quantiles from a histogram.  ``qs`` are integer
    per-mille targets (500 = p50, 990 = p99) so rank arithmetic stays
    exact: rank(q) = ceil(q · N / 1000) = floor((q·N + 999)/1000).

    Output: (*group_cols, q_permille:int, est:bigint) — ``est`` is the
    lower edge of the first bucket whose cumulative count reaches the
    rank; true_value/est ∈ [1, 1 + 2^-p · 2) per the binning bound.
    One window cumsum per group + a broadcast-range join against the
    tiny q list; never touches raw values.
    """
    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*group_cols)).alias("n"),
    )
    q_df = hist.sparkSession.createDataFrame(
        [(int(q),) for q in qs], "q_permille int"
    )
    ranked = cum.crossJoin(F.broadcast(q_df)).where(
        F.col("cum") * F.lit(1000) >= F.col("q_permille") * F.col("n")
    )
    return (
        ranked.groupBy(*group_cols, "q_permille")
        .agg(F.min("bin").alias("bin"))
        .select(
            *group_cols,
            "q_permille",
            bin_lo(F.col("bin"), p).alias("est"),
        )
    )


def duck_bin_expr(v: str, p: int = HIST_PRECISION) -> str:
    """The bin_index arithmetic as DuckDB SQL over expression ``v`` —
    shared verbatim by oracles so the binning itself is what's pinned."""
    return (
        f"CASE WHEN {v} < {1 << p} THEN CAST({v} AS BIGINT) "
        f"ELSE CAST((length(bin(CAST({v} AS BIGINT))) - 1 - {p}) AS BIGINT) * {1 << p} "
        f"+ ({v} >> (length(bin(CAST({v} AS BIGINT))) - 1 - {p})) END"
    )


def duck_lo_expr(b: str, p: int = HIST_PRECISION) -> str:
    """bin_lo as DuckDB SQL over bin expression ``b``."""
    return (
        f"CASE WHEN {b} < {1 << (p + 1)} THEN {b} "
        f"ELSE ({b} - (({b} >> {p}) - 1) * {1 << p}) << (({b} >> {p}) - 1) END"
    )
