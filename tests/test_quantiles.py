"""Log-linear quantile histogram (operators/quantiles.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bathyscaphe_spark.operators.quantiles import (
    HIST_PRECISION,
    bin_index,
    bin_lo,
    hist_build,
    hist_merge,
    hist_quantiles,
)


def _pybin(v: int, p: int = HIST_PRECISION) -> int:
    if v < (1 << p):
        return v
    e = v.bit_length() - 1
    return ((e - p) << p) + (v >> (e - p))


def _pylo(b: int, p: int = HIST_PRECISION) -> int:
    if b < (1 << (p + 1)):
        return b
    s = (b >> p) - 1
    return (b - (s << p)) << s


def test_bin_monotone_contiguous_dense():
    """Consecutive integers step the bin by 0 or 1 — no gaps, no
    inversions (the property a float-log binning provably violates)."""
    prev = -1
    for v in range(0, 1 << 14):
        b = _pybin(v)
        assert b - prev in (0, 1), (v, prev, b)
        prev = b


def test_lo_inverts_and_bounds_error():
    """lo(bin(v)) <= v with relative error < 2^-p, including at every
    power-of-two edge up to 2^62."""
    vals = list(range(0, 4096)) + [
        (1 << e) + d
        for e in range(HIST_PRECISION, 63)
        for d in (0, 1, (1 << e) - 1, (1 << (e - 1)))
    ]
    for v in vals:
        lo = _pylo(_pybin(v))
        assert lo <= v
        if v > 0:
            assert v == lo or (v - lo) * (1 << HIST_PRECISION) < v, (v, lo)


def test_spark_matches_python_formula(spark):
    vals = list(range(0, 300)) + [
        (1 << e) + d for e in range(5, 62) for d in (0, 1, (1 << e) - 1)
    ]
    df = spark.createDataFrame([(v,) for v in sorted(set(vals))], "v bigint")
    got = df.select(
        "v",
        bin_index(F.col("v")).alias("b"),
        bin_lo(bin_index(F.col("v"))).alias("lo"),
    ).toPandas()
    for v, b, lo in zip(got["v"], got["b"], got["lo"]):
        assert b == _pybin(int(v)), (v, b)
        assert lo == _pylo(_pybin(int(v))), (v, lo)


def test_merge_equals_direct_build(spark):
    """Histograms over disjoint halves merged cell-wise == one build
    over the union — the property that makes the sketch a per-round
    incremental artifact."""
    data = [
        (i % 3, ((i * 1103515245 + 12345) % 2147483648) >> (i % 21))
        for i in range(4000)
    ]
    df = spark.createDataFrame(data, "g int, v bigint")
    direct = hist_build(df, "v", ["g"]).orderBy("g", "bin").toPandas()
    merged = (
        hist_merge(
            hist_build(df.where("v % 2 = 0"), "v", ["g"]),
            hist_build(df.where("v % 2 = 1"), "v", ["g"]),
        )
        .orderBy("g", "bin")
        .toPandas()
    )
    assert direct.equals(merged)


def test_quantiles_within_relative_bound(spark):
    data = [
        (i % 3, ((i * 1103515245 + 12345) % 2147483648) >> (i % 21))
        for i in range(4000)
    ]
    df = spark.createDataFrame(data, "g int, v bigint")
    qdf = (
        hist_quantiles(hist_build(df, "v", ["g"]), [500, 900, 990], ["g"])
        .orderBy("g", "q_permille")
        .toPandas()
    )
    raw = pd.DataFrame(data, columns=["g", "v"])
    for g, q, est in zip(qdf["g"], qdf["q_permille"], qdf["est"]):
        s = sorted(raw[raw.g == g]["v"])
        exact = s[(q * len(s) + 999) // 1000 - 1]
        assert est <= exact
        assert est == exact or (exact - est) * (1 << HIST_PRECISION) < exact


def test_state_is_bounded(spark):
    """The whole point: 4000 values collapse to O(p * 64) bins."""
    df = spark.createDataFrame(
        [(((i * 2654435761) % (1 << 32)),) for i in range(4000)], "v bigint"
    )
    n_bins = hist_build(df, "v").count()
    assert n_bins <= (1 << HIST_PRECISION) * 64
