"""Count-min sketch frequency estimation + deterministic heavy hitters.

Why a crawler needs this: the politeness rank shuffles the frontier by
host, and at 10^10-URL scale a handful of mega-hosts (the reference's
single-Redis queue never sees this; our salted rank does —
operators/politeness.py) dominate partitions.  Picking WHICH hosts to
salt requires per-host frequencies *before* the shuffle — but an exact
``groupBy(host)`` is itself a full shuffle of every distinct host.  A
count-min sketch (Cormode & Muthukrishnan 2005, J. Algorithms 55(1) —
public) gets the hot set with a shuffle of at most ``depth × width``
rows: per-key counts are hashed into a fixed grid of counters, sums are
map-side combinable, and the merged grid is a broadcastable ≤64 KiB
table no matter how many distinct hosts exist.

Determinism discipline (what makes a DuckDB oracle possible): the
sketch is pure integer SUMS over FNV-derived buckets — no sampling, no
floats, no insertion order — so every cell, every estimate, and the
heavy-hitter set are bit-identical at any parallelism.  The classic CMS
guarantee is one-sided and *deterministic* (not probabilistic):

    exact(x) <= est(x)                          (always)
    est(x)   <= exact(x) + collisions           (collisions >= 0)

so thresholding estimates at ceil(N/phi) can never miss a true
phi-heavy hitter — false positives are possible, false negatives are
not.  That one-sidedness is exactly what the skew-salting consumer
wants: salting a non-hot host costs a few extra partitions; missing a
mega-host costs the straggler.

``width`` must be a power of two: the Spark side buckets with
``pmod(signed_fnv, width)`` and the DuckDB oracle with
``unsigned_fnv % width``, which agree iff 2^64 ≡ 0 (mod width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.fnv import fnv1_64

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(key: Column, row: int, width: int) -> Column:
    """Row ``row``'s counter index for ``key`` — FNV-1/64 over the
    row-seeded key, folded into ``width`` buckets (width = 2^k so the
    signed pmod here equals the oracle's unsigned mod)."""
    return F.pmod(
        fnv1_64(F.concat(F.lit(f"cms{row}:"), key)), F.lit(width)
    ).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the ``depth × width`` counter grid over ``df[key_col]``.

    Output: (row:int, bucket:int, cnt:bigint) — at most depth·width
    rows.  The only shuffle has key cardinality ≤ depth·width with
    map-side partial sums, independent of the input's key cardinality;
    two grids built over disjoint inputs MERGE by adding cells (the
    sums distribute), which is what makes the sketch a per-round
    incremental artifact like the Bloom delta fold.
    """
    if width & (width - 1):
        raise ValueError(f"cms width must be a power of two, got {width}")
    key = F.col(key_col)
    rows = [
        df.select(
            F.lit(r).alias("row"), _bucket(key, r, width).alias("bucket")
        )
        for r in range(depth)
    ]
    all_rows = rows[0]
    for r in rows[1:]:
        all_rows = all_rows.unionByName(r)
    return all_rows.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the grid for every row of ``keys`` (distinct keys).

    est(x) = min over rows of cell(row, h_row(x)).  The grid broadcasts
    (≤ depth·width rows); probing is a broadcast join + one
    map-combinable min — the keys side never shuffles.
    """
    key = F.col(key_col)
    probes = None
    for r in range(depth):
        p = keys.select(
            key, F.lit(r).alias("row"), _bucket(key, r, width).alias("bucket")
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    with_exact: bool = True,
) -> DataFrame:
    """All keys whose CMS estimate reaches ceil(N/phi) — a deterministic
    SUPERSET of the true phi-heavy hitters (est >= exact always).

    Output: (key, est, threshold[, cnt_exact, overestimate]).  The
    ``with_exact`` columns are the in-query contract the driver hashes
    (est >= cnt_exact >= 0, both integers); at production scale a
    consumer drops them — the whole point is never grouping by raw key.
    The candidate probe set here is ``df`` made distinct; a stricter
    at-scale variant probes only frontier-batch keys as they stream by.
    """
    sketch = cms_build(df, key_col, depth, width)
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    est = cms_estimate(sketch, df.select(key_col).distinct(), key_col, depth, width)
    out = (
        est.crossJoin(F.broadcast(n))
        .withColumn(
            "threshold",
            F.expr(f"(_n + {int(phi) - 1}) DIV {int(phi)}").cast("long"),
        )
        .where(F.col("est") >= F.col("threshold"))
        .drop("_n")
    )
    if with_exact:
        exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt_exact"))
        out = out.join(exact, key_col).withColumn(
            "overestimate", (F.col("est") - F.col("cnt_exact")).cast("long")
        )
    return out


def duckdb_cms_bucket_sql(col: str, row: int, width: int = CMS_WIDTH) -> str:
    """Oracle fragment: the same row-seeded bucket in DuckDB SQL."""
    from ..functions.fnv import DUCKDB_FNV1_64_SQL

    h = DUCKDB_FNV1_64_SQL.format(col=f"('cms{row}:' || {col})")
    return f"CAST(({h}) % {width} AS INT)"
