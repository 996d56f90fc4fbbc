"""Similarity search over embedding columns.

* ``cosine_topk``      — exact brute-force top-k (the correctness
  baseline; queries broadcast, corpus streamed — one pass, no shuffle of
  the corpus beyond its own partitioning).
* ``lsh_bucket``/``ann_lsh_topk`` — random-hyperplane LSH: sign-bit
  signatures bucket the corpus; a query only scores its own bucket
  (+ multi-probe neighbors), cutting compared pairs by ~2^n_planes.
  This is the 10^10-row scale path: bucketing is one narrow map, the
  per-bucket join shuffles on the bucket key.

Determinism: hyperplanes derive from a fixed seed; ordering ties break
on (rounded cosine desc, id asc) so results are identical at any
parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

ANN_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _with_norm(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = F.transform(vec_col, lambda x: x.cast("double"))
    df = emb.select(F.col(id_col).alias("_id"), v.alias("v"))
    return df.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))


def cosine_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_ids, k: int
) -> DataFrame:
    """Exact top-k neighbors for the given query ids.
    Output (q_id, n_id, rank); cosine rounded to 3 decimals for the
    deterministic tie-break (see queries.py knn oracle)."""
    base = _with_norm(emb, id_col, vec_col)
    q = base.where(F.col("_id").isin(list(query_ids))).selectExpr(
        "_id as q_id", "v as qv", "nrm as qn"
    )
    pairs = F.broadcast(q).crossJoin(
        base.selectExpr("_id as n_id", "v as nv", "nrm as nn")
    ).where(F.col("q_id") != F.col("n_id"))
    cos3 = F.round(_dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 3)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos3"), F.asc("n_id"))
    return (
        pairs.select("q_id", "n_id", cos3.alias("cos3"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = ANN_SEED) -> np.ndarray:
    """Deterministic random hyperplanes, shape (n_planes, dim)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(
    emb: DataFrame, id_col: str, vec_col: str, n_planes: int = 12,
    seed: int = ANN_SEED,
) -> DataFrame:
    """(id, bucket) — sign-bit signature vs the fixed hyperplanes.
    One vectorized matmul per Arrow batch (no shuffle)."""
    planes_holder: dict[str, np.ndarray] = {}

    @pandas_udf(LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        if "p" not in planes_holder:
            planes_holder["p"] = hyperplanes(mat.shape[1], n_planes, seed)
        proj = mat @ planes_holder["p"].T  # (n, planes)
        bits = (proj > 0).astype(np.int64)
        weights = (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        return pd.Series((bits * weights).sum(axis=1))

    return emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
    ).select("_id", "_v", _bucket(F.col("_v")).alias("bucket"))


def ann_lsh_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_ids, k: int,
    n_planes: int = 12, seed: int = ANN_SEED, multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, or
    (multiprobe=1) a bucket within Hamming distance 1 of it; exact
    cosine + rank within the candidate set.  Output (q_id, n_id, rank).

    Recall improves with fewer planes (bigger buckets) or more probes;
    tested against the exact baseline in tests/test_similarity.py.
    """
    bucketed = lsh_bucket(emb, id_col, vec_col, n_planes, seed)
    base = _with_norm(emb, id_col, vec_col).join(
        bucketed.select("_id", "bucket"), "_id"
    )
    q = base.where(F.col("_id").isin(list(query_ids))).selectExpr(
        "_id as q_id", "v as qv", "nrm as qn", "bucket"
    )
    if multiprobe >= 1:
        # probe the query's bucket plus every 1-bit-flip neighbor: the
        # query side (tiny) explodes, the corpus side never replicates
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    cand = base.selectExpr("_id as n_id", "v as nv", "nrm as nn", "bucket")
    pairs = (
        q.join(cand, "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
    )
    cos3 = F.round(_dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 3)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos3"), F.asc("n_id"))
    return (
        pairs.select("q_id", "n_id", cos3.alias("cos3"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"))
    )


# --- IVF (inverted-file) ANN -------------------------------------------------
#
# The second classic ANN scale path next to LSH: partition the corpus
# into cells around representative centroid vectors, search only the
# nprobe cells nearest each query.  Fully relational here — centroid
# pick, assignment, probing, and rerank are all column expressions, so
# the DuckDB oracle can replicate every value exactly (unlike the
# hyperplane path, whose recall is pinned by a planted-pair contract).
#
# Centroids are a deterministic HASH-PICKED sample (the n_cells vectors
# with the smallest (md5-bucket, id) keys) rather than k-means: uniform
# over the corpus, engine-independent, and stable under corpus growth.
# K-means would tighten cells but costs iterative passes and breaks
# bit-determinism; the hash pick is the honest baseline and the seam
# where trained centroids would plug in.

IVF_CELLS = 16
IVF_NPROBE = 4


def ivf_centroids(
    emb: DataFrame, id_col: str, vec_col: str, n_cells: int = IVF_CELLS
) -> DataFrame:
    """(cell, cv, cn): cell = 1-based rank in (md5-bucket, id) order.
    The pick is a TakeOrdered over a narrow projection (per-partition
    heaps, never a global sort); the rank window then runs over only
    n_cells rows."""
    from .sampling import sample_bucket

    base = _with_norm(emb, id_col, vec_col).withColumn(
        "bkt", sample_bucket(F.col("_id"))
    )
    picked = base.orderBy("bkt", "_id").limit(n_cells)
    w = Window.orderBy("bkt", "_id")
    return picked.select(
        F.row_number().over(w).cast("long").alias("cell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )


def _cell_scores(side: DataFrame, centroids: DataFrame) -> DataFrame:
    """side × broadcast(centroids) with cos6 = round(cos, 6): the 6-dp
    round + cell-asc tie-break keeps the argmax engine-independent."""
    cos6 = F.round(
        _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")), 6
    )
    return side.crossJoin(F.broadcast(centroids)).select(
        "_id", "v", "nrm", "cell", cos6.alias("cos6")
    )


def ivf_assign(
    emb: DataFrame, id_col: str, vec_col: str, n_cells: int = IVF_CELLS,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(_id, v, nrm, cell): each vector's best cell (cos6 desc, cell
    asc).  The argmax is a groupBy max(struct(...)) — the n_cells-way
    expansion combines map-side back to one row per id BEFORE the
    shuffle, where a Window would shuffle the whole expansion.  The
    struct comparison always terminates at negcell (unique per id), so
    the carried vector fields never participate in ordering."""
    if centroids is None:
        centroids = ivf_centroids(emb, id_col, vec_col, n_cells)
    scored = _cell_scores(_with_norm(emb, id_col, vec_col), centroids)
    best = scored.groupBy("_id").agg(
        F.max(
            F.struct(
                F.col("cos6"),
                (-F.col("cell")).alias("negcell"),
                F.col("cell"),
                F.col("v"),
                F.col("nrm"),
            )
        ).alias("m")
    )
    return best.select(
        "_id", F.col("m.v").alias("v"), F.col("m.nrm").alias("nrm"),
        F.col("m.cell").alias("cell"),
    )


def centroids_from_fp(trained: DataFrame, scale: int = 1 << 20) -> DataFrame:
    """(cell, cv, cn) from kmeans_fp_train's exploded fixed-point output
    — the adapter that plugs trained centroids into ivf_assign/ivf_topk
    in place of the hash-picked sample."""
    arr = (
        trained.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c_fp"))).alias("a"))
        .select(
            "cell",
            F.transform(
                "a", lambda s: s["c_fp"].cast("double") / F.lit(float(scale))
            ).alias("cv"),
        )
    )
    return arr.withColumn("cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))


def ivf_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_ids, k: int,
    n_cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: candidates live in the nprobe cells whose
    centroids are nearest the query; exact cosine rerank within.
    Output (q_id, n_id, rank).  The corpus side is assigned once (one
    shuffle) and never replicates; only the tiny query side explodes
    into probes."""
    if centroids is None:
        centroids = ivf_centroids(emb, id_col, vec_col, n_cells)
    corpus = ivf_assign(emb, id_col, vec_col, n_cells, centroids).selectExpr(
        "_id AS n_id", "v AS nv", "nrm AS nn", "cell"
    )
    qside = _with_norm(emb, id_col, vec_col).where(
        F.col("_id").isin(list(query_ids))
    )
    qscored = _cell_scores(qside, centroids)
    wq = Window.partitionBy("_id").orderBy(F.desc("cos6"), F.asc("cell"))
    probes = (
        qscored.withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= nprobe)
        .selectExpr("_id AS q_id", "v AS qv", "nrm AS qn", "cell")
    )
    pairs = probes.join(corpus, "cell").where(F.col("q_id") != F.col("n_id"))
    cos3 = F.round(_dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 3)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos3"), F.asc("n_id"))
    return (
        pairs.select("q_id", "n_id", cos3.alias("cos3"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"))
    )


def _trunc_div(s: int, n: int) -> int:
    """Integer division truncating toward zero — the semantics BOTH
    Spark's DIV and DuckDB's // implement (python's // floors, so the
    driver-side step must not use it)."""
    return -((-s) // n) if s < 0 else s // n


def kmeans_fp_train(
    emb: DataFrame, id_col: str, vec_col: str, n_cells: int = IVF_CELLS,
    iters: int = 2, scale: int = 1 << 20,
) -> DataFrame:
    """Deterministic distributed k-means (Lloyd) for IVF centroid
    training, in FIXED-POINT arithmetic: vectors quantize to
    floor(x·2^20) longs, distances are exact integer L2, and centroid
    updates are exact long sums followed by truncating division — so
    the result is bit-identical at any parallelism (float summation
    order can never leak in) and replicable by the integer-SQL oracle.

    Init = the hash-picked sample (``ivf_centroids``' pick); each
    iteration is one broadcast-assign (the groupBy min(struct) argmin,
    map-side combinable) + one (cell, pos) sum — the element-wise
    centroid numerators.  Per iteration the driver collects only
    n_cells × dim aggregated rows (bounded small, like the blacklist
    head); an empty cell keeps its previous centroid.

    Returns exploded (cell, pos, c_fp, n_members): scalar columns so
    engine-vs-oracle comparison never string-compares arrays.
    """
    from .sampling import sample_bucket

    spark = emb.sparkSession
    base = emb.select(
        F.col(id_col).alias("_id"),
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
        ).alias("vf"),
    ).persist()
    picked = (
        base.withColumn("bkt", sample_bucket(F.col("_id")))
        .orderBy("bkt", "_id")
        .limit(n_cells)
        .collect()
    )
    cents = [(i + 1, list(r["vf"])) for i, r in enumerate(picked)]
    members = {cell: 0 for cell, _ in cents}
    try:
        for _ in range(iters):
            cdf = F.broadcast(
                spark.createDataFrame(cents, "cell long, cf array<long>")
            )
            d2 = F.aggregate(
                F.zip_with("vf", "cf", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            assigned = (
                base.crossJoin(cdf)
                .select("_id", "vf", "cell", d2.alias("d2"))
                .groupBy("_id")
                .agg(F.min(F.struct("d2", "cell", "vf")).alias("m"))
                .select(F.col("m.cell").alias("cell"), F.col("m.vf").alias("vf"))
            )
            sums = (
                assigned.select("cell", F.posexplode("vf").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            by_cell: dict[int, dict[int, tuple[int, int]]] = {}
            for r in sums:
                by_cell.setdefault(r["cell"], {})[r["pos"]] = (r["s"], r["n"])
            nxt = []
            for cell, vec in cents:
                got = by_cell.get(cell)
                if got:
                    n = got[0][1]
                    nxt.append(
                        (cell, [_trunc_div(got[p][0], n) for p in range(len(vec))])
                    )
                    members[cell] = n
                else:
                    nxt.append((cell, vec))  # empty cell keeps its centroid
                    members[cell] = 0
            cents = nxt
    finally:
        base.unpersist()
    rows = [
        (cell, pos, val, members[cell])
        for cell, vec in cents
        for pos, val in enumerate(vec)
    ]
    return spark.createDataFrame(
        rows, "cell long, pos long, c_fp long, n_members long"
    )


# --- Product Quantization (Jégou/Douze/Schmid 2011, public) ----------------

PQ_M = 2        # subspaces
PQ_CELLS = 8    # centroids per subspace codebook (codes are 3 bits here)


def _pq_slices(emb: DataFrame, id_col: str, vec_col: str, m: int, dim: int):
    """(id, m, _slice) — each vector split into m contiguous subvectors."""
    sub = dim // m
    pieces = F.array(
        *(
            F.struct(
                F.lit(j).alias("m"),
                F.slice(F.col(vec_col), j * sub + 1, sub).alias("s"),
            )
            for j in range(m)
        )
    )
    return emb.select(
        F.col(id_col).alias("_id"), F.explode(pieces).alias("x")
    ).select("_id", F.col("x.m").alias("m"), F.col("x.s").alias("_slice"))


def pq_train(
    emb: DataFrame, id_col: str, vec_col: str, dim: int,
    m: int = PQ_M, n_cells: int = PQ_CELLS, iters: int = 1,
    scale: int = 1 << 20,
) -> DataFrame:
    """Per-subspace fixed-point codebooks: the vector splits into ``m``
    contiguous subvectors and each subspace trains its own
    ``kmeans_fp_train`` (same deterministic hash-picked init, exact
    integer Lloyd) — product quantization's whole trick is that m
    codebooks of K centroids index K^m virtual cells for m·K·(dim/m)
    stored longs.  Output exploded (m, cell, pos, c_fp, n_members)."""
    sub = dim // m
    parts = []
    for j in range(m):
        sliced = emb.select(
            F.col(id_col).alias(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("_slice"),
        )
        t = kmeans_fp_train(
            sliced, id_col, "_slice", n_cells=n_cells, iters=iters,
            scale=scale,
        )
        parts.append(t.select(F.lit(j).alias("m"), "*"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def pq_codebooks(trained: DataFrame) -> DataFrame:
    """(m, cell, cf: array<long>) from pq_train's exploded output."""
    return (
        trained.groupBy("m", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c_fp"))).alias("a"))
        .select("m", "cell", F.transform("a", lambda s: s["c_fp"]).alias("cf"))
    )


def _fp(col, scale: int):
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
    )


_D2 = lambda a, b: F.aggregate(  # noqa: E731 — shared integer L2
    F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
    F.lit(0).cast("long"),
    lambda acc, x: acc + x,
)


def pq_encode(
    emb: DataFrame, codebooks: DataFrame, id_col: str, vec_col: str,
    dim: int, m: int = PQ_M, scale: int = 1 << 20,
) -> DataFrame:
    """(id, m, code) — nearest codebook centroid per subspace, exact
    integer L2, ties to the smaller cell.  The corpus compresses to
    m smallints per vector: at 10^10 64-dim float vectors that is
    2.5 TB → 20 GB resident for the ADC scan.  One broadcast join
    (codebooks are m·K rows) + one map-side-combinable argmin."""
    sl = _pq_slices(emb, id_col, vec_col, m, dim).withColumn(
        "vf", _fp(F.col("_slice"), scale)
    )
    joined = sl.join(F.broadcast(codebooks), "m").select(
        "_id", "m", "cell", _D2(F.col("vf"), F.col("cf")).alias("d2")
    )
    return (
        joined.groupBy("_id", "m")
        .agg(F.min(F.struct("d2", "cell")).alias("b"))
        .select("_id", "m", F.col("b.cell").alias("code"))
    )


def pq_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_ids, k: int = 3,
    dim: int = 64, m: int = PQ_M, n_cells: int = PQ_CELLS,
    iters: int = 1, scale: int = 1 << 20,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the third ANN
    scale path beside hyperplane LSH and IVF: the corpus is scanned as
    m-byte codes, the QUERY stays exact, and the approximate distance
    is a table lookup — Σ_m ||q_m − c_{m,code_m}||², the classic ADC
    estimator.  Every step is relational integer arithmetic, so the
    oracle replicates training, encoding, tables, and ranking
    value-for-value (no recall-contract hedge needed).

    Scale shape: the per-query distance TABLE is queries × m × K rows
    (tiny, broadcast); codes join it on (m, code) and one
    map-side-combinable sum folds the m terms — the corpus never
    replicates per query beyond its m code rows, and no exact vectors
    move after encoding.  Output (q_id, n_id, adc, rank).
    """
    if codebooks is None:
        codebooks = pq_codebooks(
            pq_train(emb, id_col, vec_col, dim, m, n_cells, iters, scale)
        )
    codes = pq_encode(emb, codebooks, id_col, vec_col, dim, m, scale)
    qside = _pq_slices(
        emb.where(F.col(id_col).isin(list(query_ids))), id_col, vec_col, m, dim
    ).withColumn("vf", _fp(F.col("_slice"), scale))
    table = qside.join(F.broadcast(codebooks), "m").select(
        F.col("_id").alias("q_id"), "m", "cell",
        _D2(F.col("vf"), F.col("cf")).alias("td2"),
    )
    dist = (
        codes.withColumnRenamed("_id", "n_id")
        .join(
            F.broadcast(table),
            (codes["m"] == table["m"]) & (codes["code"] == table["cell"]),
        )
        .groupBy("q_id", "n_id")
        .agg(F.sum("td2").alias("adc"))
        .where(F.col("q_id") != F.col("n_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("n_id"))
    return (
        dist.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id", "n_id", F.col("adc").cast("long").alias("adc"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
