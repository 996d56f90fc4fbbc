"""Similarity search: exact top-k baseline vs LSH-bucketed ANN."""

import pytest

from bathyscaphe_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    lsh_bucket,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    df.count()
    yield df
    df.unpersist()


def test_exact_topk_deterministic(spark, emb):
    a = cosine_topk(emb, "vec_id", "embedding", range(5), k=3).collect()
    b = cosine_topk(emb.repartition(7), "vec_id", "embedding", range(5), k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_q = {}
    for r in a:
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())


def test_lsh_bucket_deterministic(spark, emb):
    a = {(r["_id"], r["bucket"]) for r in lsh_bucket(emb, "vec_id", "embedding", 8).select("_id", "bucket").collect()}
    b = {(r["_id"], r["bucket"]) for r in lsh_bucket(emb.repartition(5), "vec_id", "embedding", 8).select("_id", "bucket").collect()}
    assert a == b
    buckets = {x[1] for x in a}
    assert 1 < len(buckets) <= 256


def test_ann_recall_vs_exact(spark, emb):
    """With few planes (big buckets) the ANN top-1 should usually agree
    with the exact top-1; recall@3 must be well above chance."""
    exact = cosine_topk(emb, "vec_id", "embedding", range(10), k=3).collect()
    approx = ann_lsh_topk(emb, "vec_id", "embedding", range(10), k=3, n_planes=4).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r["q_id"], set()).add(r["n_id"])
    ap = {}
    for r in approx:
        ap.setdefault(r["q_id"], set()).add(r["n_id"])
    hits = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    total = sum(len(v) for v in ex.values())
    assert hits / total >= 0.3, f"recall {hits}/{total} too low"


def test_ann_subset_semantics(spark, emb):
    """Every ANN result is a real corpus row and never the query itself."""
    out = ann_lsh_topk(emb, "vec_id", "embedding", range(5), k=3, n_planes=6).collect()
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    for r in out:
        assert r["n_id"] in ids and r["n_id"] != r["q_id"]


# --- IVF ---------------------------------------------------------------


def _clustered(spark, n_clusters=5, per=40, dim=16):
    """Tight, well-separated clusters: cluster c lives on axis c with
    tiny deterministic jitter, so same-cluster cosine ≈ 1 and
    cross-cluster cosine ≈ 0."""
    rows = []
    for c in range(n_clusters):
        for i in range(per):
            v = [0.0] * dim
            v[c] = 1.0
            v[(c + 1) % dim] = 0.001 * ((c * per + i) % 7)
            rows.append((c * per + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_assignment_total_and_deterministic(spark):
    from bathyscaphe_spark.operators.similarity import ivf_assign

    d = _clustered(spark)
    a = {(r["_id"], r["cell"]) for r in ivf_assign(d, "vec_id", "embedding").collect()}
    b = {(r["_id"], r["cell"]) for r in ivf_assign(d.repartition(9), "vec_id", "embedding").collect()}
    assert a == b
    assert len(a) == 200                      # every vector, exactly once
    assert 1 < len({c for _, c in a}) <= 16   # multiple non-empty cells


def test_ivf_equals_exact_on_separated_clusters(spark):
    """With tight separated clusters every true neighbor shares the
    query's cell, so IVF top-k must equal the exact top-k."""
    from bathyscaphe_spark.operators.similarity import ivf_topk

    d = _clustered(spark)
    qs = [0, 40, 80, 120, 160]  # one query per cluster
    exact = cosine_topk(d, "vec_id", "embedding", qs, k=3).collect()
    approx = ivf_topk(d, "vec_id", "embedding", qs, k=3).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, approx))


def test_ivf_subset_semantics(spark, emb):
    from bathyscaphe_spark.operators.similarity import ivf_topk

    out = ivf_topk(emb, "vec_id", "embedding", range(5), k=3).collect()
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    for r in out:
        assert r["n_id"] in ids and r["n_id"] != r["q_id"]


def test_kmeans_fp_deterministic_and_convergent(spark):
    """Fixed-point Lloyd: bit-identical under repartitioning, and on
    separated clusters each populated cell's centroid is dominated by
    one cluster axis after 2 iterations."""
    from bathyscaphe_spark.operators.similarity import kmeans_fp_train

    d = _clustered(spark)
    a = sorted(map(tuple, kmeans_fp_train(d, "vec_id", "embedding").collect()))
    b = sorted(map(tuple, kmeans_fp_train(
        d.repartition(13), "vec_id", "embedding").collect()))
    assert a == b
    # members over populated cells cover the corpus
    mem = {}
    for cell, pos, c_fp, n in a:
        mem[cell] = n
    assert sum(mem.values()) == 200
    # every populated cell's centroid has its mass on a single axis
    by_cell = {}
    for cell, pos, c_fp, n in a:
        if n > 0:
            by_cell.setdefault(cell, []).append(c_fp)
    for cell, vec in by_cell.items():
        top = max(abs(v) for v in vec)
        assert top > 0.8 * (1 << 20), (cell, vec)


def test_ivf_topk_with_trained_centroids_matches_exact(spark):
    from bathyscaphe_spark.operators.similarity import (
        centroids_from_fp,
        ivf_topk,
        kmeans_fp_train,
    )

    d = _clustered(spark)
    trained = centroids_from_fp(kmeans_fp_train(d, "vec_id", "embedding"))
    qs = [0, 40, 80, 120, 160]
    exact = cosine_topk(d, "vec_id", "embedding", qs, k=3).collect()
    approx = ivf_topk(d, "vec_id", "embedding", qs, k=3,
                      centroids=trained).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, approx))


def test_pq_encode_total_and_in_range(spark):
    from bathyscaphe_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_train,
    )

    d = _clustered(spark)  # 200 vectors, dim 16
    cb = pq_codebooks(pq_train(d, "vec_id", "embedding", dim=16, m=2, n_cells=4))
    codes = pq_encode(d, cb, "vec_id", "embedding", dim=16, m=2).collect()
    assert len(codes) == 200 * 2  # every vector, every subspace
    assert {r.m for r in codes} == {0, 1}
    assert all(1 <= r.code <= 4 for r in codes)


def test_pq_retrieves_same_cluster_on_separated_clusters(spark):
    """Clusters live on distinct axes, so at least one subspace
    separates them completely — ADC neighbors must come from the
    query's own cluster."""
    from bathyscaphe_spark.operators.similarity import pq_topk

    d = _clustered(spark, n_clusters=4, per=30, dim=16)
    out = pq_topk(
        d, "vec_id", "embedding", query_ids=[0, 35, 70, 100], k=5,
        dim=16, m=2, n_cells=8, iters=2,
    ).collect()
    assert len(out) == 4 * 5
    for r in out:
        assert r.q_id // 30 == r.n_id // 30, (r.q_id, r.n_id)


def test_pq_bit_identical_across_partitionings(spark):
    from bathyscaphe_spark.operators.similarity import pq_topk

    d = _clustered(spark)
    runs = []
    for parts in (1, 13):
        out = pq_topk(
            d.repartition(parts), "vec_id", "embedding",
            query_ids=[0, 50, 120], k=4, dim=16, m=2, n_cells=4,
        ).collect()
        runs.append(sorted((r.q_id, r.n_id, r.adc, r.rank) for r in out))
    assert runs[0] == runs[1]


def test_pq_adc_is_codebook_table_sum(spark):
    """ADC must equal the sum over subspaces of the exact integer L2
    between the query slice and the MATCHED CODE's centroid — mirror
    the lookup in python for one query."""
    from bathyscaphe_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk,
        pq_train,
    )

    d = _clustered(spark)
    cb_df = pq_codebooks(pq_train(d, "vec_id", "embedding", dim=16, m=2, n_cells=4))
    cb = {(r.m, r.cell): list(r.cf) for r in cb_df.collect()}
    codes = {
        (r._id, r.m): r.code
        for r in pq_encode(d, cb_df, "vec_id", "embedding", dim=16, m=2).collect()
    }
    vecs = {r.vec_id: list(r.embedding) for r in d.collect()}
    out = pq_topk(
        d, "vec_id", "embedding", query_ids=[7], k=3, dim=16, m=2,
        n_cells=4, codebooks=cb_df,
    ).collect()
    import math

    qf = [math.floor(x * (1 << 20)) for x in vecs[7]]
    for r in out:
        want = 0
        for m in (0, 1):
            c = cb[(m, codes[(r.n_id, m)])]
            s = qf[m * 8 : (m + 1) * 8]
            want += sum((a - b) ** 2 for a, b in zip(s, c))
        assert r.adc == want
