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
