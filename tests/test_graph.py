"""Fixed-point PageRank operator (operators/graph.py)."""

import pytest

from bathyscaphe_spark.operators.graph import SCALE, pagerank_fp

EDGES = [
    (1, 2), (2, 1), (1, 3),  # 3 is dangling (no out-edges)
    (4, 1), (4, 2), (4, 3),
]


def _reference_pagerank(edges, iters):
    """Pure-python replica of the integer recurrence (same variant:
    dangling mass dropped)."""
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (15 * SCALE) // (100 * n)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += (rank[s] * 85) // (100 * outdeg[s])
        rank = nxt
    return rank


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_matches_reference(spark, iters):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fp(edges, iters=iters).collect()
    }
    assert got == _reference_pagerank(EDGES, iters)


def test_pagerank_partitioning_invariant(spark):
    """BIGINT sums are associative: the result is bit-identical no
    matter how the edges are partitioned (the cluster-size-invariance
    property the scaling protocol pins for the crawl)."""
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    a = sorted(map(tuple, pagerank_fp(edges, iters=3).collect()))
    b = sorted(
        map(tuple, pagerank_fp(edges.repartition(7), iters=3).collect())
    )
    assert a == b


def test_pagerank_empty(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank_fp(edges, iters=2).count() == 0
