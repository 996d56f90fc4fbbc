"""Feistel epoch-shuffle: bijection, determinism, int64 safety."""

import pytest
from pyspark.sql import functions as F

from bathyscaphe_spark.operators.shuffleperm import (
    FEISTEL_MULT,
    epoch_shuffle,
    feistel_keys,
    feistel_pos,
    feistel_pos_py,
    feistel_pos_sql,
)


def test_full_domain_permutation_py():
    # k=4 → domain 256: the map must be a permutation of 0..255 for
    # several epochs (bijection by construction, verified exhaustively).
    for epoch in (0, 1, 7):
        keys = feistel_keys(epoch)
        out = [feistel_pos_py(v, keys, 4) for v in range(256)]
        assert sorted(out) == list(range(256))


def test_epochs_differ():
    k0, k1 = feistel_keys(0), feistel_keys(1)
    a = [feistel_pos_py(v, k0, 8) for v in range(4096)]
    b = [feistel_pos_py(v, k1, 8) for v in range(4096)]
    assert a != b
    # and the orders are substantially different, not a near-identity
    moved = sum(1 for x, y in zip(a, b) if x != y)
    assert moved > 4000


def test_int64_safety_at_max_half_bits():
    # largest operand: (2^23-1)*MULT + key — must stay well under 2^63
    keys = feistel_keys(3)
    mask = (1 << 23) - 1
    assert mask * FEISTEL_MULT + max(keys) < 2**63
    top = (1 << 46) - 1
    out = [feistel_pos_py(v, keys, 23) for v in (0, 1, top, top - 1)]
    assert all(0 <= p < (1 << 46) for p in out)
    assert len(set(out)) == 4


def test_half_bits_bounds(spark):
    with pytest.raises(ValueError):
        feistel_pos(F.col("x"), feistel_keys(0), 24)
    with pytest.raises(ValueError):
        feistel_pos_sql("x", feistel_keys(0), 1)


def test_spark_matches_python_mirror(spark):
    ids = [0, 1, 2, 255, 256, 65535, 65536, (1 << 32) - 1, 123456789]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    keys = feistel_keys(5)
    got = {
        r["id"]: r["pos"]
        for r in df.select(
            "id", feistel_pos(F.col("id"), keys, 16).alias("pos")
        ).collect()
    }
    assert got == {i: feistel_pos_py(i, keys, 16) for i in ids}


def test_sql_expr_matches_python_mirror():
    import duckdb

    keys = feistel_keys(9)
    expr = feistel_pos_sql("v", keys, 16)
    got = duckdb.sql(
        f"SELECT v, {expr} AS pos FROM (SELECT unnest(range(0, 2000)) AS v)"
    ).fetchall()
    assert dict(got) == {v: feistel_pos_py(v, keys, 16) for v in range(2000)}


def test_epoch_shuffle_shape_and_partition_invariance(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out1 = epoch_shuffle(df.repartition(1), "doc_id", [0, 1], 16, 8)
    out7 = epoch_shuffle(df.repartition(7), "doc_id", [0, 1], 16, 8)
    r1 = sorted(map(tuple, out1.collect()))
    r7 = sorted(map(tuple, out7.collect()))
    assert r1 == r7
    assert len(r1) == 1000
    # positions unique within an epoch (bijection), shard/seq consistent
    for e in (0, 1):
        rows = [r for r in r1 if r[1] == e]
        poss = [r[2] for r in rows]
        assert len(set(poss)) == 500
        for _, _, pos, shard, seq in rows:
            assert shard == pos % 8 and seq == pos // 8


def test_epoch_order_reshuffles(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = epoch_shuffle(df, "doc_id", [0, 1], 16, 8).collect()
    order = {
        e: [r["doc_id"] for r in sorted(out, key=lambda r: r["pos"]) if r["epoch"] == e]
        for e in (0, 1)
    }
    assert order[0] != order[1]
    assert sorted(order[0]) == sorted(order[1]) == list(range(300))
