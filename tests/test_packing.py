"""Greedy sequence packing (operators/packing.py)."""

from pyspark.sql import functions as F

from bathyscaphe_spark.operators.packing import chunk_stats, pack_sequences


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")


def _pack_reference(rows, capacity):
    """Pure-python greedy first-fit mirror."""
    out = {}
    by_group = {}
    for g, i, t in rows:
        by_group.setdefault(g, []).append((i, max(t or 0, 0)))
    for g, docs in by_group.items():
        cid, fill = 0, 0
        for j, (i, t) in enumerate(sorted(docs)):
            if j > 0 and fill + t > capacity:
                cid, fill = cid + 1, 0
            fill += t
            out[(g, i)] = cid
    return out


def test_greedy_first_fit_semantics(spark):
    rows = [
        ("a", 1, 100), ("a", 2, 100), ("a", 3, 100),  # 1+2 fit, 3 spills
        ("a", 4, 300),                                 # oversized: alone
        ("a", 5, 10),
        ("b", 1, 256), ("b", 2, 1),                    # exact fit closes at 2
    ]
    got = {
        (r.source, r.doc_id): r.chunk_id
        for r in pack_sequences(_df(spark, rows), "source", "doc_id", "n_tokens", 256).collect()
    }
    assert got == _pack_reference(rows, 256)
    assert got[("a", 1)] == got[("a", 2)] == 0
    assert got[("a", 3)] == 1
    assert got[("a", 4)] == 2          # 300 > 256: own chunk
    assert got[("a", 5)] == 3          # fill after oversize doc is 300
    assert got[("b", 1)] == 0 and got[("b", 2)] == 1


def test_packing_random_vs_reference_and_partitioning(spark):
    import random

    rng = random.Random(11)
    rows = [
        (f"g{i % 5}", i, rng.randrange(0, 120)) for i in range(400)
    ]
    df = _df(spark, rows)
    a = {
        (r.source, r.doc_id): r.chunk_id
        for r in pack_sequences(df, "source", "doc_id", "n_tokens", 200).collect()
    }
    b = {
        (r.source, r.doc_id): r.chunk_id
        for r in pack_sequences(df.repartition(13), "source", "doc_id", "n_tokens", 200).collect()
    }
    assert a == b == _pack_reference(rows, 200)


def test_chunk_stats_fill_never_exceeds_capacity(spark):
    rows = [("a", i, 37 + (i * 13) % 90) for i in range(100)]
    packed = pack_sequences(_df(spark, rows), "source", "doc_id", "n_tokens", 256)
    stats = chunk_stats(packed, "source", "n_tokens").collect()[0]
    assert stats.n_docs == 100
    assert stats.max_fill <= 256
    assert stats.total_tokens == sum(r[2] for r in rows)


def test_null_tokens_pack_as_zero(spark):
    rows = [("a", 1, None), ("a", 2, 256)]
    got = {
        r.doc_id: (r.chunk_id, r.n_tokens)
        for r in pack_sequences(_df(spark, rows), "source", "doc_id", "n_tokens", 256).collect()
    }
    assert got == {1: (0, 0), 2: (0, 256)}


class TestShardBalance:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, n_tokens long")

    def test_serpentine_deal_on_equal_buckets(self, spark):
        """With n_buckets == n_docs and distinct token sizes, ranks are
        the docs themselves: zigzag must put the two heaviest on
        opposite ends and pair heaviest with lightest."""
        from bathyscaphe_spark.operators.packing import shard_balance

        # find 4 doc ids in distinct buckets (md5 % 4aren't guaranteed
        # distinct, so probe)
        import hashlib

        def bkt(i, m):
            return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % m

        ids, seen = [], set()
        i = 0
        while len(ids) < 4:
            if bkt(i, 64) not in seen:
                seen.add(bkt(i, 64))
                ids.append(i)
            i += 1
        rows = [(ids[j], 100 - j * 10) for j in range(4)]  # 100,90,80,70
        out = shard_balance(
            self._df(spark, rows), "doc_id", "n_tokens", n_shards=2,
            n_buckets=64,
        ).collect()
        shards = {r["doc_id"]: r["shard"] for r in out}
        # serpentine over ranks 0..3 with k=2: shards 0,1,1,0
        assert shards[ids[0]] == 0 and shards[ids[3]] == 0
        assert shards[ids[1]] == 1 and shards[ids[2]] == 1

    def test_token_totals_balanced(self, spark):
        from bathyscaphe_spark.operators.packing import shard_balance

        rows = [(i, (i * 37) % 400 + 50) for i in range(2000)]
        out = shard_balance(
            self._df(spark, rows), "doc_id", "n_tokens", n_shards=8,
            n_buckets=256,
        )
        totals = [
            r["t"]
            for r in out.groupBy("shard")
            .agg(F.sum("n_tokens").alias("t"))
            .collect()
        ]
        assert len(totals) == 8
        assert (max(totals) - min(totals)) / max(totals) < 0.05

    def test_every_doc_assigned_once(self, spark):
        from bathyscaphe_spark.operators.packing import shard_balance

        rows = [(i, i % 7 + 1) for i in range(500)]
        out = shard_balance(
            self._df(spark, rows), "doc_id", "n_tokens", n_shards=4
        )
        assert out.count() == 500
        assert out.select("doc_id").distinct().count() == 500

    def test_partition_invariance(self, spark):
        from bathyscaphe_spark.operators.packing import shard_balance

        rows = [(i, (i * 13) % 90 + 10) for i in range(300)]
        df = self._df(spark, rows)
        a = sorted(map(tuple, shard_balance(df.repartition(1), "doc_id", "n_tokens", 4, 32).collect()))
        b = sorted(map(tuple, shard_balance(df.repartition(7), "doc_id", "n_tokens", 4, 32).collect()))
        assert a == b


class TestChunkDocuments:
    """Sliding-window long-doc splitting (chunk_documents)."""

    @staticmethod
    def _mirror(text, size, stride):
        toks = [w for w in (text or "").split() if w]
        n = len(toks)
        if n == 0:
            return []
        k_last = 0 if n <= size else -(-(n - size) // stride)
        return [
            (k, k * stride, toks[k * stride : k * stride + size])
            for k in range(k_last + 1)
        ]

    def _run(self, spark, rows, size, stride, parts=3):
        from bathyscaphe_spark.operators.packing import chunk_documents

        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = chunk_documents(
            df.repartition(parts), size=size, stride=stride
        ).collect()
        return {
            (r.doc_id, r.chunk_idx): (r.start, r.n_tokens, r.chunk_text)
            for r in out
        }

    def test_mirror_and_edges(self, spark):
        rows = [
            (1, " ".join(f"w{i}" for i in range(10))),  # multi-window
            (2, "a b"),            # shorter than size → one window
            (3, ""),               # empty → no rows
            (4, None),             # null → no rows
            (5, " ".join(f"t{i}" for i in range(4))),   # n == size exactly
            (6, " ".join(f"u{i}" for i in range(5))),   # n == size+1
            (7, "  x   y\tz\n"),   # whitespace runs collapse
        ]
        got = self._run(spark, rows, size=4, stride=3)
        want = {}
        for did, text in rows:
            for k, start, toks in self._mirror(text, 4, 3):
                want[(did, k)] = (start, len(toks), " ".join(toks))
        assert got == want
        assert (5, 0) in got and (5, 1) not in got
        # n = size+1: second window starts at stride and reaches the end
        assert got[(6, 1)] == (3, 2, "u3 u4")

    def test_last_window_reaches_end_and_none_contained(self, spark):
        got = self._run(
            spark, [(1, " ".join(str(i) for i in range(100)))], 16, 7
        )
        ks = sorted(k for (_, k) in got)
        assert ks == list(range(len(ks)))
        last_start, last_n, _ = got[(1, ks[-1])]
        assert last_start + last_n == 100      # covers the tail
        assert last_start < 100                # starts inside the doc
        # the PREVIOUS window must not already reach the end
        prev_start, prev_n, _ = got[(1, ks[-2])]
        assert prev_start + 16 < 100

    def test_partition_invariance(self, spark):
        rows = [(i, " ".join(f"w{i}_{j}" for j in range(i % 37))) for i in range(60)]
        a = self._run(spark, rows, 8, 5, parts=1)
        b = self._run(spark, rows, 8, 5, parts=13)
        assert a == b

    def test_stride_validation(self, spark):
        import pytest

        from bathyscaphe_spark.operators.packing import chunk_documents

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, size=4, stride=5)
        with pytest.raises(ValueError):
            chunk_documents(df, size=4, stride=0)
