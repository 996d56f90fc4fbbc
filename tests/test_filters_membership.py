"""Membership routers: sharded Bloom and cuckoo filter."""

import numpy as np
import pytest

from bathyscaphe_spark.operators.bloom import ShardedBloom, bloom_anti_join
from bathyscaphe_spark.operators.cuckoo import CuckooFilter, cuckoo_anti_join


def _hashes(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_bloom_no_false_negatives():
    import pandas as pd

    from pyspark.sql import SparkSession  # session via fixture below
    # pure-kernel check (no spark): every inserted key must probe true
    h = _hashes(10_000)
    bloom = ShardedBloom(bits_per_shard=1 << 14, num_shards=8, num_hashes=4,
                         packed=np.zeros(8 * (1 << 14) // 8, dtype=np.uint8))
    idx = ShardedBloom._positions(h, bloom.bits_per_shard, bloom.num_shards, bloom.num_hashes).ravel()
    np.bitwise_or.at(bloom.packed, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    assert bloom.might_contain_np(h).all()


def test_cuckoo_insert_probe_delete():
    cf = CuckooFilter(capacity=20_000)
    h = _hashes(10_000)
    assert cf.insert_many(h) == len(h)
    assert cf.might_contain_np(h).all()  # no false negatives
    # false-positive rate on fresh keys is small
    other = _hashes(10_000, seed=99)
    fpr = cf.might_contain_np(other).mean()
    assert fpr < 0.01, fpr
    # deletion: removed keys stop matching (modulo fp-sharing, rare)
    removed = cf.delete_many(h[:5_000])
    assert removed == 5_000
    still = cf.might_contain_np(h[:5_000]).mean()
    assert still < 0.01, still
    assert cf.might_contain_np(h[5_000:]).all()


def test_cuckoo_verified_build_grows_on_overflow():
    """A stale/low capacity hint must never produce false negatives —
    from_hashes rebuilds at doubled capacity instead of dropping inserts
    (ADVICE r1: silent drops broke the router's exactness contract)."""
    h = _hashes(20_000)
    cf = CuckooFilter.from_hashes(h, capacity=100)  # absurdly low hint
    assert cf.might_contain_np(h).all()


def test_sharded_cuckoo_kernel_1m():
    """Per-shard build parity at 1M hashes: no false negatives, small
    false-positive rate, shard-routed deletes work."""
    from bathyscaphe_spark.operators.cuckoo import ShardedCuckoo

    h = np.unique(_hashes(1_000_000))
    num_shards, shard_bits = 16, 4
    sid = (h.view(np.uint64) & np.uint64(num_shards - 1)).astype(np.int64)
    shards = [
        CuckooFilter.from_hashes(
            h[sid == s], len(h) // num_shards, bucket_shift=shard_bits
        )
        for s in range(num_shards)
    ]
    sc = ShardedCuckoo(shards, num_shards)
    assert sc.might_contain_np(h).all()
    other = np.setdiff1d(_hashes(200_000, seed=123), h)
    assert sc.might_contain_np(other).mean() < 0.01
    # delete the first 1000 — they stop matching (modulo fp-sharing)
    assert sc.delete_many(h[:1000]) == 1000
    assert sc.might_contain_np(h[:1000]).mean() < 0.01
    assert sc.might_contain_np(h[1000:]).all()


def test_sharded_cuckoo_distributed_build_matches_bloom_router(spark):
    """Distributed (executor-side) build: router output identical to the
    Bloom router and the plain anti-join on the same data."""
    from pyspark.sql import functions as F

    cand = spark.range(0, 20_000).select(
        F.xxhash64(F.col("id")).alias("url_hash"), F.col("id").alias("payload")
    )
    seen = spark.range(0, 20_000, 3).select(
        F.xxhash64(F.col("id")).alias("url_hash")
    )
    cf = CuckooFilter.build(seen, "url_hash", capacity=7000)
    bloom = ShardedBloom.build(seen, "url_hash", expected_items=7000)
    plain = sorted(r["payload"] for r in cand.join(seen, "url_hash", "left_anti").collect())
    via_cuckoo = sorted(r["payload"] for r in cuckoo_anti_join(cand, seen, "url_hash", cf).collect())
    via_bloom = sorted(r["payload"] for r in bloom_anti_join(cand, seen, "url_hash", bloom).collect())
    assert plain == via_cuckoo == via_bloom


def test_cuckoo_router_exactness(spark):
    """cuckoo_anti_join must equal the plain anti-join exactly."""
    from pyspark.sql import functions as F

    cand = spark.range(0, 3000).select(
        (F.col("id") * 2654435761 % 999999937).alias("url_hash"),
        F.col("id").alias("payload"),
    )
    seen = spark.range(0, 3000, 3).select(
        (F.col("id") * 2654435761 % 999999937).alias("url_hash")
    )
    cf = CuckooFilter.build(seen, "url_hash", capacity=2000)
    plain = sorted(r["payload"] for r in cand.join(seen, "url_hash", "left_anti").collect())
    routed = sorted(r["payload"] for r in cuckoo_anti_join(cand, seen, "url_hash", cf).collect())
    assert plain == routed


def test_bloom_router_exactness(spark):
    from pyspark.sql import functions as F

    cand = spark.range(0, 3000).select(
        (F.col("id") * 40503 % 999999937).alias("url_hash"),
        F.col("id").alias("payload"),
    )
    seen = spark.range(0, 3000, 2).select(
        (F.col("id") * 40503 % 999999937).alias("url_hash")
    )
    bloom = ShardedBloom.build(seen, "url_hash", expected_items=1500)
    plain = sorted(r["payload"] for r in cand.join(seen, "url_hash", "left_anti").collect())
    routed = sorted(r["payload"] for r in bloom_anti_join(cand, seen, "url_hash", bloom).collect())
    assert plain == routed


def test_bloom_or_delta_bit_identical_to_rebuild(spark):
    """Incremental fold contract: build(A) ∪Δ B must be bit-identical to
    a from-scratch build(A ∪ B) at the same (capacity-derived) params —
    this is what lets the driver fold each round's seen Δ instead of
    rescanning the whole seen table."""
    from pyspark.sql import functions as F

    a = spark.range(0, 4000).select((F.col("id") * 40503 % 999999937).alias("h"))
    b = spark.range(4000, 5500).select((F.col("id") * 40503 % 999999937).alias("h"))
    cap = 20_000
    full = ShardedBloom.build(a.unionByName(b), "h", expected_items=cap)
    inc = ShardedBloom.build(a, "h", expected_items=cap).or_delta(b, "h")
    assert (full.bits_per_shard, full.num_shards, full.num_hashes) == (
        inc.bits_per_shard, inc.num_shards, inc.num_hashes
    )
    assert np.array_equal(full.packed, inc.packed)


def test_bloom_or_delta_does_not_mutate_original(spark):
    from pyspark.sql import functions as F

    a = spark.range(0, 1000).select(F.col("id").alias("h"))
    b = spark.range(1000, 2000).select(F.col("id").alias("h"))
    base = ShardedBloom.build(a, "h", expected_items=8000)
    before = base.packed.copy()
    _ = base.or_delta(b, "h")
    assert np.array_equal(base.packed, before)


def test_bloom_shard_files_roundtrip_and_probe(spark, tmp_path):
    from bathyscaphe_spark.operators.bloom import (
        bloom_anti_join_files, load_shards, save_shards,
    )
    from pyspark.sql import functions as F

    seen = spark.range(0, 3000, 2).select(
        (F.col("id") * 40503 % 999999937).alias("url_hash")
    )
    bloom = ShardedBloom.build(seen, "url_hash", expected_items=1500)
    d = str(tmp_path / "shards")
    save_shards(bloom, d)
    back = load_shards(d)
    assert np.array_equal(back.packed, bloom.packed)
    assert (back.bits_per_shard, back.num_shards, back.num_hashes) == (
        bloom.bits_per_shard, bloom.num_shards, bloom.num_hashes
    )
    h = _hashes(5000)
    assert np.array_equal(back.might_contain_np(h), bloom.might_contain_np(h))

    cand = spark.range(0, 3000).select(
        (F.col("id") * 40503 % 999999937).alias("url_hash"),
        F.col("id").alias("payload"),
    )
    plain = sorted(r["payload"] for r in
                   cand.join(seen, "url_hash", "left_anti").collect())
    for colocate in (True, False):
        routed = sorted(
            r["payload"]
            for r in bloom_anti_join_files(
                cand, seen, "url_hash", d, colocate=colocate
            ).collect()
        )
        assert plain == routed, f"colocate={colocate}"


def test_bloom_shard_files_negative_hashes(spark, tmp_path):
    """Signed url_hash values (the FNV column is signed int64) must land
    in the same shard/bit positions through SQL pmod colocation and the
    numpy kernel."""
    from bathyscaphe_spark.operators.bloom import (
        bloom_anti_join_files, save_shards,
    )
    from pyspark.sql import functions as F

    import pandas as pd

    vals = np.concatenate([_hashes(2000), np.array([-1, -(2**63), 2**63 - 1, 0])])
    pdf = pd.DataFrame({"url_hash": vals, "payload": np.arange(vals.size)})
    cand = spark.createDataFrame(pdf)
    seen = cand.where("payload % 2 = 0").select("url_hash")
    bloom = ShardedBloom.build(seen, "url_hash", expected_items=2000)
    d = str(tmp_path / "shards")
    save_shards(bloom, d)
    plain = sorted(r["payload"] for r in
                   cand.join(seen, "url_hash", "left_anti").collect())
    routed = sorted(r["payload"] for r in
                    bloom_anti_join_files(cand, seen, "url_hash", d).collect())
    assert plain == routed


def test_persisted_bloom_resume_exact_and_skips_rescan(spark, tmp_path, monkeypatch):
    """bloom_persist: a resumed crawl loads the snapshot saved at the
    last capacity rebuild and folds only the later seen Δs — outputs
    identical to an uninterrupted crawl, and ShardedBloom.build (the
    O(|seen|) full-table rescan) is NOT called on resume while the
    capacity still fits."""
    import glob
    import os

    import pyarrow.parquet as pq

    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.operators.bloom import ShardedBloom
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.pipeline.synth import (
        build_host_status,
        build_pages,
        build_seeds,
    )

    pages = build_pages(spark, n_pages=4000, n_hosts=40).persist()
    hs = build_host_status(pages).persist()
    # slack high enough that rounds 2-3 stay under the capacity built
    # before round 0 (so the resume MUST come from the snapshot alone)
    cfg = CrawlConfig(
        per_host_budget=40, bloom_enabled=True, bloom_incremental=True,
        bloom_persist=True, bloom_capacity_slack=1000.0,
    )

    def frontier_rows(root, rnd):
        fs = sorted(glob.glob(f"{root}/tables/frontier/round={rnd}/*.parquet"))
        t = [r for f in fs for r in pq.read_table(f).to_pylist()]
        return sorted((r["url"], r["url_hash"], r["depth"]) for r in t)

    # uninterrupted 3-round reference
    ref_root = str(tmp_path / "ref")
    crawl(spark, pages, build_seeds(spark, pages, 15), ref_root, cfg,
          max_rounds=3, host_status=hs)

    # interrupted: 1 round, then resume for 2 more with build() forbidden
    res_root = str(tmp_path / "res")
    crawl(spark, pages, build_seeds(spark, pages, 15), res_root, cfg,
          max_rounds=1, host_status=hs)
    assert os.path.exists(os.path.join(res_root, "filters", "seen_bloom", "meta.json"))

    calls = {"n": 0}
    orig_build = ShardedBloom.build.__func__

    def counting_build(cls, *a, **kw):
        calls["n"] += 1
        return orig_build(cls, *a, **kw)

    monkeypatch.setattr(ShardedBloom, "build", classmethod(counting_build))
    crawl(spark, pages, None, res_root, cfg, max_rounds=3, host_status=hs)
    assert calls["n"] == 0, "resume rescanned the full seen table"
    for rnd in (1, 2, 3):
        assert frontier_rows(res_root, rnd) == frontier_rows(ref_root, rnd)

    # config drift (different fpp) invalidates the snapshot → rebuild
    drift = CrawlConfig(
        per_host_budget=40, bloom_enabled=True, bloom_incremental=True,
        bloom_persist=True, bloom_capacity_slack=1000.0, bloom_fpp=0.001,
    )
    crawl(spark, pages, None, res_root, drift, max_rounds=4, host_status=hs)
    assert calls["n"] == 1
    pages.unpersist()
    hs.unpersist()


def test_collect_delete_delta_enforces_cap(spark):
    from bathyscaphe_spark.operators.cuckoo import collect_delete_delta

    df = spark.range(100).selectExpr("id AS url_hash")
    got = collect_delete_delta(df, "url_hash", cap=100)
    assert sorted(got.tolist()) == list(range(100))
    with pytest.raises(ValueError, match="driver-patch bound"):
        collect_delete_delta(df, "url_hash", cap=99)


def test_collect_delete_delta_enforces_distinct(spark):
    # the distinct is applied INSIDE the helper: a caller passing a
    # non-distinct frame must neither spuriously trip the Δ cap nor
    # ship duplicate hashes to delete_many (double-deleting another
    # item's identical fingerprint)
    from bathyscaphe_spark.operators.cuckoo import collect_delete_delta

    dup = spark.range(100).selectExpr("id % 10 AS url_hash")  # 10 distinct
    got = collect_delete_delta(dup, "url_hash", cap=10)  # cap < 100 raw rows
    assert sorted(got.tolist()) == list(range(10))
