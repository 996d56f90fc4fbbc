"""State compaction + stateful streaming dedup."""

import shutil

from pyspark.sql import functions as F

from bathyscaphe_spark.state.tables import TableCatalog


def test_compact_deltas(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "s"))
    for r in range(4):
        df = spark.range(r * 10, r * 10 + 10).select(
            F.col("id").alias("url_hash"),
            F.lit(r).alias("first_seen_round"),
            F.lit(None).cast("timestamp").alias("expires_ts"),
        )
        cat.stage_round("seen", df, r)
        cat.commit_round(r, ["seen"])
    before = sorted(r["url_hash"] for r in cat.read_deltas("seen").collect())
    folded = cat.compact_deltas("seen")
    assert folded == 4
    after = sorted(r["url_hash"] for r in cat.read_deltas("seen").collect())
    assert before == after
    # only one physical round dir remains and it is the max round
    assert cat._committed_rounds("seen", None) == [3]
    # idempotent: nothing left to fold
    assert cat.compact_deltas("seen") == 0


def test_compact_with_agg(spark, tmp_path):
    """Consolidation agg: duplicate hashes collapse keeping min round."""
    cat = TableCatalog(spark, str(tmp_path / "s"))
    for r in range(2):
        df = spark.range(0, 10).select(  # same hashes both rounds
            F.col("id").alias("url_hash"),
            F.lit(r).alias("first_seen_round"),
            F.lit(None).cast("timestamp").alias("expires_ts"),
        )
        cat.stage_round("seen", df, r)
        cat.commit_round(r, ["seen"])

    def agg(df):
        return df.groupBy("url_hash").agg(
            F.min("first_seen_round").alias("first_seen_round"),
            F.max("expires_ts").alias("expires_ts"),
        )

    cat.compact_deltas("seen", agg_fn=agg)
    out = cat.read_deltas("seen")
    assert out.count() == 10
    assert out.where("first_seen_round != 0").count() == 0


def test_crawl_after_compaction(spark, tmp_path):
    """Compacting seen mid-crawl must not change subsequent rounds."""
    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.pipeline.synth import build_pages, build_seeds

    pages = build_pages(spark, 800, n_hosts=20, links_per_page=4).persist()
    seeds = build_seeds(spark, pages, 6)
    cfg = CrawlConfig(bloom_enabled=False)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    crawl(spark, pages, seeds, a, cfg, max_rounds=3)
    crawl(spark, pages, seeds, b, cfg, max_rounds=2)
    TableCatalog(spark, b).compact_deltas("seen")
    crawl(spark, pages, None, b, cfg, max_rounds=3)
    sa = sorted(r["url_hash"] for r in TableCatalog(spark, a).read_deltas("seen").collect())
    sb = sorted(r["url_hash"] for r in TableCatalog(spark, b).read_deltas("seen").collect())
    assert sa == sb
    pages.unpersist()


class _FakeState:
    """Minimal GroupState stand-in for kernel-level tests."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _run_batch(kernel, state, urls, hashes):
    import pandas as pd

    (out,) = list(
        kernel((0,), [pd.DataFrame({"url": urls, "url_hash": hashes})], state)
    )
    return sorted(out["url_hash"].tolist())


def test_dedup_shard_binary_state_chunks():
    """r2 state layout: one sorted binary chunk appended per batch,
    LSM-compacted past the chunk cap — never a CSV re-serialization."""
    import numpy as np

    from bathyscaphe_spark.streaming.stateful import make_dedup_shard

    kernel = make_dedup_shard(compact_chunks=3)
    st = _FakeState()
    # batch 1: 0..99 novel; internal dup of 5 dropped
    got = _run_batch(kernel, st, [f"u{i}" for i in range(100)] + ["u5"],
                     list(range(100)) + [5])
    assert got == list(range(100))
    chunks, n = st.get
    assert n == 100 and len(chunks) == 1
    assert np.frombuffer(chunks[0], dtype="<i8").tolist() == list(range(100))
    # batch 2: half replays, half novel → one MORE chunk, replays dropped
    got = _run_batch(kernel, st, [f"u{i}" for i in range(50, 150)],
                     list(range(50, 150)))
    assert got == list(range(100, 150))
    chunks, n = st.get
    assert n == 150 and len(chunks) == 2
    # two more batches exceed compact_chunks=3 → rolled into one run
    _run_batch(kernel, st, ["a"], [1000])
    _run_batch(kernel, st, ["b"], [2000])
    chunks, n = st.get
    assert n == 152 and len(chunks) == 1
    run = np.frombuffer(chunks[0], dtype="<i8")
    assert run.size == 152 and (np.diff(run) > 0).all()


def test_dedup_shard_eviction_hook():
    """max_state_hashes drops the OLDEST chunks: evicted hashes become
    re-emittable (the online analogue of D3 refresh-delay expiry)."""
    from bathyscaphe_spark.streaming.stateful import make_dedup_shard

    kernel = make_dedup_shard(compact_chunks=100, max_state_hashes=150)
    st = _FakeState()
    _run_batch(kernel, st, [f"a{i}" for i in range(100)], list(range(100)))
    _run_batch(kernel, st, [f"b{i}" for i in range(100)],
               list(range(100, 200)))
    chunks, n = st.get
    assert n == 100  # oldest chunk evicted to respect the bound
    # evicted hash 5 is seen again → re-emitted (expired, like D3)
    got = _run_batch(kernel, st, ["a5", "b5"], [5, 105])
    assert got == [5]


def test_streaming_seen_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: duplicates across micro-batches are
    dropped; first occurrence survives."""
    from bathyscaphe_spark.streaming.stateful import streaming_seen_dedup

    src = str(tmp_path / "src")
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [("u1", 1), ("u2", 2), ("u1", 1)], "url string, url_hash long"
    ).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(
        [("u2", 2), ("u3", 3)], "url string, url_hash long"
    ).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema("url string, url_hash long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        streaming_seen_dedup(stream, n_shards=4)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["url"], r["url_hash"]) for r in spark.sql("select * from dedup_out").collect()}
    assert rows == {("u1", 1), ("u2", 2), ("u3", 3)}


def test_stream_to_universe_feeds_crawl(spark, tmp_path):
    """Structured Streaming front door: page arrivals land in the
    universe dir exactly once (checkpointed epochs), and a crawl round
    fetches out of the streamed universe.  Re-running the stream with
    the same checkpoint appends nothing new."""
    import glob
    import os
    from datetime import datetime, timezone

    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.streaming.ingest import stream_to_universe

    ts = datetime(2024, 5, 1, tzinfo=timezone.utc).replace(tzinfo=None)
    hdr = {"Content-Type": "text/html"}
    rows = [
        ("https://s.onion", "s.onion", ts,
         "to https://a.onion and https://b.onion".encode(), hdr, 200),
        ("https://a.onion", "a.onion", ts, b"alpha", hdr, 200),
        ("https://b.onion", "b.onion", ts, b"beta", hdr, 200),
    ]
    schema = ("url string, host string, warc_ts timestamp, html binary,"
              " headers map<string,string>, status int")
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    part = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0]
    os.rename(part, os.path.join(src, "batch-0.parquet"))

    uni = str(tmp_path / "universe")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).parquet(src)
    stream_to_universe(stream, uni, ckpt).start().awaitTermination()
    n1 = spark.read.parquet(uni).count()
    assert n1 == 3

    # exactly-once: same checkpoint, no new files -> no duplicate append
    stream2 = spark.readStream.schema(schema).parquet(src)
    stream_to_universe(stream2, uni, ckpt).start().awaitTermination()
    assert spark.read.parquet(uni).count() == n1

    # the streamed universe is crawlable
    pages = spark.read.parquet(uni)
    seeds = spark.createDataFrame([("https://s.onion", "s.onion")],
                                  "url string, host string")
    stats = crawl(spark, pages, seeds, str(tmp_path / "state"),
                  CrawlConfig(bloom_enabled=False), max_rounds=2)
    assert stats[0].fetched == 1          # the seed
    assert stats[1].fetched == 2          # a + b discovered from it


# --- streaming per-host token bucket ------------------------------------------


def _rl_batch(kernel, state, rows):
    import pandas as pd

    (out,) = list(
        kernel(
            ("h0",),
            [pd.DataFrame(rows, columns=["batch", "url_hash", "priority"])],
            state,
        )
    )
    return list(zip(out["url_hash"].tolist(), out["admitted"].tolist()))


def test_rate_limit_full_bucket_start_and_priority_order():
    from bathyscaphe_spark.streaming.stateful import make_rate_limit_shard

    k = make_rate_limit_shard(rate=2, burst=3)
    st = _FakeState()
    # 5 requests in epoch 0: burst=3 admits the 3 best by (prio DESC, hash)
    rows = [(0, 10, 1), (0, 11, 9), (0, 12, 5), (0, 13, 9), (0, 14, 5)]
    out = dict(_rl_batch(k, st, rows))
    assert out == {11: 1, 13: 1, 12: 1, 14: 0, 10: 0}
    assert st.get == (0, 0)  # bucket drained, last epoch 0


def test_rate_limit_refill_clamp_across_skipped_epochs():
    from bathyscaphe_spark.streaming.stateful import make_rate_limit_shard

    k = make_rate_limit_shard(rate=2, burst=3)
    st = _FakeState()
    _rl_batch(k, st, [(0, i, 0) for i in range(5)])  # drain at epoch 0
    # epoch 4 after 4 idle epochs: refill 2*4=8 clamps at burst=3
    out = dict(_rl_batch(k, st, [(4, i, 0) for i in range(10, 16)]))
    assert sum(out.values()) == 3
    assert st.get == (0, 4)


def test_rate_limit_multi_epoch_single_slice():
    # engine may hand several epochs in ONE call — replay must match
    # epoch-by-epoch delivery exactly
    from bathyscaphe_spark.streaming.stateful import make_rate_limit_shard

    rows0 = [(0, i, 0) for i in range(4)]
    rows1 = [(1, 100 + i, 0) for i in range(4)]
    k1 = make_rate_limit_shard(rate=1, burst=2)
    st1 = _FakeState()
    merged = dict(_rl_batch(k1, st1, rows0 + rows1))
    k2 = make_rate_limit_shard(rate=1, burst=2)
    st2 = _FakeState()
    split = dict(_rl_batch(k2, st2, rows0))
    split.update(dict(_rl_batch(k2, st2, rows1)))
    assert merged == split
    assert st1.get == st2.get


def test_rate_limit_stream_e2e_against_python_model(spark, tmp_path):
    import glob
    import os
    import shutil

    from bathyscaphe_spark.streaming.stateful import streaming_rate_limit

    rows = [
        ("h%d" % (i % 3), (i // 9) % 3, i * 37 % 1000, i % 5)
        for i in range(90)
        if i % 7 != 0
    ]
    df = spark.createDataFrame(
        rows, "host string, batch long, url_hash long, priority long"
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for b in range(3):
        stage = str(tmp_path / f"stage{b}")
        df.where(F.col("batch") == b).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"b{b}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1714564800 + b, 1714564800 + b))
    stream = (
        spark.readStream.schema(
            "host string, batch long, url_hash long, priority long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming_rate_limit(stream, rate=1, burst=2)
        .writeStream.format("memory")
        .queryName("rl_e2e")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["host"], r["batch"], r["url_hash"]): r["admitted"]
        for r in spark.table("rl_e2e").collect()
    }
    # python reference model
    want = {}
    tokens = {}
    for b in range(3):
        epoch = sorted(
            (r for r in rows if r[1] == b),
            key=lambda r: (r[0], -r[3], r[2]),
        )
        by_host = {}
        for r in epoch:
            by_host.setdefault(r[0], []).append(r)
        for h, rs in by_host.items():
            t = tokens.get(h)
            t = 2 if t is None else min(2, t + 1)
            for i, r in enumerate(rs):
                want[(h, b, r[2])] = 1 if i < t else 0
            tokens[h] = max(0, t - len(rs))
    assert got == want
