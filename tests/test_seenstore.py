"""Bucket-compacted seen store (state/seenstore.py) — parity with the
plain anti-join plus the plan shape the design claims: the seen side of
the exact D1 verification must never exchange."""

import glob

import pytest
from pyspark.sql import functions as F

from bathyscaphe_spark.state.seenstore import BucketedSeenStore


@pytest.fixture()
def store(spark, tmp_path):
    s = BucketedSeenStore(
        spark, str(tmp_path / "seen_bucketed"), name="t_seen_bucketed",
        num_buckets=8,
    )
    yield s
    s.drop()


def _seen(spark, n=20000):
    return spark.range(0, n).select(
        (F.col("id") * 2654435761 % 100003).alias("url_hash"),
        F.when(F.col("id") % 5 == 0, F.lit("2020-01-01").cast("timestamp"))
        .alias("expires_ts"),
        F.lit(0).cast("long").alias("first_seen_round"),
    )


def _cand(spark, n=3000):
    return spark.range(0, n).select(
        (F.col("id") * 7 % 200003).alias("url_hash")
    )


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_parity_with_plain_antijoin(spark, store):
    seen, cand = _seen(spark), _cand(spark)
    store.compact(seen)
    got = sorted(r.url_hash for r in store.anti_join(cand).collect())
    want = sorted(
        r.url_hash
        for r in cand.join(seen.select("url_hash"), "url_hash", "left_anti")
        .collect()
    )
    assert got == want and len(got) > 0


def test_seen_side_never_exchanges(spark, store):
    store.compact(_seen(spark))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _final_plan(store.anti_join(_cand(spark)))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # exactly ONE exchange — the candidate side, hashed into the bucket
    # count; the seen scan reports Bucketed and is exchange-free
    assert plan.count("Exchange") == 1
    assert "Bucketed: true" in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_one_file_per_bucket(spark, store):
    store.compact(_seen(spark))
    assert len(glob.glob(f"{store.path}/part-*")) == store.num_buckets


def test_reattach_fresh_catalog(spark, store):
    seen, cand = _seen(spark), _cand(spark)
    store.compact(seen)
    want = store.anti_join(cand).count()
    store.drop()  # catalog entry gone, files remain
    assert not store.exists()
    store.attach()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = store.anti_join(cand)
        plan = _final_plan(out)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert out.count() == want
    assert plan.count("Exchange") == 1 and "Bucketed: true" in plan


def test_ttl_filter_preserves_bucketing(spark, store):
    store.compact(_seen(spark))
    live = store.df().where(F.col("expires_ts").isNull()).select("url_hash")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _final_plan(
            _cand(spark).join(live, "url_hash", "left_anti")
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert plan.count("Exchange") == 1


def test_delta_tail_composes(spark, store):
    seen, cand = _seen(spark), _cand(spark)
    base = seen.where(F.col("url_hash") % 3 != 0)
    tail = seen.where(F.col("url_hash") % 3 == 0)
    store.compact(base)
    got = sorted(
        r.url_hash
        for r in store.anti_join(cand, tail=tail).collect()
    )
    want = sorted(
        r.url_hash
        for r in cand.join(seen.select("url_hash"), "url_hash", "left_anti")
        .collect()
    )
    assert got == want


# --- crawl-loop integration ---------------------------------------------------


def _crawl_state(spark, root):
    from bathyscaphe_spark.state.tables import TableCatalog

    cat = TableCatalog(spark, root)
    out = {}
    r = 0
    while True:
        df = cat.read_round("frontier", r)
        if df is None:
            break
        out[("frontier", r)] = sorted(
            (row["url"], row["depth"]) for row in df.collect()
        )
        r += 1
    seen = cat.read_deltas("seen")
    out["seen"] = sorted(row["url_hash"] for row in seen.collect())
    return out


def test_bucketed_crawl_equals_plain(spark, tmp_path):
    """4 rounds with per-round bucket compaction commit the exact same
    frontier/seen state as the plain delta-union path — with the bloom
    router on (the driver default), so the tail composes with it too."""
    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.pipeline.synth import build_pages, build_seeds

    pages = build_pages(spark, n_pages=400, n_hosts=12, links_per_page=4)
    pages = pages.persist()
    seeds = build_seeds(spark, pages, 5)
    base = dict(per_host_budget=25)
    a, b = str(tmp_path / "plain"), str(tmp_path / "bucketed")
    crawl(spark, pages, seeds, a, CrawlConfig(**base), max_rounds=4)
    crawl(
        spark, pages, seeds, b,
        CrawlConfig(seen_bucketed=True, seen_bucket_every=1, seen_buckets=4,
                    **base),
        max_rounds=4,
    )
    assert _crawl_state(spark, a) == _crawl_state(spark, b)
    pages.unpersist()


def test_bucketed_resume_attaches_store(spark, tmp_path):
    """Resume after an interruption re-attaches the compacted store
    (metadata-only) and finishes with state identical to uninterrupted."""
    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.pipeline.synth import build_pages, build_seeds

    pages = build_pages(spark, n_pages=400, n_hosts=12, links_per_page=4)
    pages = pages.persist()
    seeds = build_seeds(spark, pages, 5)
    cfg = CrawlConfig(
        seen_bucketed=True, seen_bucket_every=2, seen_buckets=4,
        per_host_budget=25,
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    crawl(spark, pages, seeds, a, cfg, max_rounds=4)
    crawl(spark, pages, seeds, b, cfg, max_rounds=2)  # store compacted @ r1
    # drop the catalog entry to prove attach() re-registers from files
    from bathyscaphe_spark.pipeline.driver import _load_seen_store
    from bathyscaphe_spark.state.tables import TableCatalog

    store, rnd = _load_seen_store(TableCatalog(spark, b), cfg)
    assert store is not None and rnd == 1
    store.drop()
    crawl(spark, pages, None, b, cfg, max_rounds=4)  # resume
    assert _crawl_state(spark, a) == _crawl_state(spark, b)
    pages.unpersist()
