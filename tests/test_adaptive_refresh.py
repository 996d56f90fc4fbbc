"""Adaptive per-URL refresh TTLs + the recrawl pump (pipeline/round.py,
operators/recrawl.py adaptive_seen_delta).

Drives run_round directly with a DIFFERENT pages universe per round so
page A's content churns every fetch while page B stays byte-stable:
A's revisit interval must halve to the floor, B's must double to the
cap, and the pump must refetch each exactly when its TTL lapses.
"""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from bathyscaphe_spark.config import CrawlConfig
from bathyscaphe_spark.pipeline.driver import bootstrap
from bathyscaphe_spark.pipeline.round import run_round
from bathyscaphe_spark.pipeline.synth import build_host_status
from bathyscaphe_spark.state.tables import TableCatalog

# normalized form (no trailing slash) — universe urls must match the
# scheduler's purell-normalized output for the fetch join to hit
S, A, B = "https://s.onion", "https://a.onion", "https://b.onion"


def _pages(spark, salt):
    ts = datetime(2024, 5, 1, tzinfo=timezone.utc).replace(tzinfo=None)
    hdr = {"Content-Type": "text/html"}
    rows = [
        (S, "s.onion", ts, f"links: {A} and {B}".encode(), hdr, 200),
        (A, "a.onion", ts, f"churning r{salt} back {S}".encode(), hdr, 200),
        (B, "b.onion", ts, f"stable body back {S}".encode(), hdr, 200),
    ]
    return spark.createDataFrame(
        rows,
        "url string, host string, warc_ts timestamp, html binary,"
        " headers map<string,string>, status int",
    )


def _seeds(spark):
    return spark.createDataFrame([(S, "s.onion")], "url string, host string")


def test_adaptive_ttls_and_pump_cadence(spark, tmp_path):
    cfg = CrawlConfig(
        refresh_delay_s=3600,        # base TTL = one round interval
        adaptive_refresh=True,
        refresh_min_s=900,
        refresh_max_s=14400,
        recrawl_budget=10,
        bloom_enabled=False,
    )
    cat = TableCatalog(spark, str(tmp_path / "state"))
    bootstrap(cat, _seeds(spark), cfg)
    host_status = build_host_status(_pages(spark, 0))
    for n in range(6):
        run_round(cat, _pages(spark, n), host_status, cfg, n)

    meta = cat.read_deltas("fetch_meta")
    fetched = {}
    for r in meta.select("url", "round").collect():
        fetched.setdefault(r["url"], []).append(r["round"])
    fetched = {u: sorted(v) for u, v in fetched.items()}
    # A churns: interval halves to the 900s floor -> refetched every round
    # B stable: interval doubles 3600 -> 7200 -> 14400 (due again at r8)
    assert fetched[S] == [0]
    assert fetched[A] == [1, 2, 3, 4, 5]
    assert fetched[B] == [1, 2, 4]

    seen = cat.read_deltas("seen")
    ttls = {}
    for r in seen.where(F.col("ttl_s").isNotNull()).collect():
        ttls.setdefault(r["url_hash"], []).append(
            (r["first_seen_round"], r["ttl_s"])
        )
    by_url = {
        r["url"]: r["url_hash"]
        for r in meta.select("url", "url_hash").distinct().collect()
    }
    assert sorted(ttls[by_url[A]]) == [
        (0, 3600),  # discovery
        (1, 3600),  # first fetch: one observation, nothing to adapt
        (2, 1800),  # change observed -> halve
        (3, 900),   # halve again
        (4, 900),   # floor
        (5, 900),
    ]
    assert sorted(ttls[by_url[B]]) == [
        (0, 3600),
        (1, 3600),
        (2, 7200),   # stable -> double
        (4, 14400),  # stable -> cap
    ]


def test_default_path_untouched(spark, tmp_path):
    """Feature off: no fetch_meta table, seen schema has no ttl_s."""
    cfg = CrawlConfig(refresh_delay_s=3600, bloom_enabled=False)
    cat = TableCatalog(spark, str(tmp_path / "state"))
    bootstrap(cat, _seeds(spark), cfg)
    host_status = build_host_status(_pages(spark, 0))
    for n in range(2):
        run_round(cat, _pages(spark, n), host_status, cfg, n)
    assert cat.read_deltas("fetch_meta") is None
    assert "ttl_s" not in cat.read_deltas("seen").columns


def test_fetch_meta_compaction_preserves_adaptation(spark, tmp_path):
    """Compacting fetch_meta to the last two fetches per URL mid-crawl
    changes neither the TTL schedule nor the pump cadence."""
    from bathyscaphe_spark.operators.recrawl import compact_fetch_meta

    cfg = CrawlConfig(
        refresh_delay_s=3600, adaptive_refresh=True, refresh_min_s=900,
        refresh_max_s=14400, recrawl_budget=10, bloom_enabled=False,
    )
    ttls = {}
    for tag, compact_at in (("ctl", None), ("cmp", 4)):
        cat = TableCatalog(spark, str(tmp_path / tag))
        bootstrap(cat, _seeds(spark), cfg)
        host_status = build_host_status(_pages(spark, 0))
        for n in range(6):
            if n == compact_at:
                folded = cat.compact_deltas("fetch_meta", compact_fetch_meta)
                assert folded >= 2
            run_round(cat, _pages(spark, n), host_status, cfg, n)
        ttls[tag] = sorted(
            (r["url_hash"], r["first_seen_round"], r["ttl_s"])
            for r in cat.read_deltas("seen").where(
                F.col("ttl_s").isNotNull()
            ).collect()
        )
        if compact_at is not None:
            # compacted history holds at most 2 rows per url
            per = (
                cat.read_deltas("fetch_meta")
                .groupBy("url_hash").count().collect()
            )
            # rounds after compaction may add up to 2 more deltas
            assert max(r["count"] for r in per) <= 4
    assert ttls["ctl"] == ttls["cmp"]


def test_adaptive_composes_with_link_rank_and_budget(spark, tmp_path):
    """Pump rows flow through the link-rank boost and the global fetch
    cap like any frontier row (_base_priority restore included) — the
    TTL adaptation still lands."""
    cfg = CrawlConfig(
        refresh_delay_s=3600, adaptive_refresh=True, refresh_min_s=900,
        refresh_max_s=14400, recrawl_budget=10, bloom_enabled=False,
        link_rank_enabled=True, round_fetch_budget=5,
    )
    cat = TableCatalog(spark, str(tmp_path / "state"))
    bootstrap(cat, _seeds(spark), cfg)
    host_status = build_host_status(_pages(spark, 0))
    for n in range(5):
        run_round(cat, _pages(spark, n), host_status, cfg, n)
    meta = cat.read_deltas("fetch_meta")
    fetched = {}
    for r in meta.select("url", "round").collect():
        fetched.setdefault(r["url"], []).append(r["round"])
    # the pump refetched both pages at least once under the cap
    assert len(fetched.get(A, [])) >= 2
    assert len(fetched.get(B, [])) >= 2
    ttls = {
        r["ttl_s"]
        for r in cat.read_deltas("seen").where(F.col("ttl_s").isNotNull()).collect()
    }
    assert 1800 in ttls or 900 in ttls   # A halved at least once
    assert 7200 in ttls                   # B doubled at least once


def test_adaptive_ttl_random_histories(spark):
    """300 random (meta, seen, target) fixtures vs a python mirror of
    the TTL policy — clamps, null prev-ttl, missing history, single
    fetch, churn/stable branches all land exactly."""
    import random

    from bathyscaphe_spark.operators.recrawl import adaptive_seen_delta

    rng = random.Random(7)
    BASE, MIN, MAX, NOW, RN = 3600, 900, 14400, 1_000_000, 5
    meta_rows, seen_rows, targets = [], [], []
    expect = {}
    for u in range(300):
        fetches = sorted(rng.sample(range(10), rng.randrange(0, 5)))
        fnvs = [rng.randrange(3) for _ in fetches]
        for r, v in zip(fetches, fnvs):
            meta_rows.append((u, r, v))
        seen_n = rng.randrange(0, 4)
        ttls = [rng.choice([None, 600, 1800, 7200, 14000]) for _ in range(seen_n)]
        for i, t in enumerate(ttls):
            seen_rows.append((u, i, None, t))
        if rng.random() < 0.7:
            targets.append((u,))
            prev_ttl = ttls[-1] if ttls else None  # latest first_seen_round
            p = prev_ttl if prev_ttl is not None else BASE
            if len(fetches) < 2:
                ttl = BASE
            elif fnvs[-1] == fnvs[-2]:
                ttl = min(p * 2, MAX)
            else:
                ttl = max(p // 2, MIN)  # p positive: trunc == floor
            expect[u] = ttl
    meta = spark.createDataFrame(
        meta_rows, "url_hash long, round long, content_fnv long"
    )
    seen = spark.createDataFrame(
        seen_rows,
        "url_hash long, first_seen_round long, expires_ts timestamp, ttl_s long",
    )
    tgt = spark.createDataFrame(targets, "url_hash long")
    out = adaptive_seen_delta(
        tgt, seen, meta, now_s=NOW, base_s=BASE, min_s=MIN, max_s=MAX, round_n=RN
    ).collect()
    got = {r["url_hash"]: r["ttl_s"] for r in out}
    assert got == expect
    for r in out:
        assert r["first_seen_round"] == RN
        assert int(r["expires_ts"].timestamp()) == NOW + r["ttl_s"]
