"""Host-reputation demotion integrated into the crawl loop
(config.reputation_enabled)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from bathyscaphe_spark.config import CrawlConfig
from bathyscaphe_spark.pipeline.driver import crawl
from bathyscaphe_spark.pipeline.synth import build_pages, build_seeds
from bathyscaphe_spark.state.tables import TableCatalog

_BAD_BODY = "<html><body>oops page not found</body></html>"


@pytest.fixture(scope="module")
def universe(spark):
    pages = build_pages(spark, n_pages=2500, n_hosts=30)
    bad = pages.groupBy("host").count().orderBy(F.desc("count")).first()["host"]
    # the mega-host serves ONE phrase-hit error template at every URL:
    # maximal dup-content + soft-404 evidence, zero outlinks from it
    pages = pages.withColumn(
        "html",
        F.when(F.col("host") == bad, F.lit(_BAD_BODY)).otherwise(F.col("html")),
    ).persist()
    yield pages, build_seeds(spark, pages, 8), bad
    pages.unpersist()


def _run(spark, universe, cfg, rounds=3):
    pages, seeds, _ = universe
    root = tempfile.mkdtemp(prefix="reputation_")
    stats = crawl(spark, pages, seeds, root, cfg, max_rounds=rounds)
    return root, stats


_BASE = dict(bloom_enabled=False, per_host_budget=5, round_fetch_budget=25)


def test_repute_state_committed_with_evidence(spark, universe):
    _, _, bad = universe
    root, stats = _run(spark, universe, CrawlConfig(reputation_enabled=True, **_BASE))
    assert len(stats) >= 2
    cat = TableCatalog(spark, root)
    hist = cat.read_deltas("host_repute")
    assert hist is not None
    rows = hist.where(F.col("host") == bad)
    got = rows.select("soft404", "content_fnv").distinct().collect()
    if got:  # the mega-host was fetched: evidence must be unanimous
        assert all(r["soft404"] for r in got)
        assert len({r["content_fnv"] for r in got}) == 1
    # evidence exists for SOME host either way, errors included
    assert hist.count() > 0
    assert set(hist.columns) >= {
        "host", "url", "status", "content_fnv", "soft404", "round"
    }


def test_demotion_binds_under_global_cap(spark, universe):
    """Re-rank a committed frontier with and without the reputation
    demotion: under the cross-host cap the bad host must lose slots."""
    _, _, bad = universe
    root, _ = _run(spark, universe, CrawlConfig(reputation_enabled=True, **_BASE))
    cat = TableCatalog(spark, root)
    hist = cat.read_deltas("host_repute")
    from bathyscaphe_spark.operators.blacklister import host_reputation
    from bathyscaphe_spark.operators.politeness import (
        global_fetch_cap,
        rank_frontier,
    )

    rep = host_reputation(
        hist.selectExpr(
            "host", "url", "status", "content_fnv AS content_hash", "soft404"
        )
    )
    bad_rep = rep.where(F.col("host") == bad).first()
    clean_max = rep.where(F.col("host") != bad).agg(
        F.max("reputation_pm")
    ).first()[0]
    assert bad_rep["reputation_pm"] < 1000
    # every capture of the bad host hits the error phrase; dup evidence
    # needs ≥2 fetched URLs, which the demotion itself may prevent —
    # soft-404 is the signal this fixture guarantees
    assert bad_rep["soft404_pm"] == 1000
    assert clean_max == 1000  # healthy hosts keep full reputation

    cfg = CrawlConfig(reputation_enabled=True, **_BASE)
    f = None
    for rnd in (2, 1):
        f = cat.read_round("frontier", rnd)
        if f is not None and f.where(F.col("host") == bad).count() > 0:
            break
    assert f is not None and f.where(F.col("host") == bad).count() > 0
    dem = rep.select(
        "host",
        F.expr("((1000 - reputation_pm) * 1000) DIV 1000").cast("int").alias("d"),
    )
    demoted = f.join(dem, "host", "left").withColumn(
        "priority",
        (F.col("priority") - F.coalesce(F.col("d"), F.lit(0))).cast("int"),
    ).drop("d")

    def bad_sched(frontier):
        s = global_fetch_cap(rank_frontier(frontier, cfg), 25)
        return s.where(F.col("host") == bad).count()

    assert bad_sched(demoted) < bad_sched(f)


def test_churning_host_never_boosted(spark):
    """A recrawled host whose pages CHANGE carries more distinct
    content hashes than distinct URLs; that is churn, not duplication —
    dup_pm must clamp at 0 so reputation_pm stays ≤ 1000 and the
    demotion term stays ≥ 0 (an unclamped score flipped the demotion
    into a priority boost)."""
    from bathyscaphe_spark.operators.blacklister import host_reputation

    rows = [
        # one URL captured 3 times with 3 different hashes (churn)
        ("churn.ex", "http://churn.ex/a", 200, f"h{i}", False)
        for i in range(3)
    ] + [
        # control: two URLs serving the same content (true dup)
        ("dup.ex", "http://dup.ex/a", 200, "same", False),
        ("dup.ex", "http://dup.ex/b", 200, "same", False),
    ]
    pages = spark.createDataFrame(
        rows, "host string, url string, status int, content_hash string, soft404 boolean"
    )
    rep = {r["host"]: r for r in host_reputation(pages).collect()}
    assert rep["churn.ex"]["dup_pm"] == 0
    assert rep["churn.ex"]["reputation_pm"] == 1000  # no demerit, no boost
    assert rep["dup.ex"]["dup_pm"] == 500  # 1000 - (1*1000) DIV 2
    assert rep["dup.ex"]["reputation_pm"] < 1000
    assert all(r["reputation_pm"] <= 1000 for r in rep.values())


def test_leftovers_restore_base_priority(spark, universe):
    root, _ = _run(spark, universe, CrawlConfig(reputation_enabled=True, **_BASE))
    cat = TableCatalog(spark, root)
    for rnd in (1, 2, 3):
        f = cat.read_round("frontier", rnd)
        if f is None:
            continue
        # base priorities are exactly 1000 - 10·depth; a committed row
        # carrying a rank-time demotion would break the invariant
        off = f.where((F.lit(1000) - F.col("priority")) % 10 != 0)
        assert off.count() == 0
        assert f.where(
            F.col("priority") != (F.lit(1000) - F.col("depth") * 10)
        ).count() == 0


def test_off_path_unchanged(spark, universe):
    """reputation_enabled=False must produce bit-identical frontiers to
    a config that never knew the field existed (default object)."""
    root_off, st_off = _run(spark, universe, CrawlConfig(**_BASE))
    root_ctl, st_ctl = _run(spark, universe, CrawlConfig(**_BASE))
    assert [s.scheduled for s in st_off] == [s.scheduled for s in st_ctl]
    a, b = TableCatalog(spark, root_off), TableCatalog(spark, root_ctl)
    assert a.read_deltas("host_repute") is None
    for rnd in (1, 2):
        fa, fb = a.read_round("frontier", rnd), b.read_round("frontier", rnd)
        if fa is None or fb is None:
            assert (fa is None) == (fb is None)
            continue
        ha = sorted(r["url_hash"] for r in fa.select("url_hash").collect())
        hb = sorted(r["url_hash"] for r in fb.select("url_hash").collect())
        assert ha == hb


class TestPriorityAging:
    """Starvation guard (config.age_boost_per_round)."""

    def _one_round(self, spark, universe, cfg):
        """run_round over a handcrafted round-0 frontier: an OLD deep
        row (5 rounds waited) vs fresh shallow rows on other hosts —
        the shape aging exists for (BFS universes are depth-monotone:
        older is shallower there, so aging never binds; a recrawl pump
        / link-boost frontier is not)."""
        import tempfile

        from bathyscaphe_spark.functions.fnv import fnv1_64
        from bathyscaphe_spark.pipeline.round import (
            BASE_TS,
            ROUND_INTERVAL_S,
            run_round,
        )
        from bathyscaphe_spark.pipeline.synth import build_host_status

        pages, _, _ = universe
        hosts = [r["host"] for r in pages.select("host").distinct().limit(4).collect()]
        urls = [r["url"] for r in pages.select("url", "host").groupBy("host")
                .agg(F.min("url").alias("url")).where(F.col("host").isin(hosts))
                .select("url").collect()]
        rows = []
        for i, u in enumerate(urls):
            old = i == 0
            rows.append((
                u, hosts[0] if False else None, 5 if old else 0,
                950 if old else 1000,
                BASE_TS - (5 * ROUND_INTERVAL_S if old else 0),
            ))
        df = spark.createDataFrame(
            [(u, d, p, ts) for (u, _, d, p, ts) in rows],
            "url string, depth int, priority int, ts long",
        ).selectExpr(
            "url", "depth", "priority",
            "timestamp_seconds(ts) AS discovered_ts",
        )
        from bathyscaphe_spark.functions.urltools import url_host

        delta = df.select(
            "url",
            fnv1_64(F.col("url")).alias("url_hash"),
            url_host(F.col("url")).alias("host"),
            "depth", "priority", "discovered_ts",
            F.lit(0).alias("round"),
        )
        root = tempfile.mkdtemp(prefix="aging_round_")
        cat = TableCatalog(spark, root)
        cat.stage_round("frontier", delta, 0)
        cat.commit_round(0, ["frontier"], extra={"bootstrap": True})
        run_round(cat, pages, build_host_status(pages), cfg, 0)
        # the fetched set IS the committed resources table
        res = cat.read_round("resources", 0)
        return {r["url"] for r in res.select("url").collect()}

    def test_aged_deep_row_wins_only_with_boost(self, spark, universe):
        base = dict(bloom_enabled=False, per_host_budget=1,
                    round_fetch_budget=1)
        on = self._one_round(
            spark, universe, CrawlConfig(age_boost_per_round=50, **base)
        )
        off = self._one_round(spark, universe, CrawlConfig(**base))
        assert len(on) == 1 and len(off) == 1
        # with aging: 950 + 5*50 = 1200 beats the fresh 1000s;
        # without: a fresh depth-0 priority-1000 row wins
        assert on != off

    def test_aging_is_deterministic(self, spark, universe):
        base = dict(bloom_enabled=False, per_host_budget=3,
                    round_fetch_budget=12, age_boost_per_round=50)
        _, st_a = _run(spark, universe, CrawlConfig(**base), rounds=3)
        _, st_b = _run(spark, universe, CrawlConfig(**base), rounds=3)
        assert [s.scheduled for s in st_a] == [s.scheduled for s in st_b]
        assert [s.discovered for s in st_a] == [s.discovered for s in st_b]
