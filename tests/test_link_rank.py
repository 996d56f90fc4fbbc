"""Link-graph PageRank priority integrated into the crawl loop
(config.link_rank_enabled)."""

import tempfile

import pytest

from bathyscaphe_spark.config import CrawlConfig
from bathyscaphe_spark.pipeline.driver import crawl
from bathyscaphe_spark.pipeline.synth import build_pages, build_seeds
from bathyscaphe_spark.state.tables import TableCatalog


@pytest.fixture(scope="module")
def universe(spark):
    pages = build_pages(spark, n_pages=2500, n_hosts=30).persist()
    yield pages, build_seeds(spark, pages, 8)
    pages.unpersist()


def _run(spark, universe, cfg, rounds=3):
    pages, seeds = universe
    root = tempfile.mkdtemp(prefix="link_rank_")
    stats = crawl(spark, pages, seeds, root, cfg, max_rounds=rounds)
    return root, stats


def test_link_rank_crawl_commits_edges(spark, universe):
    cfg = CrawlConfig(link_rank_enabled=True, bloom_enabled=False)
    root, stats = _run(spark, universe, cfg)
    assert len(stats) >= 2
    cat = TableCatalog(spark, root)
    edges = cat.read_deltas("link_edges")
    assert edges is not None
    rows = edges.select("src", "dst").distinct()
    assert rows.count() > 0
    # host-level graph, no self-loops
    assert rows.where("src = dst").count() == 0


def test_link_rank_deterministic_and_polite(spark, universe):
    cfg = CrawlConfig(
        link_rank_enabled=True, bloom_enabled=False, per_host_budget=15
    )
    root_a, stats_a = _run(spark, universe, cfg)
    root_b, stats_b = _run(spark, universe, cfg)
    assert [s.scheduled for s in stats_a] == [s.scheduled for s in stats_b]
    # the boosted rank must still respect the per-host politeness budget:
    # re-rank round 2's frontier and check per-host scheduled counts
    cat = TableCatalog(spark, root_a)
    for rnd in (1, 2):
        f = cat.read_round("frontier", rnd)
        if f is None:
            continue
        from pyspark.sql import functions as F

        from bathyscaphe_spark.operators.politeness import rank_frontier

        ranked = rank_frontier(f, cfg)
        over = (
            ranked.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > cfg.per_host_budget)
        )
        assert over.count() == 0


def test_global_fetch_cap_consumes_link_rank(spark, universe):
    """With a cross-host per-round fetch cap, the host PageRank boost
    changes WHICH URLs make the cut (per-host-only budgets cannot see
    a host-level boost — the cap is its consumer)."""
    from pyspark.sql import functions as F

    base = dict(bloom_enabled=False, per_host_budget=5, round_fetch_budget=25)
    root_on, st_on = _run(
        spark, universe, CrawlConfig(link_rank_enabled=True, **base)
    )
    root_off, st_off = _run(spark, universe, CrawlConfig(**base))
    # cap respected every round (after round 0's thin seed frontier)
    assert all(s.scheduled <= 25 for s in st_on + st_off)

    def sched_hashes(root, rnd, boosted):
        """Capped schedule set for a committed frontier, with/without the
        host PageRank boost — the direct assertion that the cap CONSUMES
        the boost: same rows in, different cut out."""
        from pyspark.sql import functions as F

        from bathyscaphe_spark.operators.graph import SCALE, pagerank_fp
        from bathyscaphe_spark.operators.politeness import (
            global_fetch_cap,
            rank_frontier,
        )

        cat = TableCatalog(spark, root)
        f = cat.read_round("frontier", rnd)
        assert f is not None
        if boosted:
            edges = cat.read_deltas("link_edges").select("src", "dst").distinct()
            boost = pagerank_fp(edges, iters=CrawlConfig().link_rank_iters).select(
                F.col("node").alias("host"),
                F.expr(f"rank_fp div {SCALE // 1000}").cast("int").alias("_b"),
            )
            f = (
                f.join(boost, "host", "left")
                .withColumn(
                    "priority",
                    (F.col("priority") + F.coalesce(F.col("_b"), F.lit(0)))
                    .cast("int"),
                )
                .drop("_b")
            )
        return {
            r["url_hash"]
            for r in global_fetch_cap(
                rank_frontier(f, CrawlConfig(**base)), 25
            ).collect()
        }

    # direct: on the SAME committed frontier, the boost changes which
    # URLs make the 25-row cut (at least one of rounds 1-2 must differ —
    # both identical would mean the boost is rank-invisible)
    assert any(
        sched_hashes(root_on, rnd, True) != sched_hashes(root_on, rnd, False)
        for rnd in (1, 2)
    )

    # round 2+ frontiers differ between runs because earlier cuts
    # differed; the cheap strong signal: the committed frontier deltas
    # themselves diverge once the boost shapes the cut
    cat_on, cat_off = TableCatalog(spark, root_on), TableCatalog(spark, root_off)
    f_on = cat_on.read_round("frontier", 2)
    f_off = cat_off.read_round("frontier", 2)
    assert f_on is not None and f_off is not None
    h_on = {r["url_hash"] for r in f_on.select("url_hash").collect()}
    h_off = {r["url_hash"] for r in f_off.select("url_hash").collect()}
    assert h_on != h_off


def test_link_rank_off_means_no_edges_table(spark, universe):
    root, _ = _run(spark, universe, CrawlConfig(bloom_enabled=False), rounds=2)
    cat = TableCatalog(spark, root)
    assert cat.read_deltas("link_edges") is None
