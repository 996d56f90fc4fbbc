"""Page-level robots directives wired into the crawl round
(config.robots_meta_enabled): nofollow pages contribute no links,
noindex pages never reach the resources sink; default path unchanged."""

import tempfile

import pytest
from pyspark.sql import functions as F

from bathyscaphe_spark.config import CrawlConfig
from bathyscaphe_spark.pipeline.driver import crawl
from bathyscaphe_spark.pipeline.synth import build_pages, build_seeds
from bathyscaphe_spark.state.tables import TableCatalog

_NOIDX = '<meta name="robots" content="noindex">'
_NOFOL = '<meta content="nofollow" name="robots">'


@pytest.fixture(scope="module")
def universe(spark):
    pages = build_pages(spark, n_pages=2000, n_hosts=20)
    # tag a deterministic slice of pages: every 5th noindex, every 7th
    # nofollow (some pages both) — injected INSIDE the existing html so
    # the page's own links survive for the flag-off baseline
    h = F.xxhash64("url")
    pages = pages.withColumn(
        "html",
        F.concat(
            F.when(h % 5 == 0, F.lit(_NOIDX)).otherwise(F.lit("")),
            F.when(h % 7 == 0, F.lit(_NOFOL)).otherwise(F.lit("")),
            F.col("html"),
        ),
    ).persist()
    yield pages, build_seeds(spark, pages, 10)
    pages.unpersist()


_BASE = dict(bloom_enabled=False, per_host_budget=8, round_fetch_budget=60)


def _run(spark, universe, cfg, rounds=2):
    pages, seeds = universe
    root = tempfile.mkdtemp(prefix="rmeta_")
    crawl(spark, pages, seeds, root, cfg, max_rounds=rounds)
    return TableCatalog(spark, root)


def _tagged(spark, universe, mod):
    pages, _ = universe
    return {
        r["url"]
        for r in pages.where(F.xxhash64("url") % mod == 0)
        .select("url")
        .collect()
    }


def test_noindex_pages_never_indexed(spark, universe):
    cat = _run(spark, universe, CrawlConfig(robots_meta_enabled=True, **_BASE))
    res = cat.read_deltas("resources")
    assert res is not None and res.count() > 0
    indexed = {r["url"] for r in res.select("url").collect()}
    assert not (indexed & _tagged(spark, universe, 5))


def test_nofollow_pages_contribute_no_links(spark, universe):
    pages, _ = universe
    cat_on = _run(spark, universe, CrawlConfig(robots_meta_enabled=True, **_BASE))
    cat_off = _run(spark, universe, CrawlConfig(**_BASE))
    # flag-off indexes tagged pages (the directive is ignored)
    res_off = cat_off.read_deltas("resources")
    assert {r["url"] for r in res_off.select("url").collect()} & _tagged(
        spark, universe, 5
    )
    # the on-run frontier is a subset of the off-run frontier: dropping
    # nofollow parents can only remove discoveries, never add
    f_on = {r["url_hash"] for r in cat_on.read_round("frontier", 2).collect()}
    f_off = {r["url_hash"] for r in cat_off.read_round("frontier", 2).collect()}
    assert f_on <= f_off


def test_flag_off_path_unchanged(spark, universe):
    cat_a = _run(spark, universe, CrawlConfig(**_BASE))
    cat_b = _run(spark, universe, CrawlConfig(robots_meta_enabled=False, **_BASE))
    fa = sorted(r["url_hash"] for r in cat_a.read_round("frontier", 2).collect())
    fb = sorted(r["url_hash"] for r in cat_b.read_round("frontier", 2).collect())
    assert fa == fb
