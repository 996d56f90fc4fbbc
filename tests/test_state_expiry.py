"""Snapshot expiry (TableCatalog.expire_rounds) — space reclaim without
breaking resume."""

import os
import tempfile

from bathyscaphe_spark.config import CrawlConfig
from bathyscaphe_spark.pipeline.driver import crawl
from bathyscaphe_spark.pipeline.synth import build_pages, build_seeds
from bathyscaphe_spark.state.tables import TableCatalog


def _round_dirs(root, table):
    tdir = os.path.join(root, "tables", table)
    return sorted(os.listdir(tdir)) if os.path.isdir(tdir) else []


def test_expire_then_resume_is_identical(spark):
    pages = build_pages(spark, n_pages=2500, n_hosts=25).persist()
    seeds = build_seeds(spark, pages, 8)
    cfg = CrawlConfig(bloom_enabled=False)

    roots = {}
    for tag in ("expired", "control"):
        root = tempfile.mkdtemp(prefix=f"expiry_{tag}_")
        crawl(spark, pages, seeds, root, cfg, max_rounds=3)
        roots[tag] = root

    cat = TableCatalog(spark, roots["expired"])
    before = _round_dirs(roots["expired"], "frontier")
    removed = cat.expire_rounds(keep_last=1)
    assert removed.get("frontier", 0) >= 2  # rounds 0 and 1 consumed
    after = _round_dirs(roots["expired"], "frontier")
    assert len(after) < len(before)
    # expired rounds are invisible AND gone; time travel below horizon ends
    assert cat.read_round("frontier", 0) is None
    # history tables untouched
    assert cat.read_deltas("seen").count() == TableCatalog(
        spark, roots["control"]
    ).read_deltas("seen").count()

    # resume both states one more round: identical frontier out
    a = crawl(spark, pages, None, roots["expired"], cfg, max_rounds=4)
    b = crawl(spark, pages, None, roots["control"], cfg, max_rounds=4)
    assert [s.scheduled for s in a] == [s.scheduled for s in b]
    fa = TableCatalog(spark, roots["expired"]).read_round("frontier", 4)
    fb = TableCatalog(spark, roots["control"]).read_round("frontier", 4)
    ha = sorted(r["url_hash"] for r in fa.collect()) if fa is not None else []
    hb = sorted(r["url_hash"] for r in fb.collect()) if fb is not None else []
    assert ha == hb
    pages.unpersist()


def test_expire_keeps_latest_full_state(spark):
    pages = build_pages(spark, n_pages=2000, n_hosts=20).persist()
    seeds = build_seeds(spark, pages, 6)
    root = tempfile.mkdtemp(prefix="expiry_fs_")
    crawl(spark, pages, seeds, root, CrawlConfig(bloom_enabled=False), max_rounds=3)
    cat = TableCatalog(spark, root)
    hf_before = cat.read_state("host_failures")
    n_before = hf_before.count() if hf_before is not None else None
    cat.expire_rounds(keep_last=1)
    hf_after = cat.read_state("host_failures")
    n_after = hf_after.count() if hf_after is not None else None
    assert n_before == n_after  # latest rewrite survives expiry
    pages.unpersist()
