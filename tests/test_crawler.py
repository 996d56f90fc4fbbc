"""Crawler fetch/content-type/timeout tests (crawler_test.go:82-208)."""

from pyspark.sql import functions as F

from bathyscaphe_spark.config import CrawlConfig, MimeType
from bathyscaphe_spark.operators.crawler import STATUS_TIMEOUT, fetch


def _frontier(spark, urls):
    return spark.createDataFrame([(u, u.split("/")[2]) for u in urls], "url string, host string")


def _pages(spark, rows):
    # rows: (url, content_type, status)
    return spark.createDataFrame(
        [
            (u, bytearray(b"<html>body</html>"), {"Content-Type": ct} if ct is not None else {}, None, st)
            for u, ct, st in rows
        ],
        "url string, html binary, headers map<string,string>, warc_ts timestamp, status int",
    )


def test_content_type_allowlist(spark):
    # crawler_test.go:82-133 table
    cfg = CrawlConfig(allowed_mime_types=(MimeType("text/", ("html",)),))
    pages = _pages(
        spark,
        [
            ("https://a.onion/1", "text/html", 200),   # prefix match ⇒ allow
            ("https://a.onion/2", "text/plain", 200),  # contains text/ ⇒ allow
            ("https://a.onion/3", "image/png", 200),   # deny
            ("https://a.onion/4", None, 200),          # missing header ⇒ deny
        ],
    )
    ok, timeouts = fetch(_frontier(spark, [r["url"] for r in pages.select("url").collect()]), pages, cfg)
    assert sorted(r["url"][-1] for r in ok.collect()) == ["1", "2"]
    assert timeouts.count() == 0


def test_empty_allowlist_allows_all(spark):
    # crawler.go:120-122: len(allowedMimeTypes)==0 ⇒ allowed
    cfg = CrawlConfig(allowed_mime_types=())
    pages = _pages(spark, [("https://a.onion/1", "image/png", 200)])
    ok, _ = fetch(_frontier(spark, ["https://a.onion/1"]), pages, cfg)
    assert ok.count() == 1


def test_timeout_branch(spark):
    # crawler.go:106-114: timeout ⇒ TimeoutURLEvent, no resource
    cfg = CrawlConfig()
    pages = _pages(spark, [("https://down.onion/1", "text/html", STATUS_TIMEOUT)])
    ok, timeouts = fetch(_frontier(spark, ["https://down.onion/1"]), pages, cfg)
    assert ok.count() == 0
    assert [r["host"] for r in timeouts.collect()] == ["down.onion"]


def test_redirects_followed_and_errors_dropped(spark):
    # http/client.go:48-56: 301/302 ok; >302 dropped
    cfg = CrawlConfig()
    pages = _pages(
        spark,
        [
            ("https://a.onion/ok", "text/html", 301),
            ("https://a.onion/gone", "text/html", 404),
        ],
    )
    ok, timeouts = fetch(_frontier(spark, ["https://a.onion/ok", "https://a.onion/gone"]), pages, cfg)
    assert [r["url"] for r in ok.collect()] == ["https://a.onion/ok"]
    assert timeouts.count() == 0


def test_crawler_hostname_filter(spark):
    # crawler_test.go:185-208: forbidden hostname never fetched
    cfg = CrawlConfig()
    pages = _pages(spark, [("https://m.fbi.onion/x", "text/html", 200)])
    ok, _ = fetch(_frontier(spark, ["https://m.fbi.onion/x"]), pages, cfg, blacklist=["fbi.onion"])
    assert ok.count() == 0
