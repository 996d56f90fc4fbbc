"""Sitemap source tests: parse goldens, normalization, seeds, crawl feed."""

from bathyscaphe_spark.sources.sitemap import (
    parse_sitemap_py,
    read_sitemaps,
    seeds_from_sitemaps,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>HTTP://A.onion/Page.html#frag</loc><lastmod>2024-05-01</lastmod></url>
  <url><loc> http://a.onion/two </loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.onion/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_golden():
    got = parse_sitemap_py(URLSET)
    assert got == [
        ("HTTP://A.onion/Page.html#frag", "2024-05-01", False, None, None),
        ("http://a.onion/two", None, False, None, None),
    ]
    assert parse_sitemap_py(INDEX) == [
        ("http://a.onion/sitemap2.xml", None, True, None, None)
    ]
    assert parse_sitemap_py("<html>not a sitemap</html>") == []
    assert parse_sitemap_py("junk <<<") == []
    assert parse_sitemap_py(None) == []
    assert parse_sitemap_py(URLSET.encode()) == parse_sitemap_py(URLSET)


def test_read_sitemaps_normalized(spark):
    bodies = spark.createDataFrame(
        [("a.onion", URLSET), ("b.onion", INDEX), ("c.onion", "junk")],
        "host string, body string",
    )
    rows = {(r["url"], r["is_index"]) for r in read_sitemaps(bodies).collect()}
    # X2: scheme/host lowercased, fragment stripped
    assert rows == {
        ("http://a.onion/Page.html", False),
        ("http://a.onion/two", False),
        ("http://a.onion/sitemap2.xml", True),
    }


def test_sitemap_seeds_bootstrap_crawl(spark, tmp_path):
    """Sitemap → seeds → crawl bootstrap: the advertised pages get
    fetched in round 0."""
    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.pipeline.synth import build_pages

    uni = build_pages(spark, n_pages=500, n_hosts=10)
    some = [r["url"] for r in uni.limit(3).collect()]
    body = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(f"<url><loc>{u}</loc></url>" for u in some)
        + "</urlset>"
    )
    bodies = spark.createDataFrame([("h.onion", body)], "host string, body string")
    seeds = seeds_from_sitemaps(bodies)
    assert {r["url"] for r in seeds.collect()} == set(some)
    stats = crawl(spark, uni, seeds, str(tmp_path / "s"), CrawlConfig(),
                  max_rounds=1)
    assert stats[0].scheduled == 3


class TestSitemapExport:
    def test_chunking_and_roundtrip_through_own_reader(self, spark):
        import datetime

        from bathyscaphe_spark.sources.sitemap import (
            read_sitemaps,
            sitemap_export,
        )

        rows = [
            (f"h{i % 2}.ex", f"http://h{i % 2}.ex/p{i:02d}?a=1&b=2",
             datetime.datetime(2024, 1, 1 + i % 5))
            for i in range(10)
        ]
        df = spark.createDataFrame(rows, "host string, url string, warc_ts timestamp")
        out = sitemap_export(df.repartition(7), max_urls=3)
        got = {(r.host, r.chunk): r for r in out.collect()}
        # ceil(5/3) = 2 chunks per host; protocol limit respected
        assert {k[1] for k in got} == {0, 1}
        assert all(r.n_urls <= 3 for r in got.values())
        assert sum(r.n_urls for r in got.values()) == 10
        # byte shape: header, escaped loc, W3C lastmod, footer
        xml = got[("h0.ex", 0)].xml
        assert xml.startswith('<?xml version="1.0"')
        assert "&amp;b=2</loc><lastmod>2024-01-0" in xml
        assert xml.endswith("</urlset>\n")
        # the engine's own parser recovers every (url, lastmod) pair
        back = read_sitemaps(out.selectExpr("host", "xml AS body"))
        pairs = {(r.url, r.lastmod) for r in back.collect()}
        assert pairs == {
            (u, ts.strftime("%Y-%m-%d")) for _, u, ts in rows
        }
        assert back.where("is_index").count() == 0

    def test_deterministic_across_partitionings(self, spark):
        import datetime

        from bathyscaphe_spark.sources.sitemap import sitemap_export

        rows = [
            (f"h{i % 3}.ex", f"http://h{i % 3}.ex/{(i * 7) % 20:02d}",
             datetime.datetime(2024, 2, 1 + i % 9))
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "host string, url string, warc_ts timestamp")
        a = {(r.host, r.chunk): r.xml
             for r in sitemap_export(df.repartition(1), max_urls=4).collect()}
        b = {(r.host, r.chunk): r.xml
             for r in sitemap_export(df.repartition(11), max_urls=4).collect()}
        assert a == b


class TestSitemapIndexExport:
    def test_index_lists_chunks_and_roundtrips(self, spark):
        import datetime

        from bathyscaphe_spark.sources.sitemap import (
            read_sitemaps,
            sitemap_export,
            sitemap_index_export,
        )

        rows = [
            (f"h{i % 2}.ex", f"http://h{i % 2}.ex/p{i:02d}",
             datetime.datetime(2024, 1, 1))
            for i in range(10)
        ]
        df = spark.createDataFrame(rows, "host string, url string, warc_ts timestamp")
        idx = sitemap_index_export(sitemap_export(df.repartition(5), max_urls=3))
        got = {r.host: r for r in idx.collect()}
        assert got["h0.ex"].n_sitemaps == 2 and got["h0.ex"].total_urls == 5
        assert "sitemap-0.xml" in got["h0.ex"].xml
        assert "sitemap-1.xml" in got["h0.ex"].xml
        assert got["h0.ex"].xml.endswith("</sitemapindex>\n")
        # the engine's own parser reads every entry back as is_index
        back = read_sitemaps(idx.selectExpr("host", "xml AS body"))
        assert back.count() == 4
        assert back.where("NOT is_index").count() == 0


class TestSitemapSchedule:
    """changefreq/priority → scheduling view."""

    def test_vocabulary_and_gates(self, spark):
        from bathyscaphe_spark.sources.sitemap import (
            read_sitemaps,
            sitemap_schedule,
        )

        def urlset(inner):
            return ('<urlset xmlns="http://www.sitemaps.org/schemas/'
                    f'sitemap/0.9">{inner}</urlset>')

        rows = [
            ("h.onion", urlset(
                '<url><loc>http://h.onion/a</loc>'
                '<changefreq>daily</changefreq>'
                '<priority>0.8</priority></url>'
                '<url><loc>http://h.onion/b</loc>'
                '<changefreq>never</changefreq></url>'
                '<url><loc>http://h.onion/c</loc>'
                '<priority>7.5</priority></url>')),
        ]
        df = spark.createDataFrame(rows, "host string, body string")
        got = {r["url"]: (r["priority_milli"], r["interval_s"])
               for r in sitemap_schedule(read_sitemaps(df)).collect()}
        assert got["http://h.onion/a"] == (800, 86400)
        assert got["http://h.onion/b"] == (500, None)   # never → adaptive
        assert got["http://h.onion/c"] == (500, None)   # out-of-range gate
