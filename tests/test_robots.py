"""robots.txt parser (operators/robots.py)."""

from bathyscaphe_spark.operators.robots import parse_robots_py


def test_parse_star_group_with_comments_and_allow():
    txt = (
        "User-agent: googlebot\nDisallow: /gb\n\n"
        "User-agent: *\n# policy\nDisallow: /a\nAllow: /pub\nDisallow: /b\n"
    )
    assert parse_robots_py(txt) == ["/a", "/b"]
    # RFC 9309 §2.2.1: the specific group WINS — '*' rules do not stack
    assert parse_robots_py(txt, agent="GoogleBot") == ["/gb"]


def test_parse_shared_group_and_empty_disallow():
    txt = "User-agent: a\nUser-agent: *\nDisallow:\nDisallow: /x\n"
    assert parse_robots_py(txt) == ["/x"]
    assert parse_robots_py("") == []
    assert parse_robots_py("User-agent: other\nDisallow: /y\n") == []


def test_rfc9309_group_selection():
    txt = (
        "User-agent: googlebot-images\nDisallow: /img\n\n"
        "User-agent: googlebot\nDisallow: /gb\n\n"
        "User-agent: googlebot\nDisallow: /gb2\n\n"
        "User-agent: *\nDisallow: /all\n"
    )
    # longest matching token wins (prefix match against the agent)
    assert parse_robots_py(txt, agent="googlebot-images") == ["/img"]
    # ...and equal-length winners COMBINE
    assert parse_robots_py(txt, agent="googlebot-news") == ["/gb", "/gb2"]
    assert parse_robots_py(txt, agent="googlebot") == ["/gb", "/gb2"]
    # no specific match: the '*' fallback
    assert parse_robots_py(txt, agent="bingbot") == ["/all"]
    # case-insensitive selection
    assert parse_robots_py(txt, agent="GoogleBot-Images") == ["/img"]


def test_robots_table_from_fetch(spark):
    from bathyscaphe_spark.operators.robots import robots_table_from_fetch

    fetched = spark.createDataFrame(
        [
            ("a.onion", b"User-agent: *\nDisallow: /x\n"),
            ("b.onion", b"User-agent: bot\nDisallow: /y\n"),  # no '*' group
            ("c.onion", None),
        ],
        "host string, html binary",
    )
    rows = {r["host"]: r["disallow"] for r in robots_table_from_fetch(fetched).collect()}
    assert rows == {"a.onion": ["/x"]}


def test_parse_crawl_delay():
    from bathyscaphe_spark.operators.robots import parse_crawl_delay_py

    txt = (
        "User-agent: googlebot\nCrawl-delay: 1\n\n"
        "User-agent: *\nDisallow: /a\nCrawl-delay: 10  # strict\n"
    )
    assert parse_crawl_delay_py(txt) == 10.0
    # RFC group selection: googlebot's own group wins, '*' never stacks
    assert parse_crawl_delay_py(txt, agent="GoogleBot") == 1.0
    assert parse_crawl_delay_py("User-agent: *\nDisallow: /a\n") is None
    assert parse_crawl_delay_py("User-agent: *\nCrawl-delay: nope\n") is None
    assert parse_crawl_delay_py("User-agent: *\nCrawl-delay: -3\n") is None
    assert parse_crawl_delay_py("") is None
    # delay-only file (no Disallow) still parses
    assert parse_crawl_delay_py("User-agent: *\nCrawl-delay: 2.5\n") == 2.5


def test_crawl_delay_budget_rank(spark):
    """Crawl-delay lowers a host's politeness budget; other hosts keep
    the config cap; budgets never exceed the cap."""
    from pyspark.sql import functions as F

    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.operators.politeness import rank_frontier
    from bathyscaphe_spark.operators.robots import (
        budgets_from_robots,
        robots_table_from_fetch,
    )

    cfg = CrawlConfig(per_host_budget=5, round_period_s=60)
    fetched = spark.createDataFrame(
        [
            ("slow.onion", b"User-agent: *\nCrawl-delay: 30\n"),   # budget 2
            ("open.onion", b"User-agent: *\nDisallow: /x\n"),      # no delay
            ("huge.onion", b"User-agent: *\nCrawl-delay: 0.001\n"),  # cap wins
        ],
        "host string, html binary",
    )
    robots = robots_table_from_fetch(fetched)
    budgets = budgets_from_robots(robots, cfg)
    got = {r["host"]: r["budget"] for r in budgets.collect()}
    assert got == {"slow.onion": 2, "huge.onion": 60000}
    rows = []
    for h in ("slow.onion", "open.onion", "huge.onion", "plain.onion"):
        for i in range(8):
            rows.append((f"http://{h}/p{i}", i * 7 + hash(h) % 100, h, 1,
                         100 - i, None))
    frontier = spark.createDataFrame(
        rows,
        "url string, url_hash long, host string, depth int, "
        "priority int, discovered_ts timestamp",
    )
    out = rank_frontier(frontier, cfg, budgets).groupBy("host").count()
    counts = {r["host"]: r["count"] for r in out.collect()}
    assert counts == {
        "slow.onion": 2,     # delay-derived budget
        "open.onion": 5,     # config cap
        "huge.onion": 5,     # min(cap, delay budget)
        "plain.onion": 5,    # no robots entry at all
    }
    # without budgets: identical to the config cap everywhere
    base = rank_frontier(frontier, cfg).groupBy("host").count()
    assert all(r["count"] == 5 for r in base.collect())


def test_fetch_robots_end_to_end(spark, tmp_path):
    """config.fetch_robots: a newly discovered host gets /robots.txt
    scheduled (top priority), the fetched body is harvested into robots
    state, and the host's Crawl-delay caps its budget next round."""
    from pyspark.sql import functions as F

    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.state.tables import TableCatalog

    n_pages = 30
    links = " ".join(f"<a href='http://a.onion/p{i}.html'>x</a>"
                     for i in range(n_pages))
    rows = [
        ("http://root.onion", "root.onion", links),
        ("http://a.onion/robots.txt", "a.onion",
         "User-agent: *\nCrawl-delay: 30\nDisallow: /secret\n"),
    ] + [
        (f"http://a.onion/p{i}.html", "a.onion", f"page {i}")
        for i in range(n_pages)
    ]
    uni = spark.createDataFrame(
        rows, "url string, host string, html string"
    ).select(
        "url", "host", "html",
        F.create_map(F.lit("Content-Type"), F.lit("text/html")).alias("headers"),
        F.lit(200).alias("status"),
        F.to_timestamp(F.lit("2024-05-01 12:00:00")).alias("warc_ts"),
    )
    seeds = spark.createDataFrame(
        [("http://root.onion", "root.onion")], "url string, host string"
    )
    cfg = CrawlConfig(per_host_budget=10, round_period_s=60,
                      fetch_robots=True, bloom_enabled=False)
    state = str(tmp_path / "st")
    stats = crawl(spark, uni, seeds, state, cfg, max_rounds=3)
    # r0: seed fetched, 30 pages discovered + a.onion robots injected
    assert stats[0].discovered == n_pages + 1
    # r1: budget 10 ⇒ 10 of a.onion scheduled (robots.txt is top rank)
    assert stats[1].scheduled == 10
    cat = TableCatalog(spark, state)
    rob = cat.read_state("robots").collect()
    assert [(r["host"], r["disallow"], r["crawl_delay_s"]) for r in rob] == [
        ("a.onion", ["/secret"], 30.0)
    ]
    # r2: Crawl-delay 30 @ round 60s ⇒ budget floor(60/30)=2
    assert stats[2].scheduled == 2


def test_parse_sitemaps_goldens():
    from bathyscaphe_spark.operators.robots import parse_sitemaps_py

    body = (
        "User-agent: *\n"
        "Disallow: /x\n"
        "Sitemap: https://a.onion/s1.xml\n"
        "# Sitemap: https://commented.onion/no.xml\n"
        "siteMAP:   https://a.onion/s2.xml  \n"
        "Sitemap: https://b.onion/s3.xml # trailing comment\n"
        "Sitemap:\n"          # empty value: skipped
        "Sitemapx: https://not-a-directive\n"
    )
    assert parse_sitemaps_py(body) == [
        "https://a.onion/s1.xml",
        "https://a.onion/s2.xml",
        "https://b.onion/s3.xml",
    ]
    assert parse_sitemaps_py("") == []
    assert parse_sitemaps_py(None) == []


def test_rfc9309_precedence(spark):
    from pyspark.sql import functions as F

    from bathyscaphe_spark.operators.robots import rfc9309_allowed

    rules = spark.createDataFrame(
        [("h.onion", "/a", False), ("h.onion", "/a/b", True),
         ("h.onion", "/a/b/c", False),
         ("h.onion", "/t", True), ("h.onion", "/t", False)],
        "host string, rule string, is_allow boolean",
    )
    cands = spark.createDataFrame(
        [(f"u{i}", "h.onion", p) for i, p in enumerate(
            ["/a/x", "/a/b/x", "/a/b/c/x", "/t", "/z", "/a", "/a/b"]
        )] + [("u7", "other.onion", "/a/x")],
        "url string, host string, path string",
    )
    got = {r.url: r.allowed for r in rfc9309_allowed(cands, rules).collect()}
    assert got == {
        "u0": False,  # Disallow /a
        "u1": True,   # Allow /a/b outranks /a
        "u2": False,  # Disallow /a/b/c longest
        "u3": True,   # exact tie on '/t': Allow wins
        "u4": True,   # no rule matches
        "u5": False,  # exact /a
        "u6": True,   # exact /a/b
        "u7": True,   # other host: no rules
    }


class TestWildcardRules:
    def test_regex_builder_goldens(self):
        from bathyscaphe_spark.operators.robots import wildcard_rule_regex_py as rx

        assert rx("/private*") == "^/private.*"
        assert rx("/*.php$") == "^/.*\\.php$"
        assert rx("/plain") == "^/plain"
        assert rx("/a$b*") == "^/a\\$b.*"  # mid-rule $ is literal
        assert rx("/p+q(1)") == "^/p\\+q\\(1\\)"

    def _verdicts(self, spark, rules_raw, paths):
        from bathyscaphe_spark.operators.robots import (
            rfc9309_allowed_wild,
            wildcard_rule_regex_py,
        )

        rules = spark.createDataFrame(
            [("h", r, wildcard_rule_regex_py(r), a) for r, a in rules_raw],
            "host string, rule string, rule_regex string, is_allow boolean",
        )
        cands = spark.createDataFrame(
            [(f"u{i}", "h", p) for i, p in enumerate(paths)],
            "url string, host string, path string",
        )
        out = rfc9309_allowed_wild(cands, rules)
        return {r["path"]: r["allowed"] for r in out.collect()}

    def test_spec_examples(self, spark):
        got = self._verdicts(
            spark,
            [("/private*", False), ("/private/ok$", True), ("/*.php$", False)],
            ["/private/x", "/private/ok", "/private/ok2", "/f.php", "/f.phpx", "/"],
        )
        assert got == {
            "/private/x": False,
            "/private/ok": True,   # longer allow overrides
            "/private/ok2": False,  # $ anchor: allow doesn't match
            "/f.php": False,
            "/f.phpx": True,       # $ anchor rejects the near-miss
            "/": True,             # no rule -> allowed
        }

    def test_equal_length_tie_goes_to_allow(self, spark):
        got = self._verdicts(
            spark, [("/dir", False), ("/di*", True)], ["/dir/x"]
        )
        assert got == {"/dir/x": True}


class TestRobotsAvailability:
    NOW = "2020-03-01 00:00:00"

    def _run(self, spark, rows, **kw):
        import datetime as dt

        from bathyscaphe_spark.operators.robots import robots_availability

        base = dt.datetime(2020, 3, 1)

        def ts(hours_ago):
            return None if hours_ago is None else base - dt.timedelta(hours=hours_ago)

        fetches = spark.createDataFrame(
            [(h, s, ts(a), ts(ok), ts(fs)) for h, s, a, ok, fs in rows],
            "host string, status int, attempt_ts timestamp,"
            " ok_ts timestamp, fail_since_ts timestamp",
        )
        return {
            r["host"]: (r["policy"], r["refetch_due"])
            for r in robots_availability(fetches, self.NOW, **kw).collect()
        }

    def test_status_classes(self, spark):
        got = self._run(spark, [
            ("ok", 200, 1, 1, None),
            ("gone", 404, 1, None, None),
            ("teapot", 418, 1, None, None),
            ("redirloop", 301, 1, None, None),
            ("err", 503, 1, None, 48),
            ("net", None, 1, None, 48),
        ])
        assert got["ok"] == ("rules", False)
        assert got["gone"] == ("allow_all", False)
        assert got["teapot"] == ("allow_all", False)
        assert got["redirloop"] == ("allow_all", False)
        # young failure streaks: complete disallow, retried every round
        assert got["err"] == ("disallow_all", True)
        assert got["net"] == ("disallow_all", True)

    def test_unreachable_grace_fallback(self, spark):
        got = self._run(spark, [
            ("cached", None, 1, 50 * 24, 45 * 24),   # long streak, copy held
            ("nocopy", 503, 1, None, 45 * 24),        # long streak, never fetched
            ("boundary", 500, 1, None, 30 * 24),      # exactly 30d: NOT past grace
        ])
        assert got["cached"] == ("cached_rules", False)
        assert got["nocopy"] == ("allow_all", False)
        assert got["boundary"] == ("disallow_all", True)

    def test_cache_staleness_boundary(self, spark):
        got = self._run(spark, [
            ("fresh", 200, 23, 23, None),
            ("edge", 200, 24, 24, None),   # exactly 24h: due (>=)
            ("stale", 404, 30, None, None),
        ])
        assert got["fresh"] == ("rules", False)
        assert got["edge"] == ("rules", True)
        assert got["stale"] == ("allow_all", True)

    def test_knobs(self, spark):
        got = self._run(
            spark,
            [("h1", 503, 1, 10, 3), ("h2", 200, 2, 2, None)],
            cache_max_age_h=1, unreachable_grace_d=0,
        )
        # grace 0: a 3h streak already falls back to the cached copy
        # (and the 1h-old attempt is at the 1h cache edge: due)
        assert got["h1"] == ("cached_rules", True)
        # cache max age 1h: a 2h-old success is due
        assert got["h2"] == ("rules", True)
