"""Feed source tests: RSS/Atom parse goldens, link selection, recency ramp."""

from bathyscaphe_spark.sources.feeds import (
    feed_recency,
    parse_feed_py,
    read_feeds,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel><title>chan</title>
  <item><title>A1</title><link>HTTP://Ex.onion/A1#frag</link>
    <pubDate>Wed, 01 May 2024 11:00:00 GMT</pubDate></item>
  <item><link> http://ex.onion/a2 </link></item>
  <item><description>linkless — dropped</description></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>
  <entry><title>B1</title>
    <link rel="self" href="http://ex.onion/self"/>
    <link href="http://ex.onion/b1"/>
    <published>2024-04-30T12:00:00Z</published></entry>
  <entry><link rel="alternate" href="http://ex.onion/b2"/>
    <updated>2024-04-01T00:00:00Z</updated></entry>
  <entry><title>linkless — dropped</title></entry>
</feed>"""


class TestParseFeedPy:
    def test_rss_golden(self):
        assert parse_feed_py(RSS) == [
            ("HTTP://Ex.onion/A1#frag", "A1",
             "Wed, 01 May 2024 11:00:00 GMT", "rss"),
            ("http://ex.onion/a2", None, None, "rss"),
        ]

    def test_atom_golden(self):
        # entry1: rel="self" skipped, rel-absent link IS the alternate
        # (RFC 4287 §4.2.7.2); entry2: explicit rel="alternate";
        # <published> preferred over <updated> when both exist
        assert parse_feed_py(ATOM) == [
            ("http://ex.onion/b1", "B1", "2024-04-30T12:00:00Z", "atom"),
            ("http://ex.onion/b2", None, "2024-04-01T00:00:00Z", "atom"),
        ]

    def test_alternate_beats_earlier_bare_link(self):
        body = """<feed xmlns="http://www.w3.org/2005/Atom"><entry>
          <link href="http://x.onion/bare"/>
          <link rel="alternate" href="http://x.onion/alt"/>
        </entry></feed>"""
        assert parse_feed_py(body)[0][0] == "http://x.onion/alt"

    def test_junk_and_nonfeed(self):
        assert parse_feed_py("junk <<<") == []
        assert parse_feed_py("<html>no</html>") == []
        assert parse_feed_py(None) == []
        assert parse_feed_py("<rss version='2.0'></rss>") == []  # no channel
        assert parse_feed_py(RSS.encode()) == parse_feed_py(RSS)


class TestReadFeeds:
    def test_normalized_and_junk_dropped(self, spark):
        bodies = spark.createDataFrame(
            [("a.onion", RSS), ("b.onion", ATOM), ("c.onion", "junk")],
            "host string, body string",
        )
        got = read_feeds(bodies).orderBy("url").toPandas()
        # X2 normalization: scheme/host lowercased (path case kept),
        # fragment stripped, whitespace-padded loc trimmed
        assert list(got["url"]) == [
            "http://ex.onion/A1", "http://ex.onion/a2",
            "http://ex.onion/b1", "http://ex.onion/b2",
        ]
        assert set(got["host"]) == {"a.onion", "b.onion"}
        assert list(got["kind"]) == ["rss", "rss", "atom", "atom"]


class TestFeedRecency:
    NOW = "2024-05-01 12:00:00"  # epoch 1714564800, UTC session

    def _run(self, spark, rows):
        df = spark.createDataFrame(
            rows, "host string, url string, title string, "
                  "published string, kind string"
        )
        out = feed_recency(df, now=self.NOW)
        return {r["url"]: (r["pub_epoch"], r["boost"])
                for r in out.collect()}

    def test_ramp_clamps_and_nulls(self, spark):
        got = self._run(spark, [
            # 1h old → 500·(604800−3600)÷604800 = 497
            ("h", "u1", None, "Wed, 01 May 2024 11:00:00 GMT", "rss"),
            # exactly now → full boost
            ("h", "u2", None, "2024-05-01T12:00:00Z", "atom"),
            # 30 days old → past the horizon → 0, epoch still parsed
            ("h", "u3", None, "2024-04-01T00:00:00Z", "atom"),
            # FUTURE-dated → clamps to full boost, not an error
            ("h", "u4", None, "Wed, 01 May 2024 13:00:00 GMT", "rss"),
            # absent / unparseable / non-UTC zone → no signal
            ("h", "u5", None, None, "rss"),
            ("h", "u6", None, "yesterday-ish", "rss"),
            ("h", "u7", None, "Wed, 01 May 2024 11:00:00 EST", "rss"),
        ])
        assert got["u1"] == (1714561200, 497)
        assert got["u2"] == (1714564800, 500)
        assert got["u3"] == (1711929600, 0)
        assert got["u4"] == (1714568400, 500)
        assert got["u5"] == (None, 0)
        assert got["u6"] == (None, 0)
        assert got["u7"] == (None, 0)

    def test_rss_zone_spellings(self, spark):
        # the UTC zone forms feeds actually emit all parse identically
        rows = [
            ("h", f"u{i}", None, f"Wed, 01 May 2024 11:00:00 {z}", "rss")
            for i, z in enumerate(["GMT", "UT", "UTC", "Z", "+0000", "+00:00"])
        ]
        got = self._run(spark, rows)
        assert all(v == (1714561200, 497) for v in got.values())

    def test_no_shuffle_in_plan(self, spark):
        df = spark.createDataFrame(
            [("h", "u", None, "2024-05-01T00:00:00Z", "atom")],
            "host string, url string, title string, "
            "published string, kind string",
        )
        plan = feed_recency(df, now=self.NOW)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan  # pure column arithmetic


class TestSeedsFromFeeds:
    def test_dedup_keeps_freshest(self, spark):
        rss_dup = """<rss version="2.0"><channel>
          <item><link>http://ex.onion/same</link>
            <pubDate>Wed, 01 May 2024 11:00:00 GMT</pubDate></item>
        </channel></rss>"""
        atom_dup = """<feed xmlns="http://www.w3.org/2005/Atom">
          <entry><link href="http://ex.onion/same"/>
            <updated>2024-04-01T00:00:00Z</updated></entry>
          <entry><link href="http://ex.onion/other"/></entry>
        </feed>"""
        from bathyscaphe_spark.sources.feeds import seeds_from_feeds

        bodies = spark.createDataFrame(
            [("a.onion", rss_dup), ("b.onion", atom_dup)],
            "host string, body string",
        )
        got = {r["url"]: r for r in
               seeds_from_feeds(bodies, now="2024-05-01 12:00:00").collect()}
        assert len(got) == 2
        # syndicated twice: the fresher (1h-old) claim wins
        assert got["http://ex.onion/same"]["boost"] == 497
        assert got["http://ex.onion/same"]["pub_epoch"] == 1714561200
        assert got["http://ex.onion/same"]["host"] == "ex.onion"
        assert got["http://ex.onion/other"]["boost"] == 0


def test_rss_one_digit_day_parses(spark):
    """RFC 822 allows 1*2DIGIT days; 'Tue, 1 Jul 2003' must parse
    instead of NULLing the recency signal (strict 'dd' rejected it)."""
    from pyspark.sql import functions as F

    from bathyscaphe_spark.sources.feeds import parse_feed_ts

    df = spark.createDataFrame(
        [("Tue, 1 Jul 2003 10:52:37 GMT", "rss"),
         ("Tue, 01 Jul 2003 10:52:37 GMT", "rss")],
        "published string, kind string",
    )
    ts = [r["ts"] for r in df.select(
        parse_feed_ts(F.col("published"), F.col("kind")).alias("ts")
    ).collect()]
    assert ts[0] is not None and ts[0] == ts[1]
