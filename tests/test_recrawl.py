"""Adaptive recrawl scheduling (operators/recrawl.py)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from bathyscaphe_spark.operators.recrawl import recrawl_priority


def _ts(s):
    return datetime.fromtimestamp(1714564800 + s, tz=timezone.utc).replace(tzinfo=None)


def _caps(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(t), h) for u, t, h in rows],
        "url string, warc_ts timestamp, content_hash string",
    )


def test_change_counting_and_due_score(spark):
    rows = [
        # u1: changes at every revisit (3 caps, 2 changes over 200s)
        ("u1", 0, "a"), ("u1", 100, "b"), ("u1", 200, "c"),
        # u2: never changes (3 caps, 0 changes)
        ("u2", 0, "x"), ("u2", 100, "x"), ("u2", 200, "x"),
        # u3: single capture
        ("u3", 500, "y"),
    ]
    got = {r.url: r for r in recrawl_priority(_caps(spark, rows), horizon_s=100).collect()}
    # now = max_ts(500) + 100 = 600
    assert (got["u1"].n_caps, got["u1"].n_changes, got["u1"].span_s, got["u1"].age_s) == (3, 2, 200, 400)
    assert got["u1"].due_milli == 1000 * 400 * 2 // 200  # 4000
    assert (got["u2"].n_changes, got["u2"].due_milli) == (0, 0)
    assert (got["u3"].n_caps, got["u3"].span_s, got["u3"].due_milli) == (1, 0, 0)


def test_out_of_order_arrival_is_ts_ordered(spark):
    """Change detection orders by event time, not arrival order: the
    same captures shuffled give the same change count."""
    rows = [("u", 200, "b"), ("u", 0, "a"), ("u", 100, "b"), ("u", 300, "a")]
    got = recrawl_priority(_caps(spark, rows)).collect()[0]
    # a -> b (change), b -> b (no), b -> a (change)
    assert (got.n_caps, got.n_changes) == (4, 2)


def test_partitioning_invariance(spark):
    rows = [(f"u{i % 13}", i * 10, f"h{(i * 3) % 4}") for i in range(400)]
    a = sorted(map(tuple, recrawl_priority(_caps(spark, rows)).collect()))
    b = sorted(map(tuple, recrawl_priority(_caps(spark, rows).repartition(17)).collect()))
    assert a == b


def test_single_shuffle_plan(spark):
    """The lag window and the per-url aggregation must share ONE
    hash(url) exchange; `now` attaches by broadcast, not shuffle."""
    rows = [(f"u{i % 5}", i * 10, f"h{i % 2}") for i in range(50)]
    plan = (
        recrawl_priority(_caps(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
    assert shuffles == 1, plan


class TestConditionalFetch:
    def test_validator_hierarchy_and_latest_pick(self, spark):
        import datetime

        from bathyscaphe_spark.operators.recrawl import conditional_fetch_plan

        rows = [
            ("u1", datetime.datetime(2024, 1, 1), {"ETag": '"abc"'}),
            # latest capture wins; weak etag kept verbatim; etag
            # outranks last-modified on the same response
            ("u1", datetime.datetime(2024, 1, 2),
             {"etag": 'W/"xyz"', "Last-Modified": "Mon, 01 Jan 2024 00:00:00 GMT"}),
            ("u2", datetime.datetime(2024, 1, 1),
             {"last-modified": "Tue, 02 Jan 2024 00:00:00 GMT"}),
            ("u3", datetime.datetime(2024, 1, 1), {}),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, headers map<string,string>"
        )
        got = {
            r.url: (r.validator, r.cond_header, r.cond_value, r.n_captures)
            for r in conditional_fetch_plan(df.repartition(3)).collect()
        }
        assert got["u1"] == ("etag", "If-None-Match", 'W/"xyz"', 2)
        assert got["u2"] == (
            "last-modified", "If-Modified-Since",
            "Tue, 02 Jan 2024 00:00:00 GMT", 1,
        )
        assert got["u3"] == (None, None, None, 1)

    def test_partition_invariance(self, spark):
        import datetime

        from bathyscaphe_spark.operators.recrawl import conditional_fetch_plan

        rows = [
            (f"u{i % 7}", datetime.datetime(2024, 1, 1 + i % 20),
             {"ETag": f'"{i % 3}"'} if i % 2 else {})
            for i in range(50)
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, headers map<string,string>"
        )
        a = {r.url: r.cond_value
             for r in conditional_fetch_plan(df.repartition(1)).collect()}
        b = {r.url: r.cond_value
             for r in conditional_fetch_plan(df.repartition(11)).collect()}
        assert a == b


class TestRevalidationMerge:
    """304 carry-forward — the response half of conditional refetch."""

    def test_matrix(self, spark):
        from bathyscaphe_spark.operators.recrawl import revalidation_merge

        store = spark.createDataFrame(
            [("u1", 1, "old-v1"), ("u1", 2, "old-v2"), ("u2", 1, "kept")],
            "url string, t long, html string",
        ).selectExpr("url", "to_timestamp(t) AS warc_ts", "html")
        resp = spark.createDataFrame(
            [("u1", 304, None), ("u2", 200, "new"), ("u3", 304, None),
             ("u2b", 500, None)],
            "url string, status int, html string",
        )
        got = {r["url"]: (r["effective_html"], r["source"], r["bytes_saved"])
               for r in revalidation_merge(store, resp).collect()}
        assert got["u1"] == ("old-v2", "cache", 6)   # LATEST capture
        assert got["u2"] == ("new", "fresh", 0)
        assert got["u3"] == (None, "none", 0)        # 304 w/o store
        assert got["u2b"] == (None, "none", 0)       # error


def test_latest_capture_tie_determinism(spark):
    """Equal-timestamp captures must pick deterministically at any
    partitioning (content-derived tie key, not the partition column)."""
    from bathyscaphe_spark.operators.recrawl import (
        conditional_fetch_plan,
        revalidation_merge,
    )

    store = spark.createDataFrame(
        [("u", 5, "body-A"), ("u", 5, "body-B"), ("u", 5, "body-C")],
        "url string, t long, html string",
    ).selectExpr("url", "to_timestamp(t) AS warc_ts", "html")
    resp = spark.createDataFrame([("u", 304, None)],
                                 "url string, status int, html string")
    picks = {
        revalidation_merge(store.repartition(n), resp).collect()[0]["effective_html"]
        for n in (1, 3, 7)
    }
    assert len(picks) == 1  # same pick at every parallelism

    caps = spark.createDataFrame(
        [("u", 5, {"ETag": '"e1"'}), ("u", 5, {"ETag": '"e2"'})],
        "url string, t long, headers map<string,string>",
    ).selectExpr("url", "to_timestamp(t) AS warc_ts", "headers")
    vals = {
        conditional_fetch_plan(caps.repartition(n)).collect()[0]["cond_value"]
        for n in (1, 4)
    }
    assert len(vals) == 1


# --- RFC 9111 cache freshness -------------------------------------------------

from bathyscaphe_spark.operators.recrawl import cache_policy

_D = "Wed, 01 May 2024 12:00:00 GMT"


def _hp(spark, rows):
    df = spark.createDataFrame(rows, "url string, headers map<string,string>")
    return {
        r["url"]: (r["policy"], r["freshness_s"])
        for r in cache_policy(df, heuristic_pct=10).collect()
    }


def test_cache_policy_precedence_matrix(spark):
    got = _hp(spark, [
        ("u1", {"Cache-Control": "no-store"}),
        ("u2", {"cache-control": "public, no-cache", "Date": _D}),
        ("u3", {"Cache-Control": "max-age=3600"}),
        ("u4", {"Cache-Control": "no-cache, max-age=600"}),          # 1 beats 2
        ("u5", {"Date": _D, "Expires": "Wed, 01 May 2024 12:10:00 GMT"}),
        ("u6", {"Date": _D, "Expires": "Wed, 01 May 2024 11:00:00 GMT"}),  # past
        ("u7", {"Date": _D, "Expires": "soon",                        # malformed
                "Last-Modified": "Wed, 01 May 2024 11:00:00 GMT"}),
        ("u8", {"date": _D, "last-modified": "Tue, 30 Apr 2024 12:00:00 GMT"}),
        ("u9", {"Content-Type": "text/html"}),
        ("u10", {"Cache-Control": "max-age=0, must-revalidate"}),
    ])
    assert got["u1"] == ("no-cache", 0)
    assert got["u2"] == ("no-cache", 0)
    assert got["u3"] == ("max-age", 3600)
    assert got["u4"] == ("no-cache", 0)
    assert got["u5"] == ("expires", 600)
    assert got["u6"] == ("expires", 0)
    assert got["u7"] == ("heuristic", 360)      # 3600s age * 10%
    assert got["u8"] == ("heuristic", 8640)     # 86400s * 10%
    assert got["u9"] == ("default", None)
    assert got["u10"] == ("max-age", 0)


def test_cache_policy_directive_boundaries(spark):
    # "no-cache-xyz" is NOT the no-cache directive; "s-maxage" is not
    # max-age (private-cache reading); extension "max-age" must match
    # only at a directive boundary
    got = _hp(spark, [
        ("u1", {"Cache-Control": "no-cache-xyz, max-age=100"}),
        ("u2", {"Cache-Control": "s-maxage=50"}),
        ("u3", {"Cache-Control": "public,max-age=7"}),
    ])
    assert got["u1"] == ("max-age", 100)
    assert got["u2"] == ("default", None)
    assert got["u3"] == ("max-age", 7)


def test_cache_policy_default_ttl(spark):
    df = spark.createDataFrame(
        [("u", {"X": "y"})], "url string, headers map<string,string>"
    )
    r = cache_policy(df, default_ttl_s=1234).collect()[0]
    assert (r["policy"], r["freshness_s"]) == ("default", 1234)


# --- refresh plan fusion ------------------------------------------------------

from bathyscaphe_spark.operators.recrawl import refresh_plan


def test_refresh_plan_precedence_and_floor(spark):
    latest = spark.createDataFrame(
        [("a", 100), ("b", 200), ("c", 300), ("d", 400)],
        "url string, fetch_epoch long",
    )
    adaptive = spark.createDataFrame([("a", 5000)], "url string, interval_s long")
    sitemap = spark.createDataFrame(
        [("a", 9000), ("b", 7000)], "url string, interval_s long"
    )
    cache = spark.createDataFrame(
        [("b", 86400), ("c", 50)], "url string, freshness_s long"
    )
    got = {
        r["url"]: (r["source"], r["interval_s"], r["floor_s"],
                   r["eff_interval_s"], r["next_fetch_epoch"])
        for r in refresh_plan(
            latest, adaptive, sitemap, cache,
            default_interval_s=10000, min_interval_s=3600,
        ).collect()
    }
    assert got["a"] == ("adaptive", 5000, 0, 5000, 5100)    # observed wins
    assert got["b"] == ("sitemap", 7000, 86400, 86400, 86600)  # floor binds
    assert got["c"] == ("default", 10000, 50, 10000, 10300)
    assert got["d"] == ("default", 10000, 0, 10000, 10400)


def test_refresh_plan_min_interval_clamp(spark):
    latest = spark.createDataFrame([("a", 0)], "url string, fetch_epoch long")
    adaptive = spark.createDataFrame([("a", 10)], "url string, interval_s long")
    r = refresh_plan(latest, adaptive, None, None, min_interval_s=3600).collect()[0]
    assert (r["source"], r["eff_interval_s"]) == ("adaptive", 3600)


def test_refresh_plan_no_side_tables(spark):
    latest = spark.createDataFrame([("a", 7)], "url string, fetch_epoch long")
    r = refresh_plan(latest, default_interval_s=1234, min_interval_s=1).collect()[0]
    assert (r["source"], r["interval_s"], r["next_fetch_epoch"]) == (
        "default", 1234, 1241,
    )
