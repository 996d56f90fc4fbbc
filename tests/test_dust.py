"""DUST parameter mining (functions/urltools.py dust_param_evidence)."""

from __future__ import annotations

from bathyscaphe_spark.functions.urltools import dust_param_evidence


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url string, content_hash string")
    return {
        r["param"]: (
            r["evidence_groups"],
            r["collapsible_urls"],
            r["violating_groups"],
            r["removable"],
        )
        for r in dust_param_evidence(df).collect()
    }


def test_session_param_mined_as_removable(spark):
    rows = [
        ("http://a/p?id=1&sess=x", "c1"),
        ("http://a/p?id=1&sess=y", "c1"),
        ("http://a/p?id=2&sess=x", "c2"),
        ("http://a/p?id=2&sess=z", "c2"),
    ]
    got = _run(spark, rows)
    # sess: two evidence groups (id=1 and id=2), one collapsible URL each
    assert got["sess"] == (2, 2, 0, True)
    # id: removing it merges different-content URLs -> violations, kept
    assert got["id"][2] > 0 and not got["id"][3]


def test_param_order_is_canonicalized(spark):
    # same params in different order must land in one residual group
    rows = [
        ("http://a/p?b=2&sess=x&a=1", "c1"),
        ("http://a/p?a=1&b=2&sess=y", "c1"),
    ]
    got = _run(spark, rows)
    assert got["sess"] == (1, 1, 0, True)


def test_single_urls_are_no_evidence(spark):
    rows = [("http://a/p?x=1", "c1"), ("http://b/q?x=2", "c2")]
    assert _run(spark, rows) == {}


def test_mixed_evidence_and_violation_not_removable(spark):
    rows = [
        ("http://a/p?k=1", "same"),
        ("http://a/p?k=2", "same"),
        ("http://a/q?k=1", "c1"),
        ("http://a/q?k=2", "c2"),
    ]
    got = _run(spark, rows)
    assert got["k"] == (1, 1, 1, False)


def test_partition_invariance(spark):
    rows = [
        (f"http://h{i % 3}/p{i % 5}?page={i % 2}&s=s{i}", f"c{i % 5}-{i % 2}")
        for i in range(40)
    ]
    df1 = spark.createDataFrame(rows, "url string, content_hash string")
    a = sorted(map(tuple, dust_param_evidence(df1.repartition(1)).collect()))
    b = sorted(map(tuple, dust_param_evidence(df1.repartition(9)).collect()))
    assert a == b


class TestDustApply:
    def _run(self, spark, urls, removable):
        from bathyscaphe_spark.functions.urltools import dust_apply

        pages = spark.createDataFrame([(u,) for u in urls], "url string")
        rem = spark.createDataFrame([(p,) for p in removable], "param string")
        return {
            r["url"]: r["canonical_url"]
            for r in dust_apply(pages, rem).collect()
        }

    def test_removes_mined_params_keeps_order(self, spark):
        got = self._run(
            spark,
            ["http://h/p?sessionid=a&page=2&ref=x"],
            ["sessionid", "ref"],
        )
        assert got == {"http://h/p?sessionid=a&page=2&ref=x": "http://h/p?page=2"}

    def test_all_removed_drops_question_mark(self, spark):
        got = self._run(spark, ["http://h/p?sid=1", "http://h/p"], ["sid"])
        assert got == {"http://h/p?sid=1": "http://h/p", "http://h/p": "http://h/p"}

    def test_duplicate_rows_do_not_double_params(self, spark):
        urls = ["http://h/p?sid=1&a=1&b=2"] * 3
        got_rows = self._run(spark, urls, ["sid"])
        assert got_rows == {"http://h/p?sid=1&a=1&b=2": "http://h/p?a=1&b=2"}
        from bathyscaphe_spark.functions.urltools import dust_apply

        pages = spark.createDataFrame([(u,) for u in urls], "url string")
        rem = spark.createDataFrame([("sid",)], "param string")
        assert dust_apply(pages, rem).count() == 3  # cardinality preserved

    def test_repeated_surviving_param_kept_verbatim(self, spark):
        got = self._run(spark, ["http://h/q?page=1&page=1&sid=z"], ["sid"])
        assert got == {"http://h/q?page=1&page=1&sid=z": "http://h/q?page=1&page=1"}

    def test_empty_rule_set_is_identity(self, spark):
        urls = ["http://h/p?a=1", "http://h/p"]
        got = self._run(spark, urls, [])
        assert got == {u: u for u in urls}

    def test_mine_then_apply_collapses_planted_dust(self, spark):
        """End-to-end loop: evidence mining finds sessionid removable,
        application collapses its variants onto one canonical key."""
        from bathyscaphe_spark.functions.urltools import (
            dust_apply,
            dust_param_evidence,
        )

        pages = spark.createDataFrame(
            [(f"http://h/p?page={i % 2}&sessionid=s{i}", f"c{i % 2}")
             for i in range(8)],
            "url string, content_hash string",
        )
        rem = dust_param_evidence(pages).where("removable").select("param")
        out = dust_apply(pages.select("url").distinct(), rem)
        canons = {r["canonical_url"] for r in out.collect()}
        assert canons == {"http://h/p?page=0", "http://h/p?page=1"}


class TestPathTemplates:
    """URL path-template mining (path_template_stats / _filter)."""

    def _stats(self, spark, rows, parts=3, **kw):
        from bathyscaphe_spark.functions.urltools import path_template_stats

        df = spark.createDataFrame(rows, "url string, content_hash string")
        out = path_template_stats(df.repartition(parts), **kw).collect()
        return {(r.host, r.template): r.asDict() for r in out}

    def test_trap_vs_healthy_vs_sparse(self, spark):
        rows = (
            [(f"http://t.ex/cal/{2000 + i}/d/{i % 7}", "SAME") for i in range(20)]
            + [(f"http://b.ex/post/{i}", f"h{i}") for i in range(20)]
            + [("http://b.ex/about", "habout")] * 3
        )
        got = self._stats(spark, rows)
        assert got[("t.ex", "/cal/N/d/N")]["trap"] is True
        assert got[("t.ex", "/cal/N/d/N")]["n_urls"] == 20
        assert got[("t.ex", "/cal/N/d/N")]["n_content"] == 1
        assert got[("b.ex", "/post/N")]["trap"] is False
        assert got[("b.ex", "/post/N")]["div_pm"] == 1000
        # repeated captures of one URL: below min_urls, never a trap
        assert got[("b.ex", "/about")]["n_urls"] == 1
        assert got[("b.ex", "/about")]["trap"] is False

    def test_thresholds_bind_exactly(self, spark):
        # 8 urls / 2 contents = 250‰: trap at the default boundary
        rows = [(f"http://s.ex/i/{i}", f"c{i % 2}") for i in range(8)]
        got = self._stats(spark, rows)
        assert got[("s.ex", "/i/N")]["div_pm"] == 250
        assert got[("s.ex", "/i/N")]["trap"] is True
        # one fewer URL: under min_urls, not a trap however degenerate
        got7 = self._stats(spark, rows[:7])
        assert got7[("s.ex", "/i/N")]["trap"] is False
        # one more distinct content: 375‰ > 250‰, not a trap
        rows3 = [(f"http://s.ex/i/{i}", f"c{i % 3}") for i in range(8)]
        assert self._stats(spark, rows3)[("s.ex", "/i/N")]["trap"] is False

    def test_filter_drops_only_trap_templates(self, spark):
        from bathyscaphe_spark.functions.urltools import (
            path_template_filter,
            path_template_stats,
        )

        rows = [(f"http://t.ex/cal/{i}", "SAME") for i in range(10)] + [
            (f"http://b.ex/post/{i}", f"h{i}") for i in range(10)
        ]
        df = spark.createDataFrame(rows, "url string, content_hash string")
        t = path_template_stats(df)
        kept = path_template_filter(df, t).collect()
        assert len(kept) == 10
        assert all(r.url.startswith("http://b.ex/") for r in kept)
        assert sorted(r.url for r in kept) == sorted(
            u for u, _ in rows if u.startswith("http://b.ex/")
        )

    def test_partition_invariance(self, spark):
        rows = [
            (f"http://h{i % 4}.ex/p/{i}/x/{i % 9}", f"c{i % 5}")
            for i in range(60)
        ]
        assert self._stats(spark, rows, parts=1) == self._stats(
            spark, rows, parts=13
        )
