"""Soft-404 detection (operators/crawler.py soft404_flags)."""

from __future__ import annotations

from bathyscaphe_spark.operators.crawler import soft404_flags


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, host string, text string")
    return {
        r["url"]: (r["phrase_hit"], r["template_size"], r["soft404"])
        for r in soft404_flags(df, **kw).collect()
    }


def test_phrase_hit_flags_unique_page(spark):
    got = _run(spark, [
        ("u1", "h", "sorry, this page does not exist"),
        ("u2", "h", "a perfectly fine article"),
    ])
    assert got["u1"] == (True, 1, True)
    assert got["u2"] == (False, 1, False)


def test_phrase_free_template_flags_at_threshold(spark):
    tmpl = "oops! try the homepage instead"
    rows = [(f"u{i}", "h", tmpl) for i in range(5)]
    rows.append(("ok", "h", "unique content"))
    got = _run(spark, rows)
    assert got["u0"] == (False, 5, True)
    assert got["ok"] == (False, 1, False)


def test_template_below_threshold_not_flagged(spark):
    tmpl = "oops! try the homepage instead"
    got = _run(spark, [(f"u{i}", "h", tmpl) for i in range(4)])
    assert all(v == (False, 4, False) for v in got.values())


def test_template_counts_are_per_host(spark):
    # 3 copies on each of two hosts: neither host crosses the threshold
    tmpl = "oops! try the homepage instead"
    rows = [(f"a{i}", "ha", tmpl) for i in range(3)]
    rows += [(f"b{i}", "hb", tmpl) for i in range(3)]
    got = _run(spark, rows)
    assert all(v == (False, 3, False) for v in got.values())


def test_duplicate_url_counts_once(spark):
    tmpl = "oops! try the homepage instead"
    rows = [("same", "h", tmpl)] * 6  # one URL fetched six times
    got = _run(spark, rows)
    assert got["same"] == (False, 1, False)


def test_partition_invariance(spark):
    rows = [
        (f"u{i}", f"h{i % 3}", "page not found" if i % 4 == 0 else f"body {i % 7}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "url string, host string, text string")
    a = sorted(map(tuple, soft404_flags(df.repartition(1)).collect()))
    b = sorted(map(tuple, soft404_flags(df.repartition(9)).collect()))
    assert a == b
