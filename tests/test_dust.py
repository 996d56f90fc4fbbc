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
