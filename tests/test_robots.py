"""robots.txt parser (operators/robots.py)."""

from bathyscaphe_spark.operators.robots import parse_robots_py


def test_parse_star_group_with_comments_and_allow():
    txt = (
        "User-agent: googlebot\nDisallow: /gb\n\n"
        "User-agent: *\n# policy\nDisallow: /a\nAllow: /pub\nDisallow: /b\n"
    )
    assert parse_robots_py(txt) == ["/a", "/b"]
    # named agent collects its own group AND the '*' group
    assert parse_robots_py(txt, agent="GoogleBot") == ["/gb", "/a", "/b"]


def test_parse_shared_group_and_empty_disallow():
    txt = "User-agent: a\nUser-agent: *\nDisallow:\nDisallow: /x\n"
    assert parse_robots_py(txt) == ["/x"]
    assert parse_robots_py("") == []
    assert parse_robots_py("User-agent: other\nDisallow: /y\n") == []


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
