"""Retrieval over resources (operators/search.py) — the query surface of
the reference's ES `resources` index (elastic.go:13-56)."""

from bathyscaphe_spark.operators.search import keyword_search


def _resources(spark):
    rows = [
        ("u1", "alpha beta", "alpha alpha gamma"),
        ("u2", "gamma delta", "alpha beta alpha beta"),
        ("u3", "nothing here", "none of the terms"),
        ("u4", "alpha", "beta"),
    ]
    return spark.createDataFrame(rows, "url string, title string, body string")


def test_scoring_and_order(spark):
    out = keyword_search(
        _resources(spark), ["alpha", "beta"], phrase="alpha beta", k=10
    ).collect()
    got = {r.url: r.score for r in out}
    # u1: title 3*(1+1)... alpha=1,beta=1 -> 3*2=6; body alpha=2 -> 2; phrase 0 => 8
    # u2: title 0; body alpha=2 beta=2 -> 4; phrase "alpha beta" x2 -> 20 => 24
    # u4: title alpha 3; body beta 1 => 4
    assert got == {"u1": 8, "u2": 24, "u4": 4}
    assert [r.url for r in out] == ["u2", "u1", "u4"]  # score desc, url asc


def test_zero_score_excluded_and_word_boundary(spark):
    rows = [("u1", "alphabet", "betamax soup")]  # substrings must NOT match
    df = spark.createDataFrame(rows, "url string, title string, body string")
    assert keyword_search(df, ["alpha", "beta"], k=5).count() == 0


def test_topk_is_take_ordered(spark):
    plan = keyword_search(
        _resources(spark), ["alpha"], k=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
