"""Frontier drain forecast (operators/politeness.py drain_forecast)."""

from __future__ import annotations

from bathyscaphe_spark.config import CrawlConfig
from bathyscaphe_spark.operators.politeness import drain_forecast


def _frontier(spark, host_counts):
    rows = [
        (f"https://{h}/p{i}", h) for h, n in host_counts.items() for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, host string")


def _collect(df):
    return {
        r["round"]: (r["hosts_active"], r["urls_fetched"], r["backlog_after"])
        for r in df.collect()
    }


def test_hand_computed_forecast(spark):
    # budget 3: a=7 urls -> rounds 3,3,1; b=2 -> 2; c=3 -> 3
    f = _frontier(spark, {"a": 7, "b": 2, "c": 3})
    got = _collect(drain_forecast(f, CrawlConfig(per_host_budget=3)))
    assert got == {
        1: (3, 3 + 2 + 3, 4 + 0 + 0),
        2: (1, 3, 1),
        3: (1, 1, 0),
    }


def test_budget_overlay_lowers_never_raises(spark):
    f = _frontier(spark, {"slow": 4, "fast": 4})
    budgets = spark.createDataFrame(
        [("slow", 1), ("fast", 100)], "host string, budget long"
    )
    got = _collect(drain_forecast(f, CrawlConfig(per_host_budget=4), budgets))
    # slow drains 1/round over 4 rounds; fast is clamped to the cap (4)
    assert got == {
        1: (2, 1 + 4, 3),
        2: (1, 1, 2),
        3: (1, 1, 1),
        4: (1, 1, 0),
    }


def test_totals_conserved_and_partition_invariant(spark):
    f = _frontier(spark, {f"h{i}": (i % 5) + 1 for i in range(40)})
    cfg = CrawlConfig(per_host_budget=2)
    a = sorted(map(tuple, drain_forecast(f.repartition(1), cfg).collect()))
    b = sorted(map(tuple, drain_forecast(f.repartition(9), cfg).collect()))
    assert a == b
    total_urls = sum((i % 5) + 1 for i in range(40))
    assert sum(r[2] for r in a) == total_urls  # every URL fetched exactly once
    assert a[-1][3] == 0  # final round leaves no backlog
