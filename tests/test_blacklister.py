"""Blacklister scenarios (blacklister_test.go:52-180)."""

import datetime

from pyspark.sql import functions as F

from bathyscaphe_spark.config import CrawlConfig
from bathyscaphe_spark.operators.blacklister import (
    empty_blacklist,
    empty_host_failures,
    process_timeouts,
)

def RTS():
    return F.timestamp_seconds(F.lit(1603973049))


def _timeouts(spark, hosts):
    return spark.createDataFrame(
        [(f"https://{h}/x", h) for h in hosts], "url string, host string"
    )


def _status(spark, rows):
    return spark.createDataFrame(rows, "host string, up boolean")


def _failures(spark, rows):
    return spark.createDataFrame(
        rows, "host string, count long, expires_ts timestamp"
    )


def test_host_up_removes_counter(spark):
    # blacklister_test.go:52-78: response received ⇒ counter removed
    cfg = CrawlConfig()
    hf, bl = process_timeouts(
        _timeouts(spark, ["down.onion"]),
        _failures(spark, [("down.onion", 3, None)]),
        empty_blacklist(spark),
        _status(spark, [("down.onion", True)]),
        cfg,
        RTS(),
    )
    assert hf.where(F.col("host") == "down.onion").count() == 0
    assert bl.count() == 0


def test_below_threshold_counts_only(spark):
    # blacklister_test.go:80-111: 0 → 1, no blacklisting
    cfg = CrawlConfig(blacklist_threshold=10)
    hf, bl = process_timeouts(
        _timeouts(spark, ["down.onion"]),
        empty_host_failures(spark),
        empty_blacklist(spark),
        _status(spark, [("down.onion", False)]),
        cfg,
        RTS(),
    )
    row = hf.head()
    assert (row["host"], row["count"]) == ("down.onion", 1)
    assert row["expires_ts"] is not None  # TTL set (blacklister.go:184-186)
    assert bl.count() == 0


def test_threshold_crossing_blacklists(spark):
    # blacklister_test.go:113-157: 9 + 1 ⇒ blacklist at threshold 10
    cfg = CrawlConfig(blacklist_threshold=10)
    hf, bl = process_timeouts(
        _timeouts(spark, ["down.onion"]),
        _failures(spark, [("down.onion", 9, None)]),
        empty_blacklist(spark),
        _status(spark, [("down.onion", False)]),
        cfg,
        RTS(),
    )
    assert hf.head()["count"] == 10
    assert [r["hostname"] for r in bl.collect()] == ["down.onion"]


def test_already_blacklisted_skipped(spark):
    # blacklister_test.go:159-180 / F7: exact-equality guard
    cfg = CrawlConfig(blacklist_threshold=1)
    blacklist = spark.createDataFrame([("down.onion",)], "hostname string")
    hf, bl = process_timeouts(
        _timeouts(spark, ["down.onion"]),
        empty_host_failures(spark),
        blacklist,
        _status(spark, [("down.onion", False)]),
        cfg,
        RTS(),
    )
    assert hf.count() == 0  # event dropped before counting
    assert bl.count() == 1  # unchanged


def test_expired_counter_restarts(spark):
    # Redis TTL expiry: counter past expires_ts resets to zero first
    cfg = CrawlConfig(blacklist_threshold=10)
    expired = datetime.datetime(2019, 1, 1)
    hf, bl = process_timeouts(
        _timeouts(spark, ["down.onion"]),
        _failures(spark, [("down.onion", 9, expired)]),
        empty_blacklist(spark),
        _status(spark, [("down.onion", False)]),
        cfg,
        RTS(),
    )
    assert hf.head()["count"] == 1
    assert bl.count() == 0


def test_batch_counts_per_round(spark):
    # batch semantics: 5 confirmed timeout events in one round count 5
    cfg = CrawlConfig(blacklist_threshold=5)
    hf, bl = process_timeouts(
        _timeouts(spark, ["down.onion"] * 5),
        empty_host_failures(spark),
        empty_blacklist(spark),
        _status(spark, [("down.onion", False)]),
        cfg,
        RTS(),
    )
    assert hf.head()["count"] == 5
    assert [r["hostname"] for r in bl.collect()] == ["down.onion"]
