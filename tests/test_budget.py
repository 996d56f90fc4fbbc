"""allocate_budget: largest-remainder fetch-budget apportionment."""

from pyspark.sql import functions as F

from bathyscaphe_spark.operators.politeness import allocate_budget


def _run(spark, rows, budget, **kw):
    df = spark.createDataFrame(rows, "host string, pending long, weight long")
    return {
        r["host"]: (r["quota"], r["uncapped"])
        for r in allocate_budget(df, budget, **kw).collect()
    }


class TestAllocateBudget:
    def test_hand_computed_hamilton(self, spark):
        # W=17; base = floor(10*w/17): a2 b1 c1 d4 (sum 8, leftover 2)
        # remainders 16,13,3,2 -> +1 to a and b; d clamps to pending 2
        got = _run(
            spark,
            [("a", 100, 5), ("b", 100, 3), ("c", 100, 2), ("d", 2, 7),
             ("e", 0, 9), ("f", 100, 0)],
            10,
        )
        assert got == {
            "a": (3, 3), "b": (2, 2), "c": (1, 1), "d": (2, 4),
            "e": (0, 0), "f": (0, 0),
        }

    def test_uncapped_sums_to_budget_exactly(self, spark):
        rows = [(f"h{i:03d}", 10**6, (i * 37) % 11 + 1) for i in range(100)]
        got = _run(spark, rows, 997)
        assert sum(u for _q, u in got.values()) == 997

    def test_no_long_overflow_at_huge_weights(self, spark):
        # B*w ~ 1e21 > int64 max: must stay exact in DECIMAL
        rows = [(f"h{i}", 10**9, 10**12 + i) for i in range(5)]
        got = _run(spark, rows, 10**9)
        assert sum(u for _q, u in got.values()) == 10**9
        # near-equal weights -> near-equal shares
        assert max(u for _q, u in got.values()) - min(
            u for _q, u in got.values()
        ) <= 1

    def test_max_per_host_clamps_quota_not_uncapped(self, spark):
        got = _run(spark, [("a", 100, 9), ("b", 100, 1)], 10, max_per_host=5)
        assert got["a"] == (5, 9) and got["b"] == (1, 1)

    def test_remainder_tie_breaks_by_host_asc(self, spark):
        # equal weights, budget not divisible: leftover goes to the
        # lexicographically smallest hosts
        got = _run(spark, [("x", 9, 1), ("y", 9, 1), ("z", 9, 1)], 7)
        assert got == {"x": (3, 3), "y": (2, 2), "z": (2, 2)}

    def test_partition_invariance(self, spark):
        rows = [(f"h{i}", (i % 7) + 1, (i * 13) % 19 + 1) for i in range(60)]
        df1 = spark.createDataFrame(rows, "host string, pending long, weight long")
        a = sorted(map(tuple, allocate_budget(df1.repartition(1), 53).collect()))
        b = sorted(map(tuple, allocate_budget(df1.repartition(7), 53).collect()))
        assert a == b


def test_quotas_feed_rank_frontier(spark):
    """allocate_budget -> rank_frontier composition: the apportioned
    quota IS the per-host budget (lowering the config cap)."""
    import datetime as dt

    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.operators.politeness import rank_frontier

    t0 = dt.datetime(2020, 1, 1)
    frontier = spark.createDataFrame(
        [
            (f"http://{h}/p{i}", hash((h, i)), h, 1, 0, t0)
            for h in ("big.onion", "small.onion")
            for i in range(20)
        ],
        "url string, url_hash long, host string, depth int,"
        " priority int, discovered_ts timestamp",
    )
    stats = spark.createDataFrame(
        [("big.onion", 20, 9), ("small.onion", 20, 1)],
        "host string, pending long, weight long",
    )
    quotas = allocate_budget(stats, 10).selectExpr("host", "quota AS budget")
    cfg = CrawlConfig(per_host_budget=50)
    out = rank_frontier(frontier, cfg, host_budgets=quotas)
    counts = {
        r["host"]: r["n"]
        for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"big.onion": 9, "small.onion": 1}


class TestRetryAfter:
    def _run(self, spark, rows, period=60, parts=3):
        from bathyscaphe_spark.operators.politeness import retry_after_budgets

        df = spark.createDataFrame(
            rows, "host string, status int, headers map<string,string>"
        )
        return {
            r.host: r.budget
            for r in retry_after_budgets(df.repartition(parts), period).collect()
        }

    def test_parse_rules(self, spark):
        got = self._run(spark, [
            ("h1", 503, {"Retry-After": "30"}),
            ("h1", 503, {"Retry-After": "10"}),   # strictest (max) wins
            ("h2", 429, {"retry-after": "7"}),    # lowercase casing
            ("h3", 200, {"Retry-After": "100"}),  # 200: advisory, ignored
            ("h4", 503, {"Retry-After": "Fri, 01 Jan 2027 00:00:00 GMT"}),
            ("h5", 503, {}),                      # absent
            ("h6", 503, {"Retry-After": "0"}),    # zero: ignored
            ("h7", 503, {"Retry-After": "600"}),  # huge: floor at 1
        ])
        assert got == {"h1": 2, "h2": 8, "h7": 1}

    def test_partition_invariance(self, spark):
        rows = [
            (f"h{i % 5}", 503 if i % 2 else 429,
             {"Retry-After": str(1 + i % 13)})
            for i in range(40)
        ]
        assert self._run(spark, rows, parts=1) == self._run(spark, rows, parts=11)


class TestMergeHostBudgets:
    """Strictest-wins merge of independent politeness signals."""

    def test_min_wins_and_nulls_skip(self, spark):
        from bathyscaphe_spark.operators.politeness import merge_host_budgets

        a = spark.createDataFrame([("h1", 10), ("h2", 5)], "host string, budget long")
        b = spark.createDataFrame([("h1", 3), ("h3", 7)], "host string, budget long")
        got = {r["host"]: (r["a_budget"], r["b_budget"], r["effective_budget"])
               for r in merge_host_budgets(a=a, b=b).collect()}
        assert got == {"h1": (10, 3, 3), "h2": (5, None, 5), "h3": (None, 7, 7)}

    def test_single_source_and_empty_raises(self, spark):
        import pytest as _pytest

        from bathyscaphe_spark.operators.politeness import merge_host_budgets

        a = spark.createDataFrame([("h1", 4)], "host string, budget long")
        got = merge_host_budgets(only=a).collect()
        assert got[0]["effective_budget"] == 4
        with _pytest.raises(ValueError):
            merge_host_budgets()


class TestRetryAfterDates:
    """IMF-fixdate Retry-After with the replayable now clock."""

    def test_date_form_and_guards(self, spark):
        from bathyscaphe_spark.operators.politeness import retry_after_budgets

        rows = [
            ("h1", 503, {"Retry-After": "30"}),
            ("h2", 503, {"Retry-After": "Wed, 01 May 2024 12:02:00 GMT"}),
            ("h3", 503, {"Retry-After": "Mon, 06 May 2019 00:00:00 GMT"}),
            ("h4", 200, {"Retry-After": "Wed, 01 May 2024 12:02:00 GMT"}),
            ("h5", 503, {"Retry-After": "not a date"}),
        ]
        df = spark.createDataFrame(
            rows, "host string, status int, headers map<string,string>"
        )
        got = dict(map(tuple, retry_after_budgets(
            df, 60, now="2024-05-01 12:00:00").collect()))
        # h2: 120s away -> budget 1; h1 delta still parses; past/200/bad drop
        assert got == {"h1": 2, "h2": 1}
        # without a clock the date form is conservatively ignored
        got2 = dict(map(tuple, retry_after_budgets(df, 60).collect()))
        assert got2 == {"h1": 2}


# --- domain host-explosion guard ------------------------------------------------

from bathyscaphe_spark.operators.politeness import host_explosion_guard


def _frontier(spark, hosts):
    return spark.createDataFrame(
        [(h, i) for i, h in enumerate(hosts)], "host string, url_hash long"
    )


def test_host_explosion_cuts_minted_tail(spark):
    # spam.com mints 8 subdomains with 1 URL each; big.com has 2 honest
    # subdomains with real mass — max_hosts=3 keeps all of big.com and
    # only 3 of spam.com's tail (host-asc ties)
    hosts = [f"x{i}.spam.com" for i in range(8)]
    hosts += ["www.big.com"] * 5 + ["img.big.com"] * 2
    out = {
        r["host"]: (r["registered_domain"], r["n_urls"], r["host_rank"], r["kept"])
        for r in host_explosion_guard(_frontier(spark, hosts), max_hosts=3).collect()
    }
    assert out["www.big.com"] == ("big.com", 5, 1, True)
    assert out["img.big.com"] == ("big.com", 2, 2, True)
    spam = sorted(h for h in out if h.endswith("spam.com"))
    kept = [h for h in spam if out[h][3]]
    assert kept == ["x0.spam.com", "x1.spam.com", "x2.spam.com"]
    assert sum(1 for h in spam if not out[h][3]) == 5


def test_host_explosion_mass_outranks_name(spark):
    hosts = ["zzz.d.com"] * 4 + ["aaa.d.com"]
    out = {
        r["host"]: r["host_rank"]
        for r in host_explosion_guard(_frontier(spark, hosts), max_hosts=1).collect()
    }
    assert out["zzz.d.com"] == 1 and out["aaa.d.com"] == 2


def test_host_explosion_multilabel_suffix(spark):
    # a.site.co.uk and b.site.co.uk share eTLD+1 site.co.uk
    hosts = ["a.site.co.uk", "b.site.co.uk", "c.other.co.uk"]
    out = {
        r["host"]: r["registered_domain"]
        for r in host_explosion_guard(_frontier(spark, hosts), max_hosts=9).collect()
    }
    assert out["a.site.co.uk"] == "site.co.uk" == out["b.site.co.uk"]
    assert out["c.other.co.uk"] == "other.co.uk"
