"""aimd_delay: per-host AIMD politeness-delay controller."""

from bathyscaphe_spark.operators.politeness import aimd_delay


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, round int, timeouts long")
    return {
        (r["host"], r["round"]): r["delay_ms"]
        for r in aimd_delay(df, **kw).collect()
    }


class TestAimdDelay:
    def test_backoff_doubles_to_cap(self, spark):
        rows = [("h", r, 1) for r in range(8)]
        got = _run(spark, rows, d0_ms=1000, dmax_ms=60_000)
        assert [got[("h", r)] for r in range(8)] == [
            2000, 4000, 8000, 16000, 32000, 60000, 60000, 60000
        ]

    def test_recovery_decrements_to_floor(self, spark):
        rows = [("h", 0, 1)] + [("h", r, 0) for r in range(1, 6)]
        got = _run(spark, rows, d0_ms=1000, add_ms=500, dmin_ms=400)
        # 2000 then -500 per healthy round, floored
        assert [got[("h", r)] for r in range(6)] == [
            2000, 1500, 1000, 500, 400, 400
        ]

    def test_alternation_and_round_order_not_input_order(self, spark):
        rows = [("h", 2, 0), ("h", 0, 1), ("h", 1, 0)]  # shuffled input
        got = _run(spark, rows, d0_ms=1000, add_ms=100)
        assert [got[("h", r)] for r in range(3)] == [2000, 1900, 1800]

    def test_hosts_independent(self, spark):
        rows = [("sick", 0, 5), ("fine", 0, 0)]
        got = _run(spark, rows)
        assert got[("sick", 0)] == 2000 and got[("fine", 0)] == 900

    def test_partition_invariance(self, spark):
        rows = [
            (f"h{i % 11}", r, (i * r) % 3 // 2)
            for i in range(44)
            for r in range(4)
        ]
        rows = list({(h, r): t for h, r, t in rows}.items())
        rows = [(h, r, t) for (h, r), t in rows]
        df1 = spark.createDataFrame(
            rows, "host string, round int, timeouts long"
        )
        a = sorted(map(tuple, aimd_delay(df1.repartition(1)).collect()))
        b = sorted(map(tuple, aimd_delay(df1.repartition(7)).collect()))
        assert a == b
