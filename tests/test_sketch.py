"""Count-min sketch: one-sided guarantee, mergeability, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bathyscaphe_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    heavy_hitters,
)


def _skewed(spark, n=2000):
    # 3 hot keys (~75% of mass) + a 50-key tail — the mega-host shape.
    return spark.range(n).selectExpr(
        "CASE WHEN id % 4 < 3 THEN 'hot' || CAST(id % 3 AS STRING) "
        "ELSE 'tail' || CAST(id % 50 AS STRING) END AS host"
    )


class TestCms:
    def test_estimate_never_underestimates(self, spark):
        df = _skewed(spark)
        sketch = cms_build(df, "host")
        est = cms_estimate(sketch, df.select("host").distinct(), "host")
        exact = df.groupBy("host").count()
        bad = (
            est.join(exact, "host")
            .where(F.col("est") < F.col("count"))
            .count()
        )
        assert bad == 0

    def test_grid_mass_per_row_is_n(self, spark):
        df = _skewed(spark, 500)
        rows = (
            cms_build(df, "host")
            .groupBy("row")
            .agg(F.sum("cnt").alias("mass"))
            .collect()
        )
        assert len(rows) == 4
        assert all(r["mass"] == 500 for r in rows)

    def test_merge_by_cell_sum(self, spark):
        """Grid over the whole == cellwise sum of grids over halves."""
        df = _skewed(spark, 1000)
        whole = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_build(df, "host").collect()
        }
        a = cms_build(df.where("host LIKE 'hot%'"), "host")
        b = cms_build(df.where("host LIKE 'tail%'"), "host")
        merged = {}
        for r in a.unionByName(b).collect():
            k = (r["row"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]
        assert merged == whole

    def test_partition_invariance(self, spark):
        df = _skewed(spark)
        one = sorted(
            map(tuple, heavy_hitters(df.coalesce(1), "host").collect())
        )
        many = sorted(
            map(tuple, heavy_hitters(df.repartition(7, "host"), "host").collect())
        )
        assert one == many

    def test_heavy_hitters_no_false_negatives(self, spark):
        df = _skewed(spark)
        hh = {r["host"] for r in heavy_hitters(df, "host", phi=20).collect()}
        n = df.count()
        true_heavy = {
            r["host"]
            for r in df.groupBy("host").count().collect()
            if r["count"] >= (n + 19) // 20
        }
        assert true_heavy <= hh
        assert {"hot0", "hot1", "hot2"} <= hh

    def test_contract_columns(self, spark):
        rows = heavy_hitters(_skewed(spark), "host", phi=20).collect()
        assert rows
        for r in rows:
            assert r["est"] >= r["cnt_exact"]
            assert r["overestimate"] == r["est"] - r["cnt_exact"]
            assert r["est"] >= r["threshold"]

    def test_width_must_be_power_of_two(self, spark):
        with pytest.raises(ValueError):
            cms_build(_skewed(spark, 10), "host", width=1000)
