"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``bathyscaphe_spark.queries``; each entry maps to
an operator row of SURVEY.md §2 (see the docstrings for file:line
citations into the reference).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one full scheduler round (extract → normalize → FNV →
    F1-F4 → dedup → seen anti-join) over the synthesized corpus at
    sf0.001."""
    from bathyscaphe_spark.queries import q_scheduler_round

    return q_scheduler_round(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bathyscaphe_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bathyscaphe_spark.queries import ORACLES

    return dict(ORACLES)
