"""SparkSession builder with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "bathyscaphe-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """AQE on (runtime coalescing + skew-join splitting), Arrow on (every
    UDF in the engine is a pandas UDF), shuffle partitions sized to the
    parallelism level under test."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[32]")
    cores = 32
    if master.startswith("local[") and master[6:-1].isdigit():
        cores = int(master[6:-1])
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # shuffled-hash over sort-merge: the engine's big joins build on
        # the small (frontier/seen-delta) side and stream the bucketed
        # pages side — no per-round sort of the heavy html data
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # orderBy+limit above this k falls back to a spillable global
        # sort instead of TakeOrdered's in-memory per-partition priority
        # queue (a 10^9-row global fetch budget must not allocate a
        # 10^9-entry heap per task)
        .config("spark.sql.execution.topKSortFallbackThreshold", "1000000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
