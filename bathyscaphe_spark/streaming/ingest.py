"""Structured Streaming front door (optional — the engine is
batch-iterative per the north rule; this module covers the streaming
capability row of SURVEY.md §2.8 for deployments where pages arrive
continuously, e.g. a WARC drop directory).

* ``stream_pages``      — file-source stream of page parquet drops
* ``windowed_host_rates`` — event-time windowed per-host fetch rates
  with a watermark for late data (the politeness telemetry a live
  crawler feeds back into per-host budgets)
* ``stream_to_universe``  — micro-batch sink appending arrivals to the
  pages universe via foreachBatch, so the batch crawl's next round sees
  them (stream→table handoff, exactly-once per micro-batch epoch)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("headers", MapType(StringType(), StringType())),
        StructField("status", IntegerType()),
        StructField("host", StringType()),
    ]
)


def stream_pages(spark: SparkSession, drop_dir: str, max_files: int = 16) -> DataFrame:
    """readStream over a parquet drop directory (input_hint shape)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(drop_dir)
    )


def windowed_host_rates(
    pages_stream: DataFrame, window: str = "10 minutes",
    slide: str = "5 minutes", watermark: str = "15 minutes",
) -> DataFrame:
    """Per-host fetch counts over sliding event-time windows with a
    watermark bounding late-data state — the streaming politeness
    telemetry."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window, slide), F.col("host"))
        .agg(
            F.count(F.lit(1)).alias("fetches"),
            F.sum(F.when(F.col("status") < 0, 1).otherwise(0)).alias("timeouts"),
        )
    )


def stream_to_universe(
    pages_stream: DataFrame, universe_dir: str, checkpoint_dir: str
):
    """Append stream arrivals to the batch universe directory.  Each
    micro-batch epoch writes exactly once (checkpointed offsets); the
    batch crawl re-reads the directory at its next round boundary."""

    def _append(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(universe_dir)

    return (
        pages_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
