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
    """Append stream arrivals to the batch universe directory.  The
    batch crawl re-reads the directory at its next round boundary.

    ``foreachBatch`` is documented AT-LEAST-ONCE: a crash after an
    epoch's files land but before the checkpoint records the commit
    replays the same ``epoch_id`` on restart, and a plain parquet
    append would duplicate every arrival of that epoch in the universe
    (duplicate fetches, duplicate resources rows downstream).  The
    sink is therefore made IDEMPOTENT per epoch: each batch writes to
    a temp dir, then its files move into the universe under
    deterministic ``epoch-<id>-<i>.parquet`` names, clearing any
    partial copy of the SAME epoch first — a replay replaces, never
    appends (a replayed epoch reads the identical offsets, so content
    is identical).  Flat files: no partition column leaks into the
    pages schema."""

    def _append(batch_df: DataFrame, epoch_id: int) -> None:
        import glob
        import os
        import shutil

        # dot-prefixed temp INSIDE the universe dir: parquet readers
        # ignore hidden paths, and a crash's leftovers are cleared on
        # the epoch's replay
        tmp = os.path.join(universe_dir, f".epoch-{epoch_id}.tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        batch_df.write.mode("overwrite").parquet(tmp)
        os.makedirs(universe_dir, exist_ok=True)
        for old in glob.glob(
            os.path.join(universe_dir, f"epoch-{epoch_id}-*.parquet")
        ):
            os.remove(old)
        files = sorted(glob.glob(os.path.join(tmp, "*.parquet")))
        for i, f in enumerate(files):
            os.rename(
                f,
                os.path.join(universe_dir, f"epoch-{epoch_id}-{i:05d}.parquet"),
            )
        shutil.rmtree(tmp, ignore_errors=True)

    return (
        pages_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
