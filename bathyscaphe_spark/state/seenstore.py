"""Bucket-compacted seen-set store — the zero-exchange exact-verify path.

The crawl round's D1 dedup (reference: internal/scheduler/scheduler.go:119-122
seen-URL check) verifies every Bloom-router hit with an exact anti-join
against the seen table.  The router bounds the CANDIDATE side to false
positives + true dups, but the plain anti-join still hash-exchanges the
SEEN side — at the north rule's 10^10-URL seen set that re-shuffle of
~10^10 rows every round is the single heaviest exchange left in the
round.

This store removes it: the seen set is periodically compacted into a
parquet table written with ``bucketBy(num_buckets, url_hash)`` +
``sortBy(url_hash)``.  A scan of a bucketed table reports
``HashPartitioning(url_hash, num_buckets)`` as its output partitioning,
so the join planner (sort-merge or shuffled-hash alike) inserts an
Exchange ONLY on the candidate side — the 10^10-row seen side streams
straight from storage, pre-partitioned and pre-sorted, round after
round.  This is exactly Iceberg's ``bucket(N, url_hash)`` partition
transform re-expressed with Spark's native bucketing (the environment
ships no Iceberg jar — see state/tables.py).

Cadence at scale: per-round seen Δs stay in the delta table
(state/tables.py append-only rounds); the anti-join unions the bucketed
base with the small unbucketed tail (Δs since the last compaction), so
only the tail — bounded by compaction cadence, not crawl age — pays the
exchange.  ``compact()`` is the periodic rewrite job (Iceberg
rewrite-data-files), idempotent and atomic at the catalog level.

Bucket metadata lives in the session catalog, not the parquet footers,
so a fresh session re-registers the existing files with ``attach()``
(DDL ``CLUSTERED BY`` over the same ``LOCATION`` — Spark encodes the
bucket id in the file names, so registration is metadata-only).

What is and is not saved (measured on the executed plan): the seen-side
Exchange is GONE — the join shows exactly one Exchange, on the
candidate side, hashed into ``num_buckets`` — which removes the
network/disk shuffle of the 10^10-row table; a per-bucket SORT of the
seen side remains (this Spark build does not propagate bucket-file sort
order into the plan even at one file per bucket), which is local
CPU over each bucket's slice, no exchange.  ``sortBy`` is kept anyway:
sorted files give parquet min/max pages over ``url_hash`` (range
pruning) and make the layout forward-compatible with sorted-scan
elision.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def consolidate_seen(seen: DataFrame) -> DataFrame:
    """One row per url_hash with the D1-effective liveness: a NULL
    expiry (never expires) dominates any timestamp, else the max expiry
    — so ``x live in consolidated`` ⟺ ``x live in any delta row``, for
    every probe time; first_seen_round keeps the earliest.  This is the
    ``agg_fn`` the bucketed compaction (and TableCatalog.compact_deltas
    on ``seen``) uses."""
    return seen.groupBy("url_hash").agg(
        F.when(
            F.max(F.col("expires_ts").isNull().cast("int")) == 1,
            F.lit(None).cast("timestamp"),
        )
        .otherwise(F.max("expires_ts"))
        .alias("expires_ts"),
        F.min("first_seen_round").alias("first_seen_round"),
    )

SEEN_SCHEMA_DDL = (
    "url_hash BIGINT, expires_ts TIMESTAMP, first_seen_round BIGINT"
)


class BucketedSeenStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        name: str = "seen_bucketed",
        num_buckets: int = 32,
        schema_ddl: str = SEEN_SCHEMA_DDL,
    ) -> None:
        self.spark = spark
        self.path = path
        self.name = name
        self.num_buckets = int(num_buckets)
        self.schema_ddl = schema_ddl

    # -- lifecycle ----------------------------------------------------------
    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.name)

    def compact(self, seen: DataFrame, col: str = "url_hash") -> None:
        """Rewrite the bucketed base from ``seen`` (typically the delta
        union, consolidated).  One shuffle into ``num_buckets`` — the
        LAST time these rows are ever exchanged."""
        (
            seen.repartition(self.num_buckets, col)
            .write.mode("overwrite")
            .option("path", self.path)
            .bucketBy(self.num_buckets, col)
            .sortBy(col)
            .saveAsTable(self.name)
        )

    def attach(self) -> None:
        """Re-register the existing bucketed files in a fresh session
        (metadata-only: bucket ids are encoded in the file names)."""
        if self.exists():
            return
        self.spark.sql(
            f"CREATE TABLE `{self.name}` ({self.schema_ddl}) USING PARQUET "
            f"CLUSTERED BY (url_hash) SORTED BY (url_hash) "
            f"INTO {self.num_buckets} BUCKETS "
            f"LOCATION '{os.path.abspath(self.path)}'"
        )

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS `{self.name}`")

    # -- reads --------------------------------------------------------------
    def df(self) -> DataFrame:
        """The bucketed base as a DataFrame — scans report the bucket
        partitioning, so key-equi joins skip the seen-side Exchange.
        Filters (e.g. the TTL liveness predicate) preserve it.

        The SHUFFLE_HASH hint picks the O(n) per-bucket hash build over
        sort-merge's O(n log n) per-bucket sort (this Spark build does
        not trust bucket-file sort order, so SMJ would re-sort the base
        every round); the hint does not re-introduce an exchange — the
        join's seen side stays scan-only.  Per-task build memory is
        O(|seen| / num_buckets), which is what ``num_buckets`` sizes
        (a property of the table's data volume, like Iceberg's bucket
        count, NOT of the cluster)."""
        return self.spark.table(self.name).hint("SHUFFLE_HASH")

    def anti_join(
        self,
        cand: DataFrame,
        col: str = "url_hash",
        tail: DataFrame | None = None,
    ) -> DataFrame:
        """Exact D1 anti-join against base (+ optional unbucketed Δ
        ``tail``).  The base side never exchanges; the tail — rows seen
        since the last ``compact()`` — is small by cadence and pays the
        normal (tail-sized) join cost."""
        out = cand.join(self.df().select(col), col, "left_anti")
        if tail is not None:
            out = out.join(tail.select(col), col, "left_anti")
        return out
