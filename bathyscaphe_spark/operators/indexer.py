"""Indexer — fetched pages → searchable ``resources`` rows.

Re-creates the reference indexer (internal/indexer/indexer.go:94-148 +
internal/indexer/index/elastic.go:145-186, local.go:61-117):

* F4 hostname filter runs indexer-side too (indexer.go:100-103),
* X4/X5/X6: title / meta / description via one html-parsing pandas UDF,
* X7: header keys lowercased (column expression),
* X8: deterministic resource text — the byte-identical-per-url invariant,
* X9: deterministic sink path columns (partition spec of the sink).

The reference's write buffering (A2, indexer.go:105-145) is obsolete:
Spark writes are vectorized and sized by files.maxPartitionBytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.html import parse_doc
from ..functions.textfmt import lowercase_header_keys, resource_text, with_sink_path
from .scheduler import apply_hostname_blacklist


def build_resources(
    fetched: DataFrame,
    blacklist: DataFrame | list[str] | None = None,
) -> DataFrame:
    """fetched(url, host, html, headers, warc_ts) → resources rows
    (url, body, time, title, meta, description, headers) matching the ES
    document struct (elastic.go:58-66)."""
    df = apply_hostname_blacklist(fetched, blacklist)
    body = F.col("html").cast("string")
    doc = parse_doc(body)
    return df.select(
        "url",
        body.alias("body"),
        F.col("warc_ts").alias("time"),
        doc["title"].alias("title"),
        doc["meta"].alias("meta"),
        doc["description"].alias("description"),
        lowercase_header_keys(F.col("headers")).alias("headers"),
    )


def build_local_sink(
    fetched: DataFrame, blacklist: DataFrame | list[str] | None = None
) -> DataFrame:
    """X8+X9 over the RAW fetched rows: the local sink formats the
    original (non-lowercased) headers — only the ES path lowercases them
    (local.go:61-84 vs elastic.go:171-175).  Adds the byte-identical text
    payload and deterministic sink path columns; partitioned by
    (scheme, host) like the local FS layout (local.go:86-117)."""
    df = apply_hostname_blacklist(fetched, blacklist)
    df = df.select(
        "url",
        F.col("html").cast("string").alias("body"),
        F.col("warc_ts").alias("time"),
        "headers",
    )
    df = with_sink_path(df, url_col="url", ts_col="time")
    return df.withColumn(
        "text", resource_text(F.col("url"), F.col("headers"), F.col("body"))
    )


def write_local_sink(sink_df: DataFrame, path: str, mode: str = "append") -> None:
    """S9: persist the local-FS-sink shape partitioned by (scheme, host)
    — the deterministic-path idea of local.go:86-117 carried over as
    partition values + the path/hash columns inside each file."""
    sink_df.write.mode(mode).partitionBy("scheme", "host").parquet(path)
