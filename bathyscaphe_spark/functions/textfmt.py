"""Deterministic resource text formatting and sink-path derivation.

* ``resource_text``: the byte-identical invariant anchor — the reference's
  local-FS sink writes ``"{url}\\n\\n" + sorted("{k}: {v}\\n" per header) +
  "\\n" + body`` with headers sorted lexically (reference:
  internal/indexer/index/local.go:61-84; golden bytes local_test.go:126-140).
  Implemented as a pure column expression (whole-stage codegen, no Python).

* ``sink path``: ``scheme/host[/FNV64(requestURI-minus-leading-slash)]/unix_ts``
  with the hash segment omitted when the request URI is ``/``
  (local.go:86-117; goldens local_test.go:20-36).  Derived columns
  ``(scheme, host, path_hash, unix_ts)`` double as the partition spec of
  the resources sink.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .fnv import fnv1_64_str
from .urltools import url_host, url_host_port, url_request_uri, url_scheme


def resource_text(url: Column, headers: Column, body: Column) -> Column:
    """Byte-identical extracted text per url (pure column expression).

    ``aggregate`` over the lexically sorted header keys builds the header
    block JVM-side; no UDF in this path.
    """
    sorted_keys = F.array_sort(F.map_keys(headers))
    header_block = F.aggregate(
        sorted_keys,
        F.lit(""),
        lambda acc, k: F.concat(
            acc, k, F.lit(": "), F.element_at(headers, k), F.lit("\n")
        ),
    )
    return F.concat(url, F.lit("\n\n"), header_block, F.lit("\n"), body)


def with_sink_path(df, url_col: str = "url", ts_col: str = "time"):
    """Add (scheme, host, host_port, path_hash, unix_ts, sink_path).

    path_hash is the decimal FNV-1/64 of the request URI without its
    leading slash, null when the URI is exactly '/'.  The path's host
    segment is Go's ``u.Host`` — port KEPT when non-default
    (local.go writes u.Host, not Hostname(); ADVICE r1) — while the
    ``host`` column stays the port-less hostname used as partition key.
    """
    uri = url_request_uri(F.col(url_col))
    df = (
        df.withColumn("scheme", url_scheme(F.col(url_col)))
        .withColumn("host", url_host(F.col(url_col)))
        .withColumn("host_port", url_host_port(F.col(url_col)))
        .withColumn(
            "path_hash",
            F.when(uri == "/", F.lit(None).cast("string")).otherwise(
                fnv1_64_str(F.regexp_replace(uri, "^/", ""))
            ),
        )
        .withColumn("unix_ts", F.unix_timestamp(F.col(ts_col)))
    )
    return df.withColumn(
        "sink_path",
        F.concat_ws(
            "/",
            F.col("scheme"),
            F.col("host_port"),
            F.col("path_hash"),  # concat_ws skips nulls → segment omitted
            F.col("unix_ts").cast("string"),
        ),
    )


def lowercase_header_keys(headers: Column) -> Column:
    """Indexer header normalization (elastic.go:171-175) as a column expr."""
    return F.transform_keys(headers, lambda k, _v: F.lower(k))
