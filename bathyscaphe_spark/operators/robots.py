"""robots.txt-style path filtering (north-rule addition — the reference
has no robots handling; blacklisting is its only crawl-policy filter).

Model: a ``robots`` table (host, disallow: array<string> of path
prefixes), expanded to (host, prefix) rows.  A candidate URL is excluded
when its host has a disallow prefix that prefixes the candidate's path —
a broadcast theta anti-join exactly like F4, equality on host plus
``startswith`` on path.  The robots table is per-host tiny (even at
10^10 URLs it is bounded by host count) — always the broadcast side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_robots(robots: DataFrame) -> DataFrame:
    """(host, disallow array) → (host, prefix) rows."""
    return robots.select(
        "host", F.explode("disallow").alias("prefix")
    ).where(F.col("prefix") != "")


def apply_robots(
    candidates: DataFrame, robots: DataFrame,
    host_col: str = "host", path_col: str = "path",
) -> DataFrame:
    """Drop candidates whose (host, path) hits a disallow prefix."""
    r = expand_robots(robots).select(
        F.col("host").alias("_r_host"), F.col("prefix").alias("_r_prefix")
    )
    cond = (F.col(host_col) == F.col("_r_host")) & F.col(path_col).startswith(
        F.col("_r_prefix")
    )
    return candidates.join(F.broadcast(r), cond, "left_anti")
