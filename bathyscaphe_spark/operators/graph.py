"""Link-graph priority: fixed-point PageRank over the crawl's link graph.

The reference schedules FIFO (`scheduler/scheduler.go` — the AMQP queue
IS the ordering); at a 10^10-URL frontier the engine wants an
importance-ordered fetch instead, and the crawl already *produces* the
link graph as a by-product of extraction (src page → dst URL).  This
operator turns that graph into a per-node priority that
``politeness.rank_frontier`` can consume as its priority column —
iterative graph algorithms are exactly what the batch-iterative round
loop is shaped for.

Determinism across engines and cluster sizes
--------------------------------------------
Ranks are computed in FIXED-POINT integer arithmetic (``SCALE`` = 1e12
micro-units, damping 85/100 as an integer ratio, integer floor
division).  Floats would drift between DuckDB and the JVM and between
reduction orders at different parallelism; BIGINT sums are associative,
so the result is bit-identical at local[1] and on a 1000-executor
cluster — the same property the crawl's scaling protocol pins with
output fingerprints.  Dangling-node mass is dropped (the documented
variant; deterministic, and mirrored exactly by the DuckDB oracle).

Scale design
------------
Edges are the big side (up to ~1e11 rows at 100 TB) and are touched once
per iteration by a single shuffle: ``edges ⋈ ranks`` hash-partitioned on
``src``, then ``groupBy(dst)`` with map-side partial sums.  The
out-degree join is computed once and reused across iterations
(persisted), and the node set is likewise persisted (without it each
iteration's left join and the N count would re-scan edges twice to
rebuild it), so each iteration adds one edge-side join + one
aggregation + one node-side left join against cached node rows.
Ranks are one row per node — orders of magnitude smaller than edges —
and AQE's skew handling splits mega-host in-degree hubs.  Pre-bucketing
edges by ``src`` (Iceberg ``bucket(src)``) makes the per-iteration join
co-located at real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12  # rank micro-units: 1.0 == 10^12
DAMP_NUM = 85  # damping factor 0.85 as an integer ratio
DAMP_DEN = 100


def pagerank_fp(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Fixed-point PageRank over ``edges(src: long, dst: long)``.

    Returns ``(node: long, rank_fp: long)`` with rank in SCALE
    micro-units.  ``edges`` should be distinct pairs without self-loops
    (callers dedup; the crawl's extraction path already emits distinct
    normalized links per page).

    r_{i+1}(v) = (15·SCALE) div (100·N)
                 + Σ_{(u→v)} (r_i(u)·85) div (100·outdeg(u))
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # re-read every iteration's left join — never
        # re-derive from a double edge scan at 10^11-edge scale
    )
    n = nodes.count()  # one scalar; also materializes the cache
    if n == 0:
        df = nodes.withColumn("rank_fp", F.lit(0).cast("long"))
        nodes.unpersist()
        return df
    base = (15 * SCALE) // (100 * n)

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").persist()  # invariant across iterations
    try:
        ranks = nodes.withColumn("rank_fp", F.lit(SCALE // n).cast("long"))
        for _ in range(iters):
            contrib = (
                ed.join(ranks, ed["src"] == ranks["node"])
                .select(
                    F.col("dst").alias("node"),
                    F.expr(
                        f"(rank_fp * {DAMP_NUM}) div ({DAMP_DEN} * outdeg)"
                    ).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("contrib"))
            )
            ranks = nodes.join(contrib, "node", "left").select(
                "node",
                (F.lit(base) + F.coalesce(F.col("contrib"), F.lit(0)))
                .cast("long")
                .alias("rank_fp"),
            )
        # materialize before unpersisting the edge cache
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        ed.unpersist()
        nodes.unpersist()
    return ranks
