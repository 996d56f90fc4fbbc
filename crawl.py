"""CLI crawl driver — the spark-submit entry point.

Replaces the reference's five long-running processes (bs-crawler,
bs-scheduler, bs-indexer, bs-blacklister, bs-configapi — reference:
cmd/*/*.go) with one batch-iterative driver: each invocation runs (or
resumes) a crawl against a pages universe, committing one atomic
snapshot per round.

Usage (local):
    python crawl.py --state /tmp/crawl --pages synth:150000 --rounds 5
Usage (cluster):
    spark-submit --py-files bathyscaphe_spark.zip crawl.py \\
        --state hdfs://.../crawl --pages /data/pages --rounds 100

``--pages`` accepts ``synth:<n>`` (deterministic synthetic universe) or
a parquet path with the input_hint shape (url, warc_ts, html, text,
lang) plus headers/status.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--state", required=True, help="state root directory")
    ap.add_argument("--pages", required=True,
                    help="'synth:<n_pages>', 'warc:<glob>' or parquet path")
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--seeds", type=int, default=0,
                    help="number of seed hosts (synth mode; 0 = one per host)")
    ap.add_argument("--config", default=None, help="config JSON path")
    ap.add_argument("--master", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the state dir before starting")
    ap.add_argument("--link-rank", action="store_true",
                    help="harvest the host link graph and boost frontier "
                         "priority by fixed-point PageRank")
    ap.add_argument("--fetch-budget", type=int, default=None,
                    help="global per-round fetch cap (cross-host top-K "
                         "after the per-host politeness rank)")
    ap.add_argument("--adaptive-refresh", action="store_true",
                    help="per-URL seen TTLs adapt to observed content "
                         "change (requires refresh-delay > 0 in --config)")
    ap.add_argument("--recrawl-budget", type=int, default=None,
                    help="re-enqueue up to N fully-expired fetched URLs "
                         "per round, oldest fetch first (with "
                         "--adaptive-refresh)")
    args = ap.parse_args()

    from bathyscaphe_spark.config import DEFAULT_CONFIG, CrawlConfig
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.pipeline.synth import build_pages, build_seeds
    from bathyscaphe_spark.session import build_session
    from bathyscaphe_spark.state.tables import TableCatalog

    master = args.master or (f"local[{args.cpus}]" if args.cpus else None)
    spark = build_session(app_name="bathyscaphe-crawl", master=master)

    if args.fresh:
        TableCatalog(spark, args.state).destroy()

    cfg = CrawlConfig.from_json(args.config) if args.config else DEFAULT_CONFIG
    if (
        args.link_rank
        or args.fetch_budget
        or args.adaptive_refresh
        or args.recrawl_budget
    ):
        from dataclasses import replace

        cfg = replace(
            cfg,
            link_rank_enabled=args.link_rank or cfg.link_rank_enabled,
            round_fetch_budget=args.fetch_budget or cfg.round_fetch_budget,
            adaptive_refresh=args.adaptive_refresh or cfg.adaptive_refresh,
            recrawl_budget=args.recrawl_budget or cfg.recrawl_budget,
        )

    if args.pages.startswith("synth:"):
        n = int(args.pages.split(":", 1)[1])
        n_hosts = max(10, n // 200)
        pages = build_pages(spark, n, n_hosts=n_hosts).repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "url"
        ).persist()
        seeds = build_seeds(spark, pages, args.seeds or n_hosts)
    elif args.pages.startswith("warc:"):
        # WARC archives as the fetch universe (Common Crawl layout)
        from bathyscaphe_spark.sources.warc import warc_universe

        pages = warc_universe(spark, args.pages.split(":", 1)[1]).repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "url"
        ).persist()
        seeds = None
        if TableCatalog(spark, args.state).last_committed_round() < 0:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            w = Window.partitionBy("host").orderBy("url")
            seeds = (
                pages.withColumn("_rn", F.row_number().over(w))
                .where("_rn = 1")
                .select("url", "host")
            )
    else:
        pages = spark.read.parquet(args.pages).persist()
        seeds = None  # resume, or bootstrap below from host roots
        if TableCatalog(spark, args.state).last_committed_round() < 0:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            w = Window.partitionBy("host").orderBy("url")
            seeds = (
                pages.withColumn("_rn", F.row_number().over(w))
                .where("_rn = 1")
                .select("url", "host")
            )

    stats = crawl(spark, pages, seeds, args.state, cfg, max_rounds=args.rounds)
    for s in stats:
        print(json.dumps(s.__dict__))
    spark.stop()


if __name__ == "__main__":
    main()
