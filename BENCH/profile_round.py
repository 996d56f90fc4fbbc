"""Per-stage wall-time profile of one crawl round at a given parallelism
level (instruments TableCatalog.stage_round).

Usage: python BENCH/profile_round.py <cores> [n_pages]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 1_200_000
    import tempfile

    from pyspark.sql import functions as F

    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.pipeline.round import run_round, round_ts_col
    from bathyscaphe_spark.pipeline.synth import build_host_status, build_pages, url_for
    from bathyscaphe_spark.session import build_session
    from bathyscaphe_spark.state import tables as state_tables
    from bathyscaphe_spark.state.tables import TableCatalog

    buckets = max(cores * 2, n_pages // 150_000)
    spark = build_session(
        app_name=f"prof-round-{cores}", master=f"local[{cores}]",
        shuffle_partitions=buckets,
    )
    n_hosts = n_pages // 200
    pages = build_pages(
        spark, n_pages=n_pages, n_hosts=n_hosts, links_per_page=8,
        parallelism=buckets,
    ).drop("text").repartition(buckets, "url").persist()
    pages.count()
    host_status = build_host_status(pages).persist()
    host_status.count()

    from bathyscaphe_spark.functions.fnv import fnv1_64

    rng = spark.range(0, n_pages, 2, buckets)
    frontier = rng.select(url_for(F.col("id"), n_hosts).alias("url")).select(
        "url",
        fnv1_64(F.col("url")).alias("url_hash"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.lit(1).alias("depth"),
        F.lit(990).alias("priority"),
        round_ts_col(0).alias("discovered_ts"),
        F.lit(0).alias("round"),
    )
    seen = (
        spark.range(0, n_pages, 3, buckets)
        .select(url_for(F.col("id"), n_hosts).alias("url"))
        .select(
            fnv1_64(F.col("url")).alias("url_hash"),
            F.lit(-1).alias("first_seen_round"),
            F.lit(None).cast("timestamp").alias("expires_ts"),
        )
    )

    state_root = tempfile.mkdtemp(prefix=f"profr{cores}_")
    cat = TableCatalog(spark, state_root)
    cat.stage_round("frontier", frontier, 0)
    cat.commit_round(0, ["frontier"])
    cat.stage_round("seen", seen, -1)
    cat.commit_round(-1, ["seen"])

    # instrument stage writes
    timings: dict[str, float] = {}
    orig = TableCatalog.stage_round

    def timed(self, name, df, round_n, **kw):
        t0 = time.perf_counter()
        out = orig(self, name, df, round_n, **kw)
        timings[f"write:{name}"] = round(time.perf_counter() - t0, 2)
        return out

    TableCatalog.stage_round = timed
    cfg = CrawlConfig(per_host_budget=80, bloom_enabled=False, skew_threshold=2_000)
    t0 = time.perf_counter()
    stats = run_round(cat, pages, host_status, cfg, 0, seen_count_hint=None)
    total = time.perf_counter() - t0
    TableCatalog.stage_round = orig
    timings["TOTAL"] = round(total, 2)
    timings["discovered"] = stats.discovered
    timings["cores"] = cores
    print(json.dumps(timings), flush=True)
    import shutil

    shutil.rmtree(state_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
