"""A/B micro-benchmark: r1 python-fused extraction vs r2 JVM-extract +
narrow UDF, at a given parallelism level.

Usage: python BENCH/ab_extract.py <cores> [n_pages] [which: py|flt|both]
Prints one JSON line per variant: wall seconds for the full
extract→filter→dedup pipeline (count() to force execution).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    which = sys.argv[3] if len(sys.argv) > 3 else "both"

    from pyspark.sql import functions as F

    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.operators.scheduler import (
        extension_filter,
        extract_candidates_fused,
        extract_filtered_candidates,
        onion_filter,
        protocol_filter,
    )
    from bathyscaphe_spark.pipeline.synth import build_pages
    from bathyscaphe_spark.session import build_session

    spark = build_session(
        app_name=f"ab-extract-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
    )
    cfg = CrawlConfig()
    pages = build_pages(
        spark, n_pages=n_pages, n_hosts=n_pages // 200, links_per_page=8,
        parallelism=cores * 2,
    ).select("url", "html", F.lit(1).alias("depth")).persist()
    pages.count()

    def pipeline(cand):
        cand = cand.where(onion_filter(F.col("host")))
        cand = cand.where(protocol_filter(F.col("scheme")))
        cand = cand.where(extension_filter(F.col("path"), cfg.allowed_extensions))
        return cand.groupBy("url_hash").agg(
            F.min("url").alias("url"),
            F.min("host").alias("host"),
            (F.min("depth") + 1).alias("depth"),
        )

    variants = {}
    if which in ("py", "both"):
        # r1 shape: full-width python-fused extraction, filters JVM-side.
        # A JVM regexp_extract_all variant was also measured here and
        # REJECTED (UTF-16 body materialization; 1.6-1.8x slower).
        variants["py"] = lambda: pipeline(
            extract_candidates_fused(pages, carry_cols=("depth",))
        )
    if which in ("flt", "both"):
        variants["flt"] = lambda: extract_filtered_candidates(
            pages, cfg, carry_cols=("depth",)
        ).groupBy("url_hash").agg(
            F.min("url").alias("url"),
            F.min("host").alias("host"),
            (F.min("depth") + 1).alias("depth"),
        )

    for name, fn in variants.items():
        # warm once at tiny scale to JIT/JVM-warm the plan shapes
        t0 = time.perf_counter()
        n = fn().count()
        wall = time.perf_counter() - t0
        print(json.dumps({"variant": name, "cores": cores,
                          "n_pages": n_pages, "out_rows": n,
                          "wall_sec": round(wall, 2)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
