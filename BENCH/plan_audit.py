"""Mechanical physical-plan audit of every driver-contract query.

For each entry in queries(): build the DataFrame against
$SPARK_GRAFT_SF_DIR (default sf0.01), inspect the EXECUTED plan string,
and count the things the 100 TB design rules forbid or require:

* cartesian products (must be 0 everywhere except the explicitly
  bounded brute-force baselines),
* row-at-a-time Python UDFs (BatchEvalPython — must be 0; Arrow
  stages are fine and counted separately),
* broadcast joins (small sides must broadcast),
* parquet scans whose ReadSchema carries every column (column pruning).

Writes BENCH/PLAN_AUDIT.md.  Usage: python BENCH/plan_audit.py
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# bounded all-pairs baselines where a cross join is the documented point
CARTESIAN_OK = {"knn_cosine_topk"}
# 1-row broadcast scalar attach (global corpus stats joined back as a
# BroadcastNestedLoopJoin against a single aggregated row — the
# collect()-free way to give every doc the corpus N/avgdl/df values)
SCALAR_ATTACH_OK = {
    "bm25_search", "recrawl_priority", "lm_perplexity", "hits_scores",
    # same 1-row corpus-stats attach as bm25_search, fielded variant
    "bm25f_search",
    # corpus_release composes the lm_perplexity stage, inheriting its
    # 1-row corpus-stat scalar attaches
    "corpus_release",
    # weight-total and leftover are 1-row aggregates attached back
    "budget_apportion",
    # composes allocate_budget, inheriting its 1-row scalar attaches
    "temperature_mix",
    # the two corpus-total normalizers (T_target, T_raw) are 1-row
    # aggregates attached back onto the ≤n_buckets-row term table
    "dsir_select",
    # seed-doc corpus-N scalar attach (more_like_this idf) and the
    # per-iteration 1-row dangling-mass scalar (pagerank_dangling)
    "more_like_this",
    "pagerank_dangling",
    # the CMS threshold ceil(N/phi) is a 1-row corpus-count scalar
    # attached onto the ≤distinct-host estimate table
    "heavy_hitters",
    # corpus-N scalar attach for the idf table (same shape as
    # more_like_this); the pair join itself is a term-keyed equi-join
    "tfidf_allpairs",
}
# bounded broadcast small-side expansion: IVF assignment is docs ×
# broadcast(n_cells=16 centroid rows) — the documented O(n·cells)
# assignment cost, combined map-side back to one row per doc
SMALL_BCAST_OK = {"ivf_topk", "semdedup_prune",
                  # both cartesians are broadcasts of the 3-row
                  # q_permille literal (sketch walk + exact nearest-rank
                  # contract stage) — O(rows·3), never data×data
                  "latency_quantiles"}
CARTESIAN_OK = CARTESIAN_OK | SCALAR_ATTACH_OK | SMALL_BCAST_OK


def main() -> None:
    from bathyscaphe_spark.queries import QUERIES
    from bathyscaphe_spark.session import build_session

    spark = build_session(app_name="plan-audit", master="local[8]",
                          shuffle_partitions=8)
    rows = []
    bad = []
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must cover all
            rows.append((name, "ERROR", str(e)[:80], "", ""))
            bad.append(name)
            continue
        cartesian = plan.count("CartesianProduct") + plan.count(
            "BroadcastNestedLoopJoin"
        )
        row_python = plan.count("BatchEvalPython")
        arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas") + plan.count(
            "FlatMapGroupsInPandas"
        )
        bcast = plan.count("BroadcastHashJoin")
        scans = len(re.findall(r"FileScan parquet", plan))
        ok = row_python == 0 and (cartesian == 0 or name in CARTESIAN_OK)
        if not ok:
            bad.append(name)
        rows.append(
            (name, "ok" if ok else "FLAG",
             f"cartesian={cartesian}" + ("*" if name in CARTESIAN_OK else ""),
             f"rowPy={row_python} arrow={arrow}",
             f"bcast={bcast} scans={scans}")
        )
    out = Path(__file__).parent / "PLAN_AUDIT.md"
    with out.open("w") as f:
        f.write("# PLAN_AUDIT — physical plans of all contract queries\n\n")
        f.write(f"sf_dir: `{SF_DIR}` — {len(rows)} queries; ")
        f.write(f"{len(bad)} flagged ({', '.join(bad) or 'none'}).\n\n")
        f.write("Rules: 0 row-at-a-time Python stages everywhere; 0 cartesian\n")
        f.write("products except the documented bounded baselines (marked *).\n\n")
        f.write("| query | verdict | joins | python | misc |\n|---|---|---|---|---|\n")
        for r in rows:
            f.write("| " + " | ".join(r) + " |\n")
    print(f"wrote {out}; flagged: {bad or 'none'}")
    spark.stop()


if __name__ == "__main__":
    main()
