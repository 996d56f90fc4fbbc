"""Vacuous-signal audit (the r4 technique, persisted): for each named
query, run its DuckDB ORACLE at sf0.01 and flag result columns with
nunique == 1 — a constant column is a signal that can never fail parity,
so it is either a deliberate contract assertion (an `*_ok` column, a
fixed output dimension) or a fixture defect (the r3 spoof_hosts fixture
was green on a provably-EMPTY result for two rounds).  Empty results are
flagged unconditionally.

Usage: python BENCH/vacuous_audit.py <query> [<query> ...]
       python BENCH/vacuous_audit.py --all        # every ORACLES entry
Prints one line per query: row count and any constant columns with their
single value, for human adjudication (COVERAGE.md records the verdicts).
"""

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    from bathyscaphe_spark.queries import ORACLES

    names = sys.argv[1:]
    if names == ["--all"]:
        names = sorted(ORACLES)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    n_flagged = 0
    for name in names:
        df = con.execute(ORACLES[name]).df()
        if len(df) == 0:
            print(f"{name}: rows=0 EMPTY-RESULT (flag)")
            n_flagged += 1
            continue
        const = []
        for c in df.columns:
            u = df[c].astype(str).nunique(dropna=False)
            if u == 1:
                const.append(f"{c}={df[c].iloc[0]!r}")
        tag = f" CONST[{', '.join(const)}]" if const else ""
        if const:
            n_flagged += 1
        print(f"{name}: rows={len(df)} cols={len(df.columns)}{tag}")
    print(f"-- {n_flagged}/{len(names)} queries with a constant/empty signal")


if __name__ == "__main__":
    main()
