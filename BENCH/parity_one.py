"""Ad-hoc single-query parity check (the driver's compare, one name).

Usage: python BENCH/parity_one.py <query> [<query> ...]
"""

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: "∅"
            if v is None or (isinstance(v, float) and pd.isna(v))
            else str(v)
        )
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    from bathyscaphe_spark.queries import ORACLES, QUERIES
    from bathyscaphe_spark.session import build_session

    spark = build_session(
        app_name="parity-one", master="local[4]", shuffle_partitions=4
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    rc = 0
    for name in sys.argv[1:]:
        got = QUERIES[name](spark, SF_DIR).toPandas()
        want = con.execute(ORACLES[name]).df()
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_rows = len(got) == len(want)
        ok_vals = ok_cols and ok_rows and canon(got).equals(canon(want))
        print(
            f"{name}: cols={'OK' if ok_cols else (sorted(got.columns), sorted(want.columns))} "
            f"rows={'OK' if ok_rows else (len(got), len(want))} "
            f"vals={'OK' if ok_vals else 'MISMATCH'}"
        )
        if not ok_vals:
            rc = 1
            if ok_cols and ok_rows:
                g, w = canon(got), canon(want)
                print(pd.concat([g, w]).drop_duplicates(keep=False).head(10))
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
