"""FNV-1/64 golden tests — values from the reference test suite.

Sources: scheduler_test.go:158 and :223, local_test.go:20-36.
"""

import numpy as np
import pandas as pd

from bathyscaphe_spark.functions.fnv import (
    fnv1_64_np,
    fnv1_64_py,
    unsigned_to_signed,
)

GOLDENS = {
    # scheduler_test.go:158
    "https://facebookcorewwi.onion/test.php?id=12": 3056224523184958,
    # scheduler_test.go:223 (scenario batch, normalized order)
    "https://facebook.onion/test.php?id=1": 15038381360563270096,
    "https://google.onion": 17173291053643777680,
    "https://example.onion/test.png": 14332094874591870497,
    "https://m.fbi.onion/test.php": 5985629257333875968,
    # local_test.go:27-35 (request-URI hashes in sink paths)
    "admin/login.php?username=admin": 16609974401560122507,
    "admin/tools/list-accounts.php?token=123223453&username=test": 7883137132857825203,
}


def test_scalar_goldens():
    for s, want in GOLDENS.items():
        assert fnv1_64_py(s) == want, s


def test_vectorized_matches_scalar():
    keys = list(GOLDENS)
    got = fnv1_64_np(pd.Series(keys))
    assert [int(x) for x in got] == list(GOLDENS.values())


def test_vectorized_mixed_lengths_and_empty():
    vals = ["", "a", "ab" * 100, "https://example.onion"]
    got = fnv1_64_np(pd.Series(vals))
    assert [int(x) for x in got] == [fnv1_64_py(v) for v in vals]


def test_empty_batch():
    assert fnv1_64_np(pd.Series([], dtype=object)).size == 0


def test_signed_reinterpretation():
    u = 15038381360563270096
    s = unsigned_to_signed(u)
    assert s < 0
    assert np.uint64(np.int64(s)) == np.uint64(u)


def test_spark_udf(spark):
    from pyspark.sql import functions as F

    from bathyscaphe_spark.functions.fnv import fnv1_64, fnv1_64_str

    df = spark.createDataFrame([(k,) for k in GOLDENS], ["s"])
    rows = df.select("s", fnv1_64("s").alias("h"), fnv1_64_str("s").alias("hs")).collect()
    for r in rows:
        want = GOLDENS[r["s"]]
        assert r["h"] == unsigned_to_signed(want)
        assert r["hs"] == str(want)


def test_duckdb_oracle_parity():
    import duckdb

    from bathyscaphe_spark.functions.fnv import (
        duckdb_fnv_signed_sql,
        duckdb_fnv_str_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ",".join(f"('{s}')" for s in GOLDENS) + ") v(s)")
    rows = con.execute(
        f"SELECT s, {duckdb_fnv_signed_sql('s')} AS h, {duckdb_fnv_str_sql('s')} AS hs FROM t"
    ).fetchall()
    for s, h, hs in rows:
        want = GOLDENS[s]
        assert h == unsigned_to_signed(want)
        assert hs == str(want)
