"""Host-level near-mirror detection (operators/dedup.py mirror_pairs)."""

from __future__ import annotations

from bathyscaphe_spark.operators.dedup import mirror_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_mirror_hosts_detected_nonmirror_not(spark):
    page = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        ("h1", page),
        ("h2", page + " with a tiny footer"),
        ("h3", "completely different words about spark shuffles and joins"),
    ]
    out = {
        (r["host_a"], r["host_b"]): r["overlap_permille"]
        for r in mirror_pairs(_df(spark, rows), hot_cap=100).collect()
    }
    assert ("h1", "h2") in out
    assert out[("h1", "h2")] >= 900  # shingle sets nearly identical
    assert all(k == ("h1", "h2") for k in out)


def test_hot_shingle_cap_kills_boilerplate_only_overlap(spark):
    # every host shares ONLY the boilerplate sentence; with hot_cap
    # below the host count those shingles drop and no pair survives
    boiler = "click here to subscribe to our newsletter today"
    rows = [(f"h{i}", f"{boiler} unique{i}a unique{i}b unique{i}c") for i in range(6)]
    assert mirror_pairs(_df(spark, rows), hot_cap=3).count() == 0
    # raising the cap above the host count re-admits the overlap
    assert mirror_pairs(_df(spark, rows), hot_cap=10).count() > 0


def test_overlap_is_distinct_set_based(spark):
    # repeating a shingle many times on one host must not inflate shared
    rows = [
        ("a", "x y z " * 50 + "one two three four five six seven eight"),
        ("b", "x y z pad1 pad2 pad3 pad4 pad5 pad6 pad7 pad8 pad9"),
    ]
    out = mirror_pairs(_df(spark, rows), hot_cap=100, min_permille=1).collect()
    assert len(out) == 1
    r = out[0]
    # shared distinct shingles: 'x y z' only (plus wrap shingles 'y z x',
    # 'z x y' exist only on host a) -> shared == 1
    assert r["shared"] == 1


def test_partition_invariance(spark):
    rows = [(f"h{i % 4}", f"alpha beta gamma delta tok{i} epsilon zeta") for i in range(20)]
    df = _df(spark, rows)
    a = sorted(map(tuple, mirror_pairs(df.repartition(1), min_permille=1).collect()))
    b = sorted(map(tuple, mirror_pairs(df.repartition(7), min_permille=1).collect()))
    assert a == b and len(a) > 0
