"""Overlap-aware duplicate n-gram char fractions (textstats.dup_ngram_stats)."""

from bathyscaphe_spark.functions.textstats import dup_ngram_stats


def _mirror(text, n):
    """Pure-python reference: chars (word chars only) covered by any
    n-gram occurring more than once, each char counted once."""
    toks = [w for w in (text or "").split() if w]
    grams = {}
    for p in range(len(toks) - n + 1):
        grams.setdefault(tuple(toks[p : p + n]), []).append(p)
    covered = set()
    for g, ps in grams.items():
        if len(ps) > 1:
            for p in ps:
                covered.update(range(p, p + n))
    return sum(len(toks[q]) for q in covered), sum(len(w) for w in toks)


def _run(spark, rows, ns, parts=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_ngram_stats(df.repartition(parts), ns=ns).collect()
    return {r.doc_id: r.asDict() for r in out}


def test_hand_computed_coverage(spark):
    # 'a b c d e f' repeats: dup 5-grams at starts 0,1,6,7 cover
    # positions 0..11; token 12 ('x') stays uncovered
    got = _run(spark, [(1, "a b c d e f a b c d e f x")], (5, 10))
    assert got[1]["n_tokens"] == 13
    assert got[1]["dup5_chars"] == 12 and got[1]["total_chars"] == 13
    assert got[1]["dup5_pm"] == 923
    assert got[1]["dup10_chars"] == 0


def test_overlap_counted_once_vs_mirror(spark):
    rows = [
        (1, "a b c d e f a b c d e f x"),
        (2, "one two three four five six seven"),
        (3, "z z z z z z z z z z z z"),
        (4, "p q r s t u v p q r s t u v p q r s t u v"),
        (5, ""),
        (6, "lone"),
    ]
    got = _run(spark, rows, (5, 10))
    for did, text in rows:
        toks = [w for w in text.split() if w]
        if not toks:
            assert did not in got  # explode semantics: no row
            continue
        for n in (5, 10):
            dup, total = _mirror(text, n)
            assert got[did][f"dup{n}_chars"] == dup, (did, n)
            assert got[did]["total_chars"] == total
            assert got[did][f"dup{n}_pm"] == dup * 1000 // total


def test_full_stutter_saturates(spark):
    got = _run(spark, [(1, "z " * 40)], (5, 10))
    assert got[1]["dup5_pm"] == 1000 and got[1]["dup10_pm"] == 1000


def test_partition_invariance(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j * j) % 11}" for j in range(40)))
        for i in range(30)
    ]
    a = _run(spark, rows, (5, 10), parts=1)
    b = _run(spark, rows, (5, 10), parts=17)
    assert a == b
