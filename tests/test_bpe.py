"""Full BPE training + encoding: mirror parity, merge semantics, scale
invariants (operators/bpe.py)."""

import pytest

from bathyscaphe_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    word_freqs,
)


def _apply(syms, lft, rgt):
    """Greedy left-to-right non-overlapping merge on the original."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
            out.append(lft + rgt)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _mirror_train(freqs, n):
    vocab = {tuple(w): f for w, f in freqs}
    out = []
    for rank in range(1, n + 1):
        counts = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lft, rgt), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, lft, rgt, lft + rgt, cnt))
        merged = {}
        for syms, f in vocab.items():
            merged[tuple(_apply(list(syms), lft, rgt))] = (
                merged.get(tuple(_apply(list(syms), lft, rgt)), 0) + f
            )
        vocab = merged
    return out


def _mirror_encode(words, merges):
    toks = []
    for w in words:
        syms = list(w)
        for lft, rgt in merges:
            syms = _apply(syms, lft, rgt)
        toks.extend(syms)
    return len(toks)


class TestBpeTrain:
    def test_sennrich_golden(self, spark):
        # the paper's classic example vocabulary (minus </w> markers)
        rows = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        df = spark.createDataFrame(rows, "w string, freq long")
        got = [tuple(r) for r in bpe_train(df, n_merges=6).collect()]
        assert got == [
            (1, "e", "s", "es", 9),
            (2, "es", "t", "est", 9),
            (3, "l", "o", "lo", 7),
            (4, "lo", "w", "low", 7),
            (5, "e", "w", "ew", 6),
            (6, "ew", "est", "ewest", 6),
        ]

    def test_mirror_parity_wide_vocab(self, spark):
        rows = [
            ("".join(chr(97 + (i * 7 + j) % 5) for j in range(2 + i % 6)), 1 + i % 9)
            for i in range(60)
        ]
        # collapse duplicate words like groupBy would
        agg = {}
        for w, f in rows:
            agg[w] = agg.get(w, 0) + f
        rows = sorted(agg.items())
        df = spark.createDataFrame(rows, "w string, freq long")
        got = [tuple(r) for r in bpe_train(df, n_merges=10).collect()]
        assert got == _mirror_train(rows, 10)

    def test_overlapping_merge_sites_nonoverlap_greedy(self, spark):
        # (a,a) on "aaaa" must yield [aa, aa]; on "aaa" → [aa, a]
        df = spark.createDataFrame(
            [("aaaa", 3), ("aaa", 1)], "w string, freq long"
        )
        got = [tuple(r) for r in bpe_train(df, n_merges=2).collect()]
        # iter1: pairs (a,a) = 3*3 + 1*2 = 11 → merge "aa"
        # iter2: "aaaa"→[aa,aa] gives (aa,aa)=3; "aaa"→[aa,a] gives (aa,a)=1
        assert got == [
            (1, "a", "a", "aa", 11),
            (2, "aa", "aa", "aaaa", 3),
        ]

    def test_early_stop_when_fully_merged(self, spark):
        df = spark.createDataFrame([("ab", 4)], "w string, freq long")
        got = bpe_train(df, n_merges=5).collect()
        assert [tuple(r) for r in got] == [(1, "a", "b", "ab", 4)]

    def test_partition_invariance(self, spark):
        rows = [("banana", 3), ("bandana", 2), ("anagram", 5), ("nana", 7)]
        df1 = spark.createDataFrame(rows, "w string, freq long")
        a = [tuple(r) for r in bpe_train(df1.repartition(1), 5).collect()]
        b = [tuple(r) for r in bpe_train(df1.repartition(7), 5).collect()]
        assert a == b == _mirror_train(rows, 5)


class TestBpeEncode:
    def test_counts_match_mirror_and_merges_stay_in_words(self, spark):
        rows = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        vocab = spark.createDataFrame(rows, "w string, freq long")
        merges = [
            (r["lft"], r["rgt"]) for r in bpe_train(vocab, 6).collect()
        ]
        docs = spark.createDataFrame(
            [
                (1, "low lower newest"),
                # "w e" adjacent across words must NOT merge into "we";
                # ineligible tokens (digits, 1-char) don't count as words
                (2, "low w est x 7 newest"),
                (3, ""),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_words"], r["n_tokens"])
            for r in bpe_encode(docs, merges).collect()
        }
        exp1 = _mirror_encode(["low", "lower", "newest"], merges)
        exp2 = _mirror_encode(["low", "est", "newest"], merges)
        assert got == {1: (3, exp1), 2: (3, exp2), 3: (0, 0)}

    def test_no_merges_is_character_count(self, spark):
        docs = spark.createDataFrame(
            [(1, "abc de")], "doc_id long, text string"
        )
        r = bpe_encode(docs, []).collect()[0]
        assert (r["n_words"], r["n_tokens"]) == (2, 5)

    def test_word_freqs_normalization(self, spark):
        docs = spark.createDataFrame(
            [(1, "The the THE cat2 a bb  bb")], "doc_id long, text string"
        )
        got = {r["w"]: r["freq"] for r in word_freqs(docs).collect()}
        assert got == {"the": 3, "bb": 2}
