"""Retrieval over resources (operators/search.py) — the query surface of
the reference's ES `resources` index (elastic.go:13-56)."""

from bathyscaphe_spark.operators.search import keyword_search


def _resources(spark):
    rows = [
        ("u1", "alpha beta", "alpha alpha gamma"),
        ("u2", "gamma delta", "alpha beta alpha beta"),
        ("u3", "nothing here", "none of the terms"),
        ("u4", "alpha", "beta"),
    ]
    return spark.createDataFrame(rows, "url string, title string, body string")


def test_scoring_and_order(spark):
    out = keyword_search(
        _resources(spark), ["alpha", "beta"], phrase="alpha beta", k=10
    ).collect()
    got = {r.url: r.score for r in out}
    # u1: title 3*(1+1)... alpha=1,beta=1 -> 3*2=6; body alpha=2 -> 2; phrase 0 => 8
    # u2: title 0; body alpha=2 beta=2 -> 4; phrase "alpha beta" x2 -> 20 => 24
    # u4: title alpha 3; body beta 1 => 4
    assert got == {"u1": 8, "u2": 24, "u4": 4}
    assert [r.url for r in out] == ["u2", "u1", "u4"]  # score desc, url asc


def test_zero_score_excluded_and_word_boundary(spark):
    rows = [("u1", "alphabet", "betamax soup")]  # substrings must NOT match
    df = spark.createDataFrame(rows, "url string, title string, body string")
    assert keyword_search(df, ["alpha", "beta"], k=5).count() == 0


def test_topk_is_take_ordered(spark):
    plan = keyword_search(
        _resources(spark), ["alpha"], k=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --- BM25 --------------------------------------------------------------------

import math

from bathyscaphe_spark.operators.search import BM25_B, BM25_K1, bm25_search


def _bm25_reference(docs, terms, k=10):
    """Pure-python BM25 mirror (same formula, same op order)."""
    toks = {u: [w for w in b.lower().split() if w] for u, _, b in docs}
    dls = {u: len(ws) for u, ws in toks.items()}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    import re as _re

    def tf(body, t):
        return len(_re.findall(r"\b" + _re.escape(t) + r"\b", body.lower()))

    dfs = {t: sum(1 for _, _, b in docs if tf(b, t) > 0) for t in terms}
    out = []
    for u, title, b in docs:
        s = 0.0
        for t in terms:
            f = float(tf(b, t))
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (f * (BM25_K1 + 1.0)) / (
                f + BM25_K1 * (1.0 - BM25_B + BM25_B * dls[u] / avgdl)
            )
        s = round(s, 6)
        if s > 0:
            out.append((u, title, s))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


def test_bm25_matches_reference_formula(spark):
    docs = [
        ("u1", "t1", "rare common common common words words"),
        ("u2", "t2", "common common common filler filler filler filler"),
        ("u3", "t3", "rare alone"),
        ("u4", "t4", "nothing matching at all"),
        ("u5", "t5", "common rare rare padding padding padding padding padding"),
    ]
    df = spark.createDataFrame(docs, "url string, title string, body string")
    got = [(r.url, r.title, r.score6) for r in bm25_search(df, ["rare", "common"]).collect()]
    assert got == _bm25_reference(docs, ["rare", "common"])


def test_bm25_rare_term_outranks_stopword(spark):
    # u_rare has ONE hit of a rare term; u_stop is stuffed with a term
    # present in every document — idf must make the rare doc win,
    # which raw-TF keyword_search gets wrong by construction
    docs = [("u_rare", "t", "zebra the the the")] + [
        (f"u_stop{i}", "t", "the the the the the the the the") for i in range(9)
    ]
    df = spark.createDataFrame(docs, "url string, title string, body string")
    out = bm25_search(df, ["zebra", "the"], k=3).collect()
    assert out[0].url == "u_rare"


def test_bm25_partitioning_invariant(spark):
    docs = [
        (f"u{i}", "t", ("alpha " * (i % 4)) + ("beta " * (i % 7)) + "tail words")
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "url string, title string, body string")
    a = [tuple(r) for r in bm25_search(df, ["alpha", "beta"], k=15).collect()]
    b = [tuple(r) for r in bm25_search(df.repartition(13), ["alpha", "beta"], k=15).collect()]
    assert a == b


class TestInvertedIndex:
    """build_inverted_index: gap encoding, stop-term cap, invariance."""

    def _run(self, spark, docs, stop_df=10**9, parts=3):
        from bathyscaphe_spark.operators.search import build_inverted_index

        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = build_inverted_index(df.repartition(parts), stop_df=stop_df)
        return {
            r["term"]: (
                r["df"],
                r["total_tf"],
                list(r["deltas"]) if r["deltas"] is not None else None,
                list(r["tfs"]) if r["tfs"] is not None else None,
            )
            for r in out.collect()
        }

    def test_gap_encoding_golden(self, spark):
        docs = [(3, "cat dog cat"), (10, "dog"), (42, "dog CAT!dog")]
        got = self._run(spark, docs)
        # cat: docs {3: tf2, 42: tf1} → gaps [3, 39]
        assert got["cat"] == (2, 3, [3, 39], [2, 1])
        # dog: docs {3:1, 10:1, 42:2} → gaps [3, 7, 32]
        assert got["dog"] == (3, 4, [3, 7, 32], [1, 1, 2])

    def test_gaps_reconstruct_ids(self, spark):
        import itertools

        docs = [(i * 17 + 5, f"w{i % 3} common") for i in range(30)]
        got = self._run(spark, docs)
        for term, (df, _tt, deltas, _tfs) in got.items():
            ids = list(itertools.accumulate(deltas))
            assert ids == sorted(ids) and len(ids) == df
            assert all(i in {j * 17 + 5 for j in range(30)} for i in ids)

    def test_stop_term_postings_null_stats_kept(self, spark):
        docs = [(i, "the the rare" if i == 0 else "the") for i in range(9)]
        got = self._run(spark, docs, stop_df=5)
        assert got["the"] == (9, 10, None, None)
        assert got["rare"] == (1, 1, [0], [1])

    def test_stop_terms_guarded_before_exchange(self, spark):
        # the memory guard is the MAP-SIDE broadcast anti-join: a stop
        # term's corpus-sized row set never enters the postings
        # exchange, and no per-term WINDOW buffers full row sets (a
        # count window would hold one corpus-sized partition per
        # stopword in WindowExec, un-splittable by AQE)
        from bathyscaphe_spark.operators.search import build_inverted_index

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = build_inverted_index(df, stop_df=1)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert "Window" not in plan
        # aggregated stats exchange + the single full-row postings
        # exchange (tf's (term, doc) shuffle is checkpointed, shared
        # by both consumers)
        assert plan.count("Exchange hashpartitioning") <= 3

    def test_partition_invariance(self, spark):
        docs = [(i, " ".join(f"t{(i * j) % 11}" for j in range(6))) for i in range(60)]
        a = self._run(spark, docs, stop_df=20, parts=1)
        b = self._run(spark, docs, stop_df=20, parts=8)
        assert a == b


class TestSnippets:
    def _run(self, spark, rows, terms, radius=40):
        from bathyscaphe_spark.operators.search import with_snippets

        df = spark.createDataFrame(rows, "id long, body string")
        out = with_snippets(df, terms, radius=radius).collect()
        return {r.id: (r.snip_pos, r.snippet) for r in out}

    def test_window_clamps_and_ellipsis(self, spark):
        body = "x" * 100 + " the MERGE point " + "y" * 100
        got = self._run(spark, [(1, body)], ["merge"], radius=10)
        pos, snip = got[1]
        assert pos == body.lower().index("merge") + 1  # 1-based
        # pos is 1-based: window covers 0-based [pos-1-10, pos-1+5+10)
        assert snip == "…" + body[pos - 11 : pos + 4 + 10] + "…"

    def test_boundaries_no_ellipsis(self, spark):
        got = self._run(spark, [
            (1, "merge at the very start"),   # no leading …
            (2, "ends with merge"),           # no trailing …
            (3, "tiny merge"),                # both clamped
        ], ["merge"], radius=100)
        assert got[1] == (1, "merge at the very start")
        assert got[2] == (11, "ends with merge")
        assert got[3] == (6, "tiny merge")

    def test_earliest_term_wins_and_case_insensitive(self, spark):
        got = self._run(spark, [(1, "Batch before merge")], ["merge", "batch"])
        assert got[1][0] == 1  # batch at 1 beats merge at 14

    def test_absent_terms_null(self, spark):
        got = self._run(spark, [(1, "nothing to see"), (2, None)], ["merge"])
        assert got[1] == (None, None)
        assert got[2] == (None, None)

    def test_prefix_tie_takes_list_order_length(self, spark):
        # both terms match at pos 1; 'mergesort' is listed first so its
        # length drives the window end
        got = self._run(spark, [(1, "mergesort " + "z" * 50)],
                        ["mergesort", "merge"], radius=5)
        assert got[1][0] == 1
        assert got[1][1] == "mergesort zzzz" + "…"


class TestPhraseSearch:
    """Positional phrase match — the anchor-trick postings evaluation."""

    def _run(self, spark, rows, phrase):
        from bathyscaphe_spark.operators.search import phrase_search

        df = spark.createDataFrame(rows, "url string, body string")
        return {
            r["url"]: (r["n_hits"], r["first_pos"])
            for r in phrase_search(df, phrase).collect()
        }

    def test_tokenized_adjacency_beats_substring(self, spark):
        got = self._run(
            spark,
            [("u1", "big order agg, order! end"), ("u2", "order order agg")],
            "order agg order",
        )
        # u1: punctuation between tokens still adjacent after tokenize
        assert got == {"u1": (1, 1)}

    def test_repeated_term_no_false_positive(self, spark):
        # has all terms, right bag, wrong order — must NOT match
        got = self._run(spark, [("u", "agg order order x")], "order agg order")
        assert got == {}

    def test_multiple_hits_and_first_pos(self, spark):
        got = self._run(
            spark, [("u", "a b c x a b c")], "a b c"
        )
        assert got == {"u": (2, 0)}

    def test_overlapping_occurrences_counted(self, spark):
        got = self._run(spark, [("u", "x a a a a")], "a a")
        assert got == {"u": (3, 1)}

    def test_single_term_phrase(self, spark):
        got = self._run(spark, [("u", "q w q")], "q")
        assert got == {"u": (2, 0)}

    def test_case_insensitive(self, spark):
        got = self._run(spark, [("u", "Order AGG order")], "order agg order")
        assert got == {"u": (1, 0)}

    def test_empty_phrase_raises(self, spark):
        import pytest as _pytest

        from bathyscaphe_spark.operators.search import phrase_search

        df = spark.createDataFrame([("u", "x")], "url string, body string")
        with _pytest.raises(ValueError):
            phrase_search(df, "   ")


class TestMoreLikeThis:
    """tf-idf related-document retrieval (Lucene MLT formulation)."""

    def _run(self, spark, rows, seed, **kw):
        from bathyscaphe_spark.operators.search import more_like_this

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return [
            (r["doc_id"], r["score_micro"], r["n_shared_terms"])
            for r in more_like_this(df, seed, **kw).collect()
        ]

    def test_shared_rare_terms_rank_first(self, spark):
        rows = [
            (1, "quantum flux capacitor theory"),
            (2, "quantum flux capacitor experiments"),  # 3 rare shared
            (3, "quantum mechanics overview"),          # 1 rare shared
            (4, "cooking pasta recipes tonight"),       # disjoint
        ]
        got = self._run(spark, rows, 1, m_terms=4, k=3)
        assert [d for d, _, _ in got[:2]] == [2, 3]
        assert all(d != 4 for d, _, _ in got)  # no shared query terms
        assert got[0][2] == 3 and got[1][2] == 1

    def test_seed_excluded_and_k_respected(self, spark):
        rows = [(i, "alpha beta gamma") for i in range(8)]
        got = self._run(spark, rows, 3, k=4)
        assert len(got) == 4 and all(d != 3 for d, _, _ in got)

    def test_m_terms_limits_query(self, spark):
        # seed's highest tf*idf term is the rare one it repeats
        rows = [
            (1, "zzyx zzyx zzyx common common"),
            (2, "zzyx common"),
            (3, "common common"),
        ]
        got = self._run(spark, rows, 1, m_terms=1, k=5)
        # only 'zzyx' queries ('common' has low idf): doc 3 unmatched
        assert [d for d, _, _ in got] == [2]

    def test_partition_bit_identity(self, spark):
        from bathyscaphe_spark.operators.search import more_like_this

        rows = [(i, " ".join(f"w{(i * j) % 17}" for j in range(1, 10)))
                for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = [tuple(r) for r in more_like_this(df.repartition(1), 5).collect()]
        b = [tuple(r) for r in more_like_this(df.repartition(9), 5).collect()]
        assert a == b and len(a) == 10


class TestMergeIndex:
    def _idx(self, spark, rows):
        from bathyscaphe_spark.operators.search import build_inverted_index

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return build_inverted_index(df, "doc_id", "text")

    def _postings(self, idx):
        from bathyscaphe_spark.operators.search import explode_index

        return {
            (r["term"], r["doc"]): r["tf"] for r in explode_index(idx).collect()
        }

    def test_explode_roundtrip(self, spark):
        idx = self._idx(spark, [(1, "a b a"), (5, "b c"), (9, "a")])
        assert self._postings(idx) == {
            ("a", 1): 2, ("a", 9): 1, ("b", 1): 1, ("b", 5): 1, ("c", 5): 1,
        }

    def test_replacement_removes_stale_terms(self, spark):
        """A recrawled doc's OLD terms must vanish, even terms the new
        capture no longer contains."""
        from bathyscaphe_spark.operators.search import merge_index

        base = self._idx(spark, [(1, "old stale"), (2, "keep")])
        delta = self._idx(spark, [(1, "fresh")])
        got = self._postings(merge_index(base, delta))
        assert got == {("fresh", 1): 1, ("keep", 2): 1}

    def test_tombstones_hit_both_sides(self, spark):
        from bathyscaphe_spark.operators.search import merge_index

        base = self._idx(spark, [(1, "a"), (2, "b")])
        delta = self._idx(spark, [(2, "b2"), (3, "c")])
        tombs = spark.createDataFrame([(2,), (3,)], "doc long")
        got = self._postings(merge_index(base, delta, tombstones=tombs))
        assert got == {("a", 1): 1}

    def test_stats_match_from_scratch_build(self, spark):
        from bathyscaphe_spark.operators.search import merge_index

        base = self._idx(spark, [(i, f"w{i % 3} common") for i in range(1, 9)])
        delta = self._idx(spark, [(4, "w0 common common"), (20, "w9")])
        merged = merge_index(base, delta)
        rebuilt = self._idx(
            spark,
            [(i, f"w{i % 3} common") for i in range(1, 9) if i != 4]
            + [(4, "w0 common common"), (20, "w9")],
        )
        canon = lambda idx: sorted(
            map(tuple, idx.selectExpr(
                "term", "df", "total_tf",
                "concat_ws(',', deltas)", "concat_ws(',', tfs)").collect())
        )
        assert canon(merged) == canon(rebuilt)

    def test_partition_invariance(self, spark):
        from bathyscaphe_spark.operators.search import merge_index

        rows = [(i, f"t{i % 7} t{i % 5} x") for i in range(40)]
        base = self._idx(spark, rows)
        delta = self._idx(spark, [(i, "t0 y") for i in range(0, 40, 6)])
        a = self._postings(merge_index(base.coalesce(1), delta.coalesce(1)))
        b = self._postings(
            merge_index(base.repartition(7), delta.repartition(3))
        )
        assert a == b


# --- tf-idf all-pairs similarity join ----------------------------------------

from bathyscaphe_spark.operators.search import tfidf_allpairs


def _ap_reference(docs, tau_num, tau_den, max_df):
    """Pure-python mirror of the all-pairs semantics (same rounding)."""
    import re as _re

    toks = {
        i: [w for w in _re.split(r"[^a-z0-9]+", t.lower()) if w]
        for i, t in docs
    }
    n = len(docs)
    df = {}
    for ws in toks.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    idf = {
        t: round(1000.0 * math.log((n + 1) / (d + 1)))
        for t, d in df.items()
        if d <= max_df
    }
    vecs = {
        i: {
            t: ws.count(t) * idf[t]
            for t in set(ws)
            if idf.get(t, 0) > 0
        }
        for i, ws in toks.items()
    }
    out = []
    ids = sorted(vecs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = vecs[ids[x]], vecs[ids[y]]
            dot = sum(a[t] * b[t] for t in a if t in b)
            na = sum(w * w for w in a.values())
            nb = sum(w * w for w in b.values())
            if dot > 0 and tau_den**2 * dot * dot >= tau_num**2 * na * nb:
                out.append((ids[x], ids[y], dot, na, nb))
    return sorted(out)


_AP_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "pack my box with five dozen liquor jugs"),
    (4, "pack my box with five dozen liquor jugs"),  # exact dup of 3
    (5, "entirely unrelated words appear here tonight"),
    (6, "quick brown dogs and lazy foxes jump sometimes"),
]


def test_allpairs_matches_reference_mirror(spark):
    docs = spark.createDataFrame(_AP_DOCS, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in tfidf_allpairs(docs, 3, 10, 10**9).collect()
    )
    assert got == _ap_reference(_AP_DOCS, 3, 10, 10**9)
    # the exact-dup pair is present with dot == both norms (cos == 1)
    dup = [r for r in got if r[0] == 3 and r[1] == 4]
    assert len(dup) == 1 and dup[0][2] == dup[0][3] == dup[0][4]


def test_allpairs_threshold_and_maxdf(spark):
    docs = spark.createDataFrame(_AP_DOCS, "doc_id long, text string")
    # tau = 999/1000 keeps only the exact duplicate
    strict = tfidf_allpairs(docs, 999, 1000, 10**9).collect()
    assert [(r.doc_a, r.doc_b) for r in strict] == [(3, 4)]
    # max_df=1 drops every shared term -> no candidate pairs at all
    assert tfidf_allpairs(docs, 1, 10**9, 1).count() == 0
    # mirror agrees on the max_df cut too
    assert _ap_reference(_AP_DOCS, 1, 10**9, 1) == []


def test_allpairs_parallelism_invariance(spark):
    docs = spark.createDataFrame(_AP_DOCS, "doc_id long, text string")
    one = sorted(
        tuple(r)
        for r in tfidf_allpairs(docs.coalesce(1), 3, 10, 10**9).collect()
    )
    many = sorted(
        tuple(r)
        for r in tfidf_allpairs(docs.repartition(7), 3, 10, 10**9).collect()
    )
    assert one == many


# --- MaxScore pruned retrieval ----------------------------------------------

import duckdb

from bathyscaphe_spark.operators.search import maxscore_topk, percolate


def _exhaustive_bm25(rows, terms, k):
    """Exhaustive token-split BM25 in DuckDB — the oracle shape."""
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    ts = sorted(set(terms))
    in_list = ", ".join(f"'{t}'" for t in ts)
    tf_cols = ", ".join(
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN tf END), 0) AS tf_{i}"
        for i, t in enumerate(ts)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{i}"
        for i in range(len(ts))
    )
    score = " + ".join(
        f"ln(1.0 + (n_docs::DOUBLE - df_{i}::DOUBLE + 0.5) / (df_{i}::DOUBLE + 0.5))"
        f" * (tf_{i}::DOUBLE * {BM25_K1 + 1.0!r})"
        f" / (tf_{i}::DOUBLE + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r}"
        f" * dl::DOUBLE / (sum_dl::DOUBLE / n_docs::DOUBLE)))"
        for i in range(len(ts))
    )
    return con.execute(f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x != '')) AS term FROM d),
dls AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM tok GROUP BY doc_id),
tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM tok
       WHERE term IN ({in_list}) GROUP BY doc_id, term),
piv AS (SELECT d.doc_id, COALESCE(dls.dl, 0) AS dl, {tf_cols}
        FROM d LEFT JOIN dls USING (doc_id) LEFT JOIN tf USING (doc_id)
        GROUP BY d.doc_id, COALESCE(dls.dl, 0)),
stats AS (SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS sum_dl,
                 {df_cols} FROM piv),
scored AS (SELECT doc_id, round(0.0 + {score}, 6) AS score6
           FROM piv CROSS JOIN stats)
SELECT doc_id, score6 FROM scored WHERE score6 > 0
ORDER BY score6 DESC, doc_id ASC LIMIT {k}
""").fetchall()


def _planted_corpus():
    # 60 docs: "rare" appears in 6, "filler"/"common" near-everywhere;
    # varying lengths exercise the dl normalization
    rows = []
    for i in range(60):
        words = ["common"] * (1 + i % 4) + ["filler"] * (2 + i % 3)
        if i % 10 == 0:
            words += ["rare"] * (1 + i % 2)
        words += ["pad"] * (i % 7)
        rows.append((i, " ".join(words)))
    return rows


class TestMaxScore:
    def test_equals_exhaustive_on_planted_corpus(self, spark):
        rows = _planted_corpus()
        terms = ["rare", "common", "filler"]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = [
            (r["doc_id"], r["score6"])
            for r in maxscore_topk(df, terms, k=10).collect()
        ]
        want = _exhaustive_bm25(rows, terms, 10)
        assert got == [(d, s) for d, s in want]

    def test_prunes_to_rare_postings(self, spark):
        # with k=3 < |rare postings| = 6 and two weak terms, θ from the
        # rare seed exceeds the weak tail — every result contains
        # "rare", proving the essential cut bites without losing rows
        rows = _planted_corpus()
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = maxscore_topk(df, ["rare", "common", "filler"], k=3).collect()
        assert len(got) == 3
        by_id = dict(rows)
        assert all("rare" in by_id[r["doc_id"]] for r in got)

    def test_all_absent_terms_empty(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta")], "doc_id long, text string"
        )
        assert maxscore_topk(df, ["zzz", "qqq"], k=5).count() == 0

    def test_fewer_matches_than_k(self, spark):
        rows = [(1, "alpha beta"), (2, "beta gamma"), (3, "delta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = maxscore_topk(df, ["beta"], k=10).collect()
        assert sorted(r["doc_id"] for r in got) == [1, 2]

    def test_partition_invariance(self, spark):
        rows = _planted_corpus()
        terms = ["rare", "filler"]
        a = maxscore_topk(
            spark.createDataFrame(rows, "doc_id long, text string")
            .repartition(1),
            terms, k=8,
        ).collect()
        b = maxscore_topk(
            spark.createDataFrame(rows, "doc_id long, text string")
            .repartition(13),
            terms, k=8,
        ).collect()
        assert [(r["doc_id"], r["score6"]) for r in a] == [
            (r["doc_id"], r["score6"]) for r in b
        ]


# --- percolator ---------------------------------------------------------------


class TestPercolate:
    def _qs(self, spark, rows):
        return spark.createDataFrame(rows, "query_id long, terms array<string>")

    def test_and_semantics(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha delta"), (3, "beta")],
            "doc_id long, text string",
        )
        qs = self._qs(spark, [(0, ["alpha", "beta"]), (1, ["alpha"])])
        got = {
            (r["query_id"], r["doc_id"])
            for r in percolate(docs, qs).collect()
        }
        assert got == {(0, 1), (1, 1), (1, 2)}

    def test_repeated_doc_term_not_double_counted(self, spark):
        # "alpha alpha" must not satisfy the 2-term AND by multiplicity
        docs = spark.createDataFrame(
            [(1, "alpha alpha")], "doc_id long, text string"
        )
        qs = self._qs(spark, [(0, ["alpha", "beta"])])
        assert percolate(docs, qs).count() == 0

    def test_case_folding_and_separators(self, spark):
        docs = spark.createDataFrame(
            [(1, "ALPHA-beta,GAMMA")], "doc_id long, text string"
        )
        qs = self._qs(spark, [(0, ["Alpha", "gamma"])])
        assert percolate(docs, qs).count() == 1


# --- BM25F fielded ranking -----------------------------------------------------

from bathyscaphe_spark.operators.search import bm25f_search


class TestBM25F:
    def _res(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, title string, body string, anchor string"
        )

    def test_anchor_only_hit_ranks(self, spark):
        # a doc matched ONLY via anchor text must outrank a non-match —
        # the whole point of carrying off-page text
        df = self._res(spark, [
            ("u1", "plain", "nothing here", "alpha description"),
            ("u2", "plain", "nothing there", "other words"),
        ])
        got = bm25f_search(df, ["alpha"], k=5).collect()
        assert [r["url"] for r in got] == ["u1"]

    def test_matches_reference_formula(self, spark):
        # exact python mirror of the BM25F arithmetic (field-pooled tf
        # BEFORE saturation), scores compared at the round-6 contract
        import math

        from bathyscaphe_spark.operators.search import BM25F_FIELDS, BM25_K1

        rows = [
            ("u1", "alpha x", "y y alpha", "alpha link"),
            ("u2", "none", "alpha " * 3 + "pad", ""),
            ("u3", "alpha alpha", "w " * 9, "other"),
        ]
        got = {
            r["url"]: r["score6"]
            for r in bm25f_search(self._res(spark, rows), ["alpha"], k=9).collect()
        }
        fields = {f: i + 1 for i, (f, _, _) in enumerate(BM25F_FIELDS)}
        dls = {f: [len(r[i].split()) for r in rows] for f, i in fields.items()}
        tfs = {
            f: [r[i].lower().split().count("alpha") for r in rows]
            for f, i in fields.items()
        }
        n = len(rows)
        df = sum(
            1 for j in range(n) if any(tfs[f][j] for f in fields)
        )
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        want = {}
        for j, r in enumerate(rows):
            w = 0.0
            for f, boost, b in BM25F_FIELDS:
                avg = sum(dls[f]) / n
                w += boost * tfs[f][j] / (1.0 + b * (dls[f][j] / avg - 1.0))
            s = round(idf * w / (BM25_K1 + w), 6)
            if s > 0:
                want[r[0]] = s
        assert got == want

    def test_deterministic_order_and_k(self, spark):
        rows = [
            (f"u{i:02d}", "alpha", f"alpha {'w ' * (i % 5)}", "")
            for i in range(12)
        ]
        got = bm25f_search(self._res(spark, rows), ["alpha"], k=7)
        assert got.count() == 7
        a = [r["url"] for r in got.collect()]
        b = [
            r["url"]
            for r in bm25f_search(
                self._res(spark, rows).repartition(9), ["alpha"], k=7
            ).collect()
        ]
        assert a == b
