"""Full-text retrieval over the ``resources`` table.

The reference's indexer exists so users can SEARCH the ES ``resources``
index — `/root/reference/internal/indexer/index/elastic.go:13-56` maps
``body``/``title``/``description`` as analyzed text and ``url`` as
text+keyword.  The engine persists the same schema; this operator is the
matching query surface: keyword match over title+body with a
term-frequency score (title hits boosted, optional exact-phrase boost)
and a deterministic (score DESC, url ASC) top-k.

Scale design: the score is a pure codegen column expression
(``regexp_count`` per term — whole-stage codegen, no UDF, no shuffle
until the final top-k), and the top-k is ``orderBy(...).limit(k)`` which
Spark executes as TakeOrderedAndProject: per-partition k-heaps plus a
driver merge of #partitions × k rows — never a global sort of the
corpus.  At 100 TB the scan prunes to (url, title, body) columns only.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TITLE_BOOST = 3
PHRASE_BOOST = 10


def _tf(col: Column, term: str) -> Column:
    """ASCII word-boundary term frequency, case-folded — the analyzed
    `match` semantics of the ES mapping, kept to constructs with
    identical regex behavior in Java and RE2 (`\\b`, literal escapes)."""
    pat = r"\b" + re.escape(term.lower()) + r"\b"
    return F.regexp_count(F.lower(col), F.lit(pat)).cast("long")


def keyword_search(
    resources: DataFrame,
    terms: list[str],
    phrase: str | None = None,
    k: int = 10,
    url_col: str = "url",
    title_col: str = "title",
    body_col: str = "body",
) -> DataFrame:
    """OR-semantics keyword match (any term hits ⇒ row matches, like an
    ES ``match`` query) scored by summed term frequency with title hits
    ×TITLE_BOOST and an optional exact-phrase bonus ×PHRASE_BOOST.

    Returns (url, title, score) — top ``k`` by (score DESC, url ASC);
    ``url`` is unique in resources so the cut is total-ordered and
    engine-independent.
    """
    score: Column = F.lit(0).cast("long")
    for t in terms:
        score = score + TITLE_BOOST * _tf(F.col(title_col), t) + _tf(
            F.col(body_col), t
        )
    if phrase:
        score = score + PHRASE_BOOST * _tf(F.col(body_col), phrase)
    return (
        resources.select(
            F.col(url_col).alias("url"),
            F.col(title_col).alias("title"),
            score.alias("score"),
        )
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("url"))
        .limit(k)
    )


# --- inverted index (build side) -------------------------------------------

TOKEN_SPLIT = "[^a-z0-9]+"  # shared with the DuckDB oracle verbatim


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stop_df: int = 10**9,
) -> DataFrame:
    """Materialize the classic search index the query operators above
    score against on the fly: per term, document frequency, total term
    frequency, and a doc-id-sorted postings list stored DELTA-ENCODED
    (first gap from 0, i.e. the first posting is the doc id itself) —
    the standard compressed-postings layout (Zobel & Moffat 2006,
    public), here as integer gap arrays ready for varint packing at
    the storage layer.

    Output: (term, df, total_tf, deltas: array<long>, tfs: array<long>)
    with ``deltas``/``tfs`` NULL for STOP terms (df > ``stop_df``).

    Scale design — the skew case is the whole problem: a stopword's
    postings list is corpus-sized, and building it just to throw it
    away OOMs the executor.  The plan:

      1. tokenize → ``groupBy(term, doc)`` tf counts (map-side partial
         agg folds within-doc repeats before the shuffle);
      2. the stop list is found by an AGGREGATED per-term stats pass
         and broadcast-anti-joined away MAP-SIDE, so a stopword's
         corpus-sized row set never enters the postings exchange and
         every per-term partition that IS exchanged holds ≤ stop_df
         rows — see ``_assemble_index`` for why this beats the
         one-exchange window form.  A pure codegen ``transform`` turns
         sorted ids into gaps.

    Determinism: postings are sorted inside the array, gaps are exact
    integer arithmetic.
    """
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = tok.groupBy("term", "doc").agg(F.count(F.lit(1)).alias("tf"))
    return _assemble_index(tf, stop_df)


def _assemble_index(tf: DataFrame, stop_df: int) -> DataFrame:
    """(term, doc, tf) rows → the materialized index layout.  Shared by
    the from-scratch build and the segment merge; see
    build_inverted_index for the two-phase stop-term discipline.

    Skew-safe two-phase plan — hot terms are bounded BEFORE any
    full-row term exchange:

      1. per-term stats via ``groupBy(term)``: partial aggregation
         folds a stopword's occurrences map-side, so the stats
         exchange ships one aggregated row per (map partition, term),
         never the occurrence rows;
      2. the stop list (df > stop_df) broadcasts and anti-joins
         MAP-SIDE: a stop term's corpus-sized row set never enters the
         postings exchange at all.  |stop| ≤ total_rows / stop_df by
         construction, so the broadcast is bounded;
      3. the survivors aggregate postings in ONE term-keyed exchange
         with every array ≤ stop_df entries; df/total_tf are
         recomputed from the array by pure-codegen ``size`` /
         ``aggregate`` — no stats⋈postings join;
      4. stop terms re-enter as a union of their aggregated stats rows
         with NULL postings.

    A per-term count WINDOW would do this in one exchange, but
    WindowExec must buffer + sort each term's FULL row set before a
    conditional collect can skip anything — one corpus-sized straggler
    partition per stopword (and windows cannot be skew-split by AQE).
    The aggregated pre-pass is the price of never forming that
    partition.  ``tf`` and ``stats`` are lazily localCheckpoint'ed:
    ``tf`` feeds stats + postings with one tokenize+shuffle, and
    ``stats`` feeds the broadcast stop list + the final union without
    re-running the corpus-wide aggregation per consumer."""
    tf = tf.localCheckpoint(eager=False)
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    ).localCheckpoint(eager=False)
    stop = stats.where(F.col("df") > stop_df)
    kept = tf.join(F.broadcast(stop.select("term")), "term", "left_anti")
    live = (
        kept.groupBy("term")
        .agg(F.array_sort(F.collect_list(F.struct("doc", "tf"))).alias("p"))
        .select(
            "term",
            F.size("p").cast("long").alias("df"),
            F.expr(
                "aggregate(p, CAST(0 AS BIGINT), (acc, x) -> acc + x.tf)"
            ).alias("total_tf"),
            F.expr(
                "transform(p, (x, i) -> CASE WHEN i = 0 THEN x.doc "
                "ELSE x.doc - element_at(p, i).doc END)"
            ).alias("deltas"),
            F.expr("transform(p, x -> x.tf)").alias("tfs"),
        )
    )
    return live.unionByName(
        stop.select(
            "term",
            "df",
            "total_tf",
            F.lit(None).cast("array<long>").alias("deltas"),
            F.lit(None).cast("array<long>").alias("tfs"),
        )
    )


def explode_index(idx: DataFrame) -> DataFrame:
    """Materialized index → (term, doc, tf) rows: absolute doc ids
    reconstructed from the gap encoding.  Terms with NULL postings
    (stop terms in the source index) have no recoverable postings and
    are dropped — see merge_index.

    The prefix sum runs as a per-term running-sum WINDOW over the
    posexploded gaps: the former in-array ``aggregate``+``array_append``
    form copied the growing array once per element — O(L²) bytes per
    postings list, which at a hot term's corpus-sized L dominated the
    whole merge (measured: the q_index_merge assemble dropped ~2× after
    this change).  The window is keyed and ordered by data the arrays
    already carry (term, position), costs one term-keyed exchange that
    the downstream re-assembly groupBy reuses, and every partition is
    bounded by the source index's stop_df discipline."""
    z = (
        idx.where(F.col("deltas").isNotNull())
        .select(
            "term",
            F.posexplode(
                F.arrays_zip(F.col("deltas").alias("d"), F.col("tfs").alias("tf"))
            ).alias("i", "z"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("term")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return z.select(
        "term",
        F.sum("z.d").over(w).alias("doc"),
        F.col("z.tf").alias("tf"),
    )


def merge_index(
    base: DataFrame,
    delta: DataFrame,
    tombstones: DataFrame | None = None,
    stop_df: int = 10**9,
) -> DataFrame:
    """LSM-style segment merge — the incremental index maintenance a
    crawler's search sink needs at recrawl cadence (Lucene's segment
    merge, relationally): ``base`` is the standing index, ``delta`` the
    index built over this round's (re)fetched pages, ``tombstones`` a
    (doc) set of removals (blacklisted hosts, noindex flips, expiries).

    Semantics: a doc present in ``delta`` REPLACES all its base
    postings (recrawled content wins, even for terms the new capture
    no longer contains); tombstoned docs vanish from both sides; df /
    total_tf are recomputed from the surviving postings, so the merged
    index is bit-identical to a from-scratch build over the effective
    corpus — the identity the driver-contract oracle pins.

    Scale design: both indexes explode back to (term, doc, tf) rows —
    the same cardinality the from-scratch build shuffles, but ONLY the
    two segments being merged, never the corpus text (tokenization,
    the expensive part, is never repeated); the delta-doc and
    tombstone sets are doc-cardinality broadcasts, and reassembly
    reuses the stop-term-safe two-phase build.  Precondition: segments
    being merged must carry materialized postings (built with stop_df
    = ∞); stop terms in the INPUTS have NULL postings that cannot be
    reconstructed and are dropped.
    """
    b = explode_index(base)
    d = explode_index(delta)
    delta_docs = d.select("doc").distinct()
    b = b.join(F.broadcast(delta_docs), "doc", "left_anti")
    if tombstones is not None:
        t = tombstones.select("doc").distinct()
        b = b.join(F.broadcast(t), "doc", "left_anti")
        d = d.join(F.broadcast(t), "doc", "left_anti")
    return _assemble_index(b.unionByName(d), stop_df)

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(
    resources: DataFrame,
    terms: list[str],
    k: int = 10,
    url_col: str = "url",
    title_col: str = "title",
    body_col: str = "body",
) -> DataFrame:
    """Corpus-statistics BM25 over ``body`` (Robertson/Sparck Jones with
    the Lucene +1 idf floor — public formula):

        score(D) = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
                       · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Unlike ``keyword_search``'s raw TF, rare terms outrank stopwords —
    the ranking users of an ES index actually get.

    Scale design: TWO passes over the corpus, both codegen.  Pass 1 is
    one aggregation producing a single stats row (N, Σdl, df per term —
    map-side partial aggs, one scalar shuffle); it is cross-joined back
    (a 1-row broadcast, Spark plans BroadcastNestedLoopJoin) so pass 2
    scores every document with pure column expressions and finishes
    with TakeOrderedAndProject — per-partition k-heaps, never a global
    sort.  tf/df use the same Java∩RE2-safe word-boundary regex as
    keyword_search; no UDF anywhere.

    Determinism: every arithmetic step is written in one fixed order so
    Spark and an external oracle execute identical IEEE-754 binary64
    ops; ``ln`` may differ in the last ulp between libms, which is why
    the contract query rounds scores to 6 decimals (a boundary hit
    needs |Δ| ≈ 1e-16 to land within 5e-7 of a rounding edge).
    """
    dl = F.size(
        F.filter(F.split(F.lower(F.col(body_col)), r"\s+"), lambda x: x != "")
    ).cast("long")
    tfs = {t: _tf(F.col(body_col), t) for t in terms}
    scored_input = resources.select(
        F.col(url_col).alias("url"),
        F.col(title_col).alias("title"),
        dl.alias("dl"),
        *[tfs[t].alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = scored_input.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    d = scored_input.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score: Column = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - df + F.lit(0.5))
            / (df + F.lit(0.5))
        )
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl").cast("double") / avgdl
        )
        score = score + idf * (tf * F.lit(BM25_K1 + 1.0)) / denom
    return (
        d.select("url", "title", F.round(score, 6).alias("score6"))
        .where(F.col("score6") > 0)
        .orderBy(F.col("score6").desc(), F.col("url"))
        .limit(k)
    )


SNIPPET_RADIUS = 40


def with_snippets(
    results: DataFrame,
    terms: list[str],
    body_col: str = "body",
    radius: int = SNIPPET_RADIUS,
) -> DataFrame:
    """Attach a deterministic keyword-in-context snippet to search
    results — the "highlight" every ES user of the reference's
    ``resources`` index gets with their hits (elastic.go maps body as
    analyzed text precisely so the UI can excerpt it).

    Contract (fully codegen, replicated verbatim by the oracle): the
    snippet centers on the EARLIEST occurrence of any query term
    (case-insensitive, first-position-wins; ties impossible — two
    terms can't start at the same offset unless one prefixes the
    other, in which case the list order of ``terms`` breaks the tie
    via least()), spans ``radius`` chars each side clamped to the body
    bounds, and marks elided edges with '…'.  Rows where no term
    occurs keep a NULL snippet (callers already filtered to matches;
    NULL marks score-by-title-only hits).

    Adds (snip_pos, snippet).  Pure column expressions — locate +
    substring + boundary CASEs; no UDF, no shuffle, a map-only
    decoration whatever the corpus size.
    """
    body = F.col(body_col)
    low = F.lower(body)
    positions = [F.locate(t.lower(), low) for t in terms]
    # earliest positive position (0 = absent): min over positives
    pos = F.least(
        *(F.when(p > 0, p) for p in positions)
    ) if len(terms) > 1 else F.when(positions[0] > 0, positions[0])
    term_len = F.coalesce(
        *(
            F.when(p == pos, F.lit(len(t)))
            for p, t in zip(positions, terms)
        )
    )
    start = F.greatest(F.lit(1), pos - radius)
    end = F.least(F.length(body), pos + term_len - 1 + radius)
    core = F.substring(body, start.cast("int"), (end - start + 1).cast("int"))
    snippet = F.concat(
        F.when(start > 1, F.lit("…")).otherwise(F.lit("")),
        core,
        F.when(end < F.length(body), F.lit("…")).otherwise(F.lit("")),
    )
    return results.withColumn(
        "snip_pos", pos.cast("long")
    ).withColumn("snippet", F.when(pos.isNotNull(), snippet))


def phrase_search(
    docs: DataFrame,
    phrase: str,
    url_col: str = "url",
    body_col: str = "body",
) -> DataFrame:
    """Positional phrase match (the ES ``match_phrase`` surface of the
    reference's resources index): documents where the phrase's tokens
    appear CONSECUTIVELY under the shared tokenizer — which is not
    substring match ("order agg, order!" tokenizes adjacent; a regex
    over the raw body misses it), and not bag-of-words AND.

    Output: (url, n_hits, first_pos) — occurrence count and the
    0-based token position of the earliest occurrence.

    Plan — the positional-postings evaluation, all codegen: tokenize
    with positions (one ``posexplode``), broadcast-join the tiny
    (slot, term) phrase table — a term REPEATED in the phrase fans out
    to ALL its slots, which is exactly why the anchor trick is the
    correct primitive — then one ``groupBy(url, pos − slot)`` counting
    DISTINCT matched slots: an anchor with all n slots is a phrase
    occurrence.  Token rows not in the phrase vocabulary die at the
    broadcast join before any shuffle; the surviving anchor agg is
    map-side combinable.  At index scale this is how a positional
    postings index evaluates phrases — no document re-scan, no UDF.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    n = len(terms)
    spark = docs.sparkSession
    ph = spark.createDataFrame(
        list(enumerate(terms)), "slot int, term string"
    )
    tok = docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(body_col)), TOKEN_SPLIT),
                lambda x: x != "",
            )
        ).alias("p", "term"),
    )
    anchors = (
        tok.join(F.broadcast(ph), "term")
        .groupBy("url", (F.col("p") - F.col("slot")).alias("anchor"))
        .agg(F.countDistinct("slot").alias("k"))
        .where(F.col("k") == n)
    )
    return anchors.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("anchor").cast("long").alias("first_pos"),
    )


def more_like_this(
    docs: DataFrame,
    seed_id,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_terms: int = 10,
    k: int = 10,
) -> DataFrame:
    """ES ``more_like_this``: rank documents by similarity to one seed
    document — the seed's ``m_terms`` highest-tf·idf terms become the
    query, candidates are docs sharing at least one of them, scored by
    the sum of their own tf · idf over the MATCHED terms (the Lucene
    MLT formulation, public), seed excluded, top ``k`` kept.

    Output: (id, score_micro, n_shared_terms) — the k most similar.

    Determinism discipline: idf is rounded to integer micro-nats ONCE
    per term (idf_micro = round(1e6·ln((N+1)/(df+1)))); every score
    after that is an exact BIGINT dot product — bit-identical at any
    parallelism, exactly replicable in SQL.

    Scale design: one tokenize→(doc, term, tf) map-combinable agg (the
    only corpus-sized shuffle — shared shape with the inverted index),
    a per-term (df) agg, the seed's term ranking on a seed-sized slice,
    and the m query terms broadcast back: non-query tokens die at the
    broadcast join, so candidate scoring touches only the m postings
    lists.  Top-k is a global rank over the candidate table (swap for
    a threshold cut at webgraph scale).  Ties break by id.  Zero UDFs.
    """
    from pyspark.sql.window import Window

    m, kk = int(m_terms), int(k)
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda x: x != "",
            )
        ).alias("_term"),
    )
    tf = tok.groupBy("_id", "_term").agg(F.count(F.lit(1)).alias("_tf"))
    n_docs = docs.select(F.count(F.lit(1)).alias("_N"))
    idf = (
        tf.groupBy("_term")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_term",
            F.round(
                F.lit(1_000_000.0)
                * F.log((F.col("_N") + 1) / (F.col("_df") + 1)),
                0,
            )
            .cast("long")
            .alias("_idf"),
        )
    )
    wq = Window.orderBy(
        (F.col("_tf") * F.col("_idf")).desc(), F.col("_term")
    )
    qterms = (
        tf.where(F.col("_id") == seed_id)
        .join(idf, "_term")
        .withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= m)
        .select("_term", "_idf")
    )
    cand = (
        tf.where(F.col("_id") != seed_id)
        .join(F.broadcast(qterms), "_term")
        .groupBy("_id")
        .agg(
            F.sum(F.col("_tf") * F.col("_idf")).alias("_sc"),
            F.count(F.lit(1)).alias("_nt"),
        )
    )
    wk = Window.orderBy(F.col("_sc").desc(), F.col("_id"))
    return (
        cand.withColumn("_r", F.row_number().over(wk))
        .where(F.col("_r") <= kk)
        .select(
            F.col("_id").alias(id_col),
            F.col("_sc").cast("long").alias("score_micro"),
            F.col("_nt").cast("long").alias("n_shared_terms"),
        )
    )


def tfidf_allpairs(
    docs: DataFrame,
    tau_num: int = 3,
    tau_den: int = 10,
    max_df: int = 10**9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All-pairs document similarity join: every UNORDERED pair of
    documents whose tf·idf cosine similarity is ≥ tau_num/tau_den —
    the batch "related documents" / near-duplicate-cluster primitive
    (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    WWW'07 — public), relationally: candidate pairs come from an
    inverted-index self-join (two docs pair ONLY if they share a
    term), never a doc×doc cross join.

    Vector semantics (definitional, shared verbatim with the oracle):
    w(d, t) = tf(d, t) · idf_milli(t) with idf_milli =
    round(1000·ln((N+1)/(df+1))) — integer milli-nats, rounded ONCE
    per term; terms with df > ``max_df`` are excluded from the vectors
    (the stopword cut that also bounds the join's per-term fanout at
    max_df²), and idf_milli = 0 terms are dropped losslessly (zero
    weight contributes nothing to dot or norm).

    Threshold discipline — no floats anywhere: cos ≥ tau_num/tau_den
    ⟺ dot > 0 ∧ tau_den²·dot² ≥ tau_num²·‖a‖²·‖b‖², evaluated in
    DECIMAL(38,0) (int128 HUGEINT on the oracle side).  Integer
    budget: with idf_milli ≤ ~21,000 (N = 1e9, df = 1) and per-doc
    tf ≤ ~1e3, w ≤ 2.1e7, w² ≤ 4.4e14, per-doc sums ≤ ~4e18 …
    squared ≤ ~2e37 < 1e38 — inside DECIMAL(38,0) headroom; the
    milli (not micro) scale is what buys this.

    Output: (doc_a, doc_b, dot_milli2, norm_a_sq, norm_b_sq), all
    BIGINT, doc_a < doc_b — the caller derives float cosine as
    dot/sqrt(na·nb) for display; the engine never does.

    Scale design: one tokenize→(doc, term, tf) shuffle (the same shape
    the inverted index builds — at warehouse scale feed this FROM the
    index via explode_index instead of re-tokenizing), a per-term df
    agg, then the postings self-join keyed on term.  The self-join's
    cost is Σ_t df(t)² — bounded by the max_df cut exactly where the
    skew lives (a corpus-frequency term would otherwise contribute
    df² ≈ corpus² pairs).  Norm attachment is two doc-keyed shuffle
    joins (doc-cardinality, never broadcast).  Partial aggregation
    folds the per-term products map-side before the (doc_a, doc_b)
    shuffle.  Zero UDFs; bit-identical at any parallelism.
    """
    tok = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda x: x != "",
            )
        ).alias("_term"),
    )
    tf = tok.groupBy("_doc", "_term").agg(F.count(F.lit(1)).alias("_tf"))
    n_docs = docs.select(F.count(F.lit(1)).alias("_N"))
    idf = (
        tf.groupBy("_term")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_term",
            "_df",
            F.round(
                F.lit(1_000.0) * F.log((F.col("_N") + 1) / (F.col("_df") + 1)),
                0,
            )
            .cast("long")
            .alias("_idf"),
        )
    )
    w = (
        tf.join(idf, "_term")
        .where((F.col("_df") <= max_df) & (F.col("_idf") > 0))
        .select(
            "_term", "_doc", (F.col("_tf") * F.col("_idf")).alias("_w")
        )
    )
    norms = w.groupBy("_doc").agg(
        F.sum((F.col("_w") * F.col("_w")).cast("decimal(38,0)"))
        .cast("long")
        .alias("_nsq")
    )
    a = w.select("_term", F.col("_doc").alias("doc_a"), F.col("_w").alias("_wa"))
    b = w.select("_term", F.col("_doc").alias("doc_b"), F.col("_w").alias("_wb"))
    dots = (
        a.join(b, "_term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum((F.col("_wa") * F.col("_wb")).cast("decimal(38,0)"))
            .cast("long")
            .alias("_dot")
        )
    )
    na = norms.select(F.col("_doc").alias("doc_a"), F.col("_nsq").alias("norm_a_sq"))
    nb = norms.select(F.col("_doc").alias("doc_b"), F.col("_nsq").alias("norm_b_sq"))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(
            (F.col("_dot") > 0)
            & (
                F.lit(int(tau_den) * int(tau_den)) * d19("_dot") * d19("_dot")
                >= F.lit(int(tau_num) * int(tau_num))
                * d19("norm_a_sq")
                * d19("norm_b_sq")
            )
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("_dot").alias("dot_milli2"),
            "norm_a_sq",
            "norm_b_sq",
        )
    )


def maxscore_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 retrieval with MaxScore pruning (Turtle & Flood 1995,
    "Query evaluation: strategies and optimizations" — public), the
    DAAT skipping strategy every large-scale engine (Lucene since 8.0)
    uses so a query never scores the full postings of its stopwords.

    LOSSLESS by construction — the contract: this returns exactly the
    exhaustive BM25 top-k (the DuckDB oracle computes the exhaustive
    ranking; parity proves the pruning never drops a result).

    The batch MaxScore argument: let UB_t be an upper bound on term
    t's per-document score contribution and θ the k-th best FULL score
    over any known candidate subset (here: the documents containing
    the highest-UB term).  Sort terms by UB descending and take the
    minimal prefix E ("essential terms", always ≥ 1) whose complement
    satisfies Σ_{t∉E} UB_t < θ.  A document containing no essential
    term scores ≤ Σ_{t∉E} UB_t < θ ≤ the true k-th best, so it cannot
    appear in the top-k — scoring only documents that contain at least
    one essential term is exhaustive-equal, ties irrelevant (pruned
    scores are STRICTLY below θ).

    UB_t is the EXACT per-term maximum realized contribution
    (idf_t · max over postings of the tf/dl factor) — tighter than the
    textbook idf·(k1+1) bound and free: one agg over the tf rows.

    Relational shape (everything but two bounded collects is codegen):
      1. tokenize once; tf rows are filtered to QUERY TERMS BEFORE the
         groupBy — the shuffle carries Σ_t df_t rows, never the corpus
         (at index-backed scale this is the postings equi-join);
      2. stats: one row (N, Σdl) + per-term df — collected: ≤|terms|+1
         rows;
      3. θ: full scores of the top-UB term's postings, top-k collect —
         ≤ k rows;
      4. candidates: semi-join on essential terms only — the pruning;
         per-doc tfs PIVOT to fixed columns so the final score is one
         fixed-operand-order double expression (bit-stable across
         partitionings, like bm25_search), round 6 for the oracle.

    At 100 TB steps 1-2 read the persisted inverted index + doc-length
    table instead of tokenizing (build_inverted_index); the pruning
    arithmetic is unchanged.  Returns (doc_id, score6): top k by
    (score6 DESC, doc_id ASC), score6 > 0.
    """
    qterms = sorted(set(t.lower() for t in terms))
    dl_col = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != ""
        )
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc"), dl_col.alias("dl"), F.col(text_col)
    )
    tf_rows = (
        base.select(
            "doc",
            "dl",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                    lambda x: x != "",
                )
            ).alias("term"),
        )
        .where(F.col("term").isin(qterms))
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .persist()
    )

    # --- stats (one row + one tiny per-term agg; bounded collects) ---------
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["sum_dl"] or 0) / max(
        int(stats["n"]), 1
    )

    def contrib(tf: Column, dl: Column, idf: float) -> Column:
        t, d = tf.cast("double"), dl.cast("double")
        denom = t + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B) + F.lit(BM25_B) * d / F.lit(avgdl)
        )
        return F.lit(idf) * (t * F.lit(BM25_K1 + 1.0)) / denom

    import math

    df_rows = {
        r["term"]: int(r["df"])
        for r in tf_rows.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    idf = {
        t: math.log(
            1.0 + (n_docs - df_rows.get(t, 0) + 0.5) / (df_rows.get(t, 0) + 0.5)
        )
        for t in qterms
    }
    present = [t for t in qterms if df_rows.get(t)]
    if not present:
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} long, score6 double"
        )
    ub_rows = (
        tf_rows.where(F.col("term").isin(present))
        .groupBy("term")
        .agg(
            F.max(
                sum(
                    (
                        F.when(
                            F.col("term") == t,
                            contrib(F.col("tf"), F.col("dl"), idf[t]),
                        ).otherwise(F.lit(0.0))
                        for t in present
                    ),
                    F.lit(0.0),
                )
            ).alias("ub")
        )
        .collect()
    )
    ub = {r["term"]: float(r["ub"]) for r in ub_rows}
    order = sorted(present, key=lambda t: (-ub[t], t))

    def score_docs(cand_tf: DataFrame) -> DataFrame:
        """Pivot per-doc tfs to fixed columns; fixed-order expression."""
        pivoted = cand_tf.groupBy("doc", "dl").agg(
            *[
                F.max(
                    F.when(F.col("term") == t, F.col("tf")).otherwise(F.lit(0))
                ).alias(f"tf_{i}")
                for i, t in enumerate(present)
            ]
        )
        score = F.lit(0.0)
        for i, t in enumerate(present):
            score = score + contrib(F.col(f"tf_{i}"), F.col("dl"), idf[t])
        return pivoted.select("doc", F.round(score, 6).alias("score6"))

    # --- θ from the top-UB term's postings (full scores, k-row collect) ----
    t1 = order[0]
    seed_docs = tf_rows.where(F.col("term") == t1).select("doc")
    seed_topk = (
        score_docs(tf_rows.join(seed_docs, "doc", "left_semi"))
        .orderBy(F.col("score6").desc(), F.col("doc").asc())
        .limit(k)
        .collect()
    )
    # round-6 scores can round UP by ≤5e-7; retreat θ by the full
    # quantum so the strict bound Σ_{t∉E} UB_t < θ is valid against
    # TRUE scores even when the k-th seed score sat on a rounding edge
    theta = (
        float(seed_topk[-1]["score6"]) - 1e-6 if len(seed_topk) >= k else 0.0
    )

    # --- essential prefix: minimal E (≥1) with Σ_{t∉E} UB_t < θ ------------
    essential = [order[0]]
    tail = sum(ub[t] for t in order[1:])
    for t in order[1:]:
        if tail < theta:
            break
        essential.append(t)
        tail -= ub[t]

    cand = (
        tf_rows.where(F.col("term").isin(essential))
        .select("doc")
        .distinct()
    )
    out = (
        score_docs(tf_rows.join(cand, "doc", "left_semi"))
        .where(F.col("score6") > 0)
        .orderBy(F.col("score6").desc(), F.col("doc").asc())
        .limit(k)
        .select(F.col("doc").alias(id_col), "score6")
    )
    return out


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qterms_col: str = "terms",
) -> DataFrame:
    """Prospective search (the ES *percolator*, reversed retrieval —
    public concept since SIFT, Yan & Garcia-Molina 1995): standing
    queries are the stored side, arriving documents are matched
    AGAINST them — the alerting surface a crawl pipeline runs on every
    new batch ("tell me when a page mentioning X and Y appears").

    AND semantics (ES ``match`` with ``operator: and``): a query
    matches a document iff EVERY query term occurs in the document's
    token set.

    Relational shape — never queries × docs: distinct (doc, term)
    pairs equi-join the exploded query terms on ``term`` (only docs
    sharing a term with some query materialize a row), then
    count(distinct matched terms) per (query, doc) == n_terms is the
    AND.  Per-term fanout is bounded by term df × queries-per-term —
    the inverted-index discipline; a standing-query set is
    broadcast-sized in practice, and Spark's AQE picks the broadcast
    side automatically.

    Output: (query_id, doc_id) — every (standing query, document)
    match, plus n_terms for audit.
    """
    qt = queries.select(
        F.col(qid_col).alias("qid"),
        F.size(qterms_col).cast("long").alias("n_terms"),
        F.explode(qterms_col).alias("term"),
    ).select("qid", "n_terms", F.lower(F.col("term")).alias("term"))
    doc_terms = docs.select(
        F.col(id_col).alias("doc"),
        F.explode_outer(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                    lambda x: x != "",
                )
            )
        ).alias("term"),
    ).where(F.col("term").isNotNull())
    return (
        doc_terms.join(qt, "term")
        .groupBy("qid", "doc", "n_terms")
        .agg(F.count(F.lit(1)).cast("long").alias("_hit"))
        .where(F.col("_hit") == F.col("n_terms"))
        .select(
            F.col("qid").alias(qid_col),
            F.col("doc").alias(id_col),
            F.col("n_terms"),
        )
    )


BM25F_FIELDS: tuple[tuple[str, float, float], ...] = (
    # (column, boost, b) — title counts 3×, anchors 2×, body 1×
    ("title", 3.0, 0.5),
    ("body", 1.0, 0.75),
    ("anchor", 2.0, 0.5),
)


def bm25f_search(
    resources: DataFrame,
    terms: list[str],
    k: int = 10,
    url_col: str = "url",
    fields: tuple[tuple[str, float, float], ...] = BM25F_FIELDS,
) -> DataFrame:
    """Fielded BM25 — BM25F (Robertson, Zaragoza & Taylor, "Simple BM25
    extension to multiple weighted fields", CIKM 2004 — public): the
    web ranking function where a page is title + body + AGGREGATED
    ANCHOR TEXT (the words other pages use to link here — the classic
    off-page relevance signal; see ``anchor_text`` for the aggregation).
    Unlike score-summing per field, BM25F combines fields BEFORE
    saturation, so three title hits and three anchor hits reinforce
    instead of each saturating alone:

        w(t,d)  = Σ_f boost_f · tf_f / (1 + b_f·(dl_f/avgdl_f − 1))
        score(d)= Σ_t idf_t · w(t,d) / (k1 + w(t,d))

    idf uses any-field document frequency with the Lucene +1 floor.

    Plan shape = bm25_search's: one stats aggregation (single row:
    N, Σdl per field, df per term — map-side partials, scalar shuffle),
    broadcast back, pure-codegen scoring, TakeOrderedAndProject.
    Determinism: fixed operand order, round 6 (same libm-ulp caveat as
    bm25_search).  Returns (url, score6), top k by (score6 DESC, url).
    """
    proj = [F.col(url_col).alias("url")]
    for f, _, _ in fields:
        dl = F.size(
            F.filter(F.split(F.lower(F.col(f)), r"\s+"), lambda x: x != "")
        ).cast("long")
        proj.append(dl.alias(f"dl_{f}"))
        for i, t in enumerate(terms):
            proj.append(_tf(F.col(f), t).alias(f"tf_{f}_{i}"))
    d = resources.select(*proj)
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(f"dl_{f}").alias(f"sum_dl_{f}") for f, _, _ in fields],
        *[
            F.sum(
                (
                    sum(
                        (F.col(f"tf_{f}_{i}") for f, _, _ in fields),
                        F.lit(0).cast("long"),
                    )
                    > 0
                ).cast("long")
            ).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    s = d.crossJoin(F.broadcast(stats))
    n = F.col("n_docs").cast("double")
    score: Column = F.lit(0.0)
    for i in range(len(terms)):
        w: Column = F.lit(0.0)
        for f, boost, b in fields:
            # a corpus-wide empty field (Σdl = 0) has tf = 0 everywhere —
            # its contribution is 0; the guard keeps ANSI division happy
            avgdl = F.col(f"sum_dl_{f}").cast("double") / n
            ratio = F.when(
                F.col(f"sum_dl_{f}") > 0,
                F.col(f"dl_{f}").cast("double") / avgdl,
            ).otherwise(F.lit(0.0))
            norm = F.lit(1.0) + F.lit(b) * (ratio - F.lit(1.0))
            w = w + F.lit(boost) * F.col(f"tf_{f}_{i}").cast("double") / norm
        df = F.col(f"df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        score = score + idf * w / (F.lit(BM25_K1) + w)
    return (
        s.select("url", F.round(score, 6).alias("score6"))
        .where(F.col("score6") > 0)
        .orderBy(F.col("score6").desc(), F.col("url"))
        .limit(k)
    )
