"""Text-analysis column expressions shared by the contract queries and
the ingest enrichment path (all pure codegen — no UDFs)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LANG_VOTES: tuple[tuple[str, tuple[str, str]], ...] = (
    ("en", (" the ", " and ")),
    ("fr", (" le ", " et ")),
    ("de", (" der ", " und ")),
)


def lang_guess_col(text: Column) -> Column:
    """n-gram-heuristic language ID: stopword votes with a fixed
    tie-break (en > fr > de).  Mirrors the `lang_guess` oracle."""
    t = F.lower(text)
    votes = {
        lang: sum(
            (F.regexp_count(t, F.lit(w)) for w in words), start=F.lit(0)
        )
        for lang, words in _LANG_VOTES
    }
    en, fr, de = votes["en"], votes["fr"], votes["de"]
    return (
        F.when((en >= fr) & (en >= de), F.lit("en"))
        .when(fr >= de, F.lit("fr"))
        .otherwise(F.lit("de"))
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_signal_cols(text: Column) -> dict[str, Column]:
    """Gopher-rules document-quality signals (Rae et al. 2021, §A1.1 —
    public method), as INTEGER columns so the keep decision is exact
    cross-multiplied arithmetic (no float thresholds to drift between
    engines).  All pure codegen: split/filter/aggregate higher-order
    functions, no UDF.

    * ``n_words`` / ``sum_word_len`` — word count and total word chars
      (mean-word-length bounds become ``3·n ≤ Σlen ≤ 10·n``),
    * ``n_symbol`` — ``#`` and ``...`` occurrences (symbol-to-word
      ratio < 0.1 ⇒ ``10·n_symbol < n_words``),
    * ``n_alpha_words`` — words containing a letter (> 80% ⇒
      ``5·n_alpha > 4·n_words``),
    * ``n_stop`` — how many of the 8 required stopwords appear (≥ 2),
    * ``n_lines`` / ``n_bullet_lines`` / ``n_ellipsis_lines`` — bullet
      starts < 90%, ellipsis ends < 30% of lines.
    """
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    lines = F.split(text, "\n")
    lwords = F.transform(words, F.lower)
    n_stop = sum(
        (F.array_contains(lwords, s).cast("long") for s in GOPHER_STOPWORDS),
        start=F.lit(0).cast("long"),
    )
    return {
        "n_words": F.size(words).cast("long"),
        "sum_word_len": F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ),
        "n_symbol": (
            F.regexp_count(text, F.lit("#")) + F.regexp_count(text, F.lit(r"\.\.\."))
        ).cast("long"),
        "n_alpha_words": F.size(
            F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
        ).cast("long"),
        "n_stop": n_stop,
        "n_lines": F.size(lines).cast("long"),
        "n_bullet_lines": F.size(
            F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
        ).cast("long"),
        "n_ellipsis_lines": F.size(
            F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$"))
        ).cast("long"),
    }


def gopher_keep_col(s: dict[str, Column]) -> Column:
    """The Gopher keep decision from :func:`gopher_signal_cols` signals —
    integer cross-multiplications only, mirrored verbatim by the DuckDB
    oracle."""
    return (
        s["n_words"].between(50, 100_000)
        & (3 * s["n_words"] <= s["sum_word_len"])
        & (s["sum_word_len"] <= 10 * s["n_words"])
        & (10 * s["n_symbol"] < s["n_words"])
        & (5 * s["n_alpha_words"] > 4 * s["n_words"])
        & (s["n_stop"] >= 2)
        & (10 * s["n_bullet_lines"] < 9 * s["n_lines"])
        & (10 * s["n_ellipsis_lines"] < 3 * s["n_lines"])
    )


def nfc_normalize_udf():
    """Arrow-batched NFC normalizer (unicode canonical composition —
    the pass that runs before any exact/near dedup so 'e'+U+0301 and
    'é' hash identically).  Returned lazily so importing this module
    never requires an active SparkSession."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _nfc(s):  # annotation-free: module-level `from __future__
        # annotations` would stringify hints the UDF resolver can't eval
        try:
            return s.str.normalize("NFC")  # vectorized pandas path
        except (AttributeError, TypeError):
            return s.map(
                lambda t: unicodedata.normalize("NFC", t) if t is not None else None
            )

    return pandas_udf(_nfc, StringType())


def clean_text_col(text: Column) -> Column:
    """Training-corpus text canonicalization: NFC unicode composition →
    control-character strip → whitespace collapse → trim.  Everything
    after the NFC step is JVM-side regexp; mirrored exactly by the
    DuckDB oracle (nfc_normalize + regexp_replace)."""
    t = nfc_normalize_udf()(text)
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    t = F.regexp_replace(t, "\\s+", " ")
    return F.trim(t)


# --- PII scrubbing ----------------------------------------------------------
#
# The redaction pass public web-text pipelines run before training
# (CCNet / FineWeb style): emails, IPv4 literals, and phone-shaped
# digit runs are replaced with typed placeholders.  Patterns are
# restricted to the syntax subset where Java regex (Spark) and RE2
# (DuckDB) agree exactly — no lookaround, no backrefs, ASCII classes
# only — so the oracle can run the literal same patterns.  Application
# ORDER is part of the contract (email → ipv4 → phone: an email's
# digits must not later count as a phone) and each count is taken on
# the stage the pattern actually sees.

PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PII_PHONE = "\\+?[0-9][0-9 .-]{7,}[0-9]"


def pii_scrub_cols(text: Column) -> dict[str, Column]:
    """(scrubbed, n_emails, n_ips, n_phones) — pure codegen regexp
    stages, no UDF.  Counts are BIGINT for hash stability."""
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL)).cast("long")
    t1 = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(PII_IPV4)).cast("long")
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE)).cast("long")
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return {
        "scrubbed": t3,
        "n_emails": n_emails,
        "n_ips": n_ips,
        "n_phones": n_phones,
    }


def dup_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """Overlap-aware duplicate n-gram character fractions — the
    remaining Gopher repetition rules (Rae et al. 2021 §A1.2: fraction
    of characters inside ANY n-gram that occurs more than once in the
    document, counting each character once however many duplicate
    n-grams overlap it; thresholds 0.15 at n=5 down to 0.10 at n=10).
    ``repetition_stats`` covers the dup-line and top-2-gram rules; this
    adds the 5..10-gram family that catches stutter loops and template
    spam those two miss.

    Coverage without interval merging: token position q sits inside a
    duplicated n-gram iff some duplicated gram STARTS at p ∈
    [q−n+1, q], so covered(q) is a windowed MAX of the dup-start flag
    over the last n−1 rows — positions are dense per document, making
    ROWS ≡ RANGE.  Three window families share one hash-partition by
    document: gram assembly (lead), dup-start flags (count over
    (doc, gram)), coverage (max over trailing rows).  Characters are
    word characters (whitespace excluded — documented determinism
    choice, both engines replicate it exactly).

    Scale: everything is per-document windows — shuffle keys are the
    document id (+ gram), partition size is bounded by document length,
    never corpus size; no joins, no UDFs, no driver state.

    Output per document: n_tokens, total_chars, dup{n}_chars and
    dup{n}_pm (permille, floor) for each n.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    pos = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "w"))
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    out = pos
    for n in ns:
        parts = [F.col("w")] + [F.lead("w", i).over(wdoc) for i in range(1, n)]
        out = out.withColumn(
            f"_g{n}",
            F.when(
                F.lead("w", n - 1).over(wdoc).isNotNull(),
                F.concat_ws(" ", *parts),
            ),
        )
    for n in ns:
        wg = Window.partitionBy(id_col, f"_g{n}")
        out = out.withColumn(
            f"_s{n}",
            (
                F.col(f"_g{n}").isNotNull()
                & (F.count(F.lit(1)).over(wg) > 1)
            ).cast("int"),
        )
    for n in ns:
        out = out.withColumn(
            f"_c{n}", F.max(f"_s{n}").over(wdoc.rowsBetween(-(n - 1), 0))
        )
    wlen = F.length("w")
    aggs = [
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(wlen).cast("long").alias("total_chars"),
    ]
    for n in ns:
        aggs.append(
            F.sum(F.when(F.col(f"_c{n}") == 1, wlen).otherwise(0))
            .cast("long")
            .alias(f"dup{n}_chars")
        )
    agg = out.groupBy(id_col).agg(*aggs)
    for n in ns:
        agg = agg.withColumn(
            f"dup{n}_pm",
            F.expr(f"(dup{n}_chars * 1000) DIV total_chars").cast("long"),
        )
    return agg


# card-shaped digit runs (13-19 digits, space/dash separators allowed);
# Java∩RE2-safe like the PII_* patterns, shared verbatim with the oracle
PII_CARD = r"\b(?:\d[ -]?){12,18}\d\b"


def luhn_valid_col(cand: Column) -> Column:
    """Luhn (mod-10) checksum over a card-shaped candidate — TRUE iff
    the separator-stripped digits are 13-19 long and checksum to 0.
    Pure codegen: reversed digit positions double every second digit
    (9-subtract on overflow), one aggregate fold — the exact public
    algorithm, no UDF."""
    digits = F.regexp_replace(cand, "[ -]", "")
    n = F.length(digits)
    rev = F.reverse(digits)
    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            i % 2 == 1, F.ascii(rev.substr(i, F.lit(1))) - 48
        ).otherwise(
            F.when(
                (F.ascii(rev.substr(i, F.lit(1))) - 48) * 2 > 9,
                (F.ascii(rev.substr(i, F.lit(1))) - 48) * 2 - 9,
            ).otherwise((F.ascii(rev.substr(i, F.lit(1))) - 48) * 2)
        ),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def card_scrub_cols(text: Column) -> dict[str, Column]:
    """(scrubbed, n_cards) — payment-card redaction with CHECKSUM
    validation, the step plain regex PII passes can't do: a 16-digit
    order number that fails Luhn survives, a real PAN (any spacing)
    redacts.  Candidates extract once, the Luhn fold filters them, and
    a chained literal replace rewrites only validated matches — all
    codegen, map-only, the same stage-order discipline as
    ``pii_scrub_cols``."""
    cands = F.regexp_extract_all(text, F.lit(PII_CARD), 0)
    valid = F.filter(cands, luhn_valid_col)
    scrubbed = F.aggregate(
        valid, text, lambda acc, c: F.replace(acc, c, F.lit("<CARD>"))
    )
    return {
        "scrubbed": scrubbed,
        "n_cards": F.size(valid).cast("long"),
    }


# Unicode script ranges in \x{...} form — the ONE range syntax Java
# regex and RE2 read identically (Java's \p{IsCyrillic} vs RE2's
# \p{Cyrillic} would silently diverge); shared verbatim with the oracle.
_LATIN = "A-Za-z"
_CYRILLIC = "\\x{0400}-\\x{04FF}"
_GREEK = "\\x{0370}-\\x{03FF}"
MIXED_TOKEN_RE = (
    f"[{_LATIN}][^\\s]*[{_CYRILLIC}{_GREEK}]"
    f"|[{_CYRILLIC}{_GREEK}][^\\s]*[{_LATIN}]"
)


def script_mix_cols(text: Column) -> dict[str, Column]:
    """(latin_chars, cyrillic_chars, greek_chars, mixed_tokens,
    clean) — the homoglyph-spoof signal: a token mixing Latin with
    Cyrillic/Greek letters ('pаypal' with U+0430) is the classic
    phishing / SEO-cloak tell that per-script character counts alone
    miss (a legitimately bilingual page mixes scripts across tokens,
    never inside one).  Pure codegen regexp counts, map-only."""
    return {
        "latin_chars": F.regexp_count(text, F.lit(f"[{_LATIN}]")).cast("long"),
        "cyrillic_chars": F.regexp_count(
            text, F.lit(f"[{_CYRILLIC}]")
        ).cast("long"),
        "greek_chars": F.regexp_count(text, F.lit(f"[{_GREEK}]")).cast("long"),
        "mixed_tokens": F.regexp_count(text, F.lit(MIXED_TOKEN_RE)).cast("long"),
        "clean": F.regexp_count(text, F.lit(MIXED_TOKEN_RE)) == 0,
    }
