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
