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
