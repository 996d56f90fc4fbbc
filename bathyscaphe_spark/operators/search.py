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
