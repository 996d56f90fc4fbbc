"""HTML title/meta extraction for the indexer.

Reference semantics (internal/indexer/index/elastic.go:145-186, goldens in
elastic_test.go:36-60):

* title  = text of the first ``<title>`` element,
* meta   = for every ``<meta>``: key = ``name`` attr, falling back to
  ``property`` attr, skipped when both empty; key lowercased; value =
  ``content`` attr (missing → ``""``); later duplicates overwrite,
* description = ``meta["description"]``,
* headers lowercased (done as a column expression, see textfmt.py).

Implemented with the stdlib ``html.parser`` inside a single Arrow-batched
pandas UDF returning a struct, so the html is parsed once per row for all
outputs (title, meta, description).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import MapType, StringType, StructField, StructType

DOC_META_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
        StructField("description", StringType()),
    ]
)


class _DocParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self._first_title_done = False
        self._in_title = False
        self.meta: dict[str, str] = {}

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "title" and not self._first_title_done:
            self._in_title = True
        elif tag == "meta":
            d = dict(attrs)
            name = d.get("name") or d.get("property") or ""
            if name:
                self.meta[name.lower()] = d.get("content") or ""

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._in_title:
            self._in_title = False
            self._first_title_done = True

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)


def parse_doc_py(body: str | bytes | None) -> tuple[str, dict[str, str], str]:
    if body is None:
        return ("", {}, "")
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", errors="replace")
    p = _DocParser()
    try:
        p.feed(body)
        p.close()
    except Exception:
        pass
    meta = p.meta
    return ("".join(p.title_parts), meta, meta.get("description", ""))


@pandas_udf(DOC_META_SCHEMA)
def parse_doc(body: pd.Series) -> pd.DataFrame:
    rows = [parse_doc_py(b) for b in body]
    return pd.DataFrame(rows, columns=["title", "meta", "description"])


# --- visible-text extraction ----------------------------------------------

_SKIP_CONTENT_TAGS = frozenset({"script", "style", "noscript", "template"})


class _TextParser(HTMLParser):
    """Visible text: character data outside script/style/noscript/
    template, whitespace-collapsed and space-joined."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_CONTENT_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT_TAGS and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            w = data.split()
            if w:
                self.parts.append(" ".join(w))


def extract_text_py(body: str | bytes | None) -> str:
    """html → visible text (tags stripped, script/style dropped,
    whitespace collapsed) — the `text` column of the Common-Crawl-style
    pages shape."""
    if body is None:
        return ""
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", errors="replace")
    p = _TextParser()
    try:
        p.feed(body)
        p.close()
    except Exception:
        pass
    return " ".join(p.parts)


@pandas_udf(StringType())
def extract_text(body: pd.Series) -> pd.Series:
    return pd.Series([extract_text_py(b) for b in body])
