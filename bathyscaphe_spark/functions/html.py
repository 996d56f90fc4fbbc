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

Fast path (the dominant per-byte Python cost of the extract stage at
100 TB): documents that pass a conservative structural guard — every
``<`` opens a well-formed tag with balanced attribute quotes, and no
script/style/comment/CDATA constructs — are processed by C-speed regex
scans instead of the per-character ``HTMLParser`` state machine (~10×
per byte on the synthetic corpus).  Text extraction strips tags and
unescapes per inter-tag segment (exactly the data chunks HTMLParser
would deliver); title/meta extraction locates the first-title region and
the meta tags and feeds ONLY those few hundred bytes to the same
``_DocParser``, so its semantics are shared by construction.  Any
structure the guard can't vouch for falls back to the full stdlib parse
— outputs are pinned identical by fixture goldens and a property test.
Disable with ``BATHYSCAPHE_HTML_FAST=0``.

Optional C-library backend (``BATHYSCAPHE_HTML_LIB=1``): when
``selectolax`` (preferred) or ``lxml`` is importable, documents that the
regex guard rejects are parsed by the C HTML5/libxml2 parser instead of
the per-character stdlib state machine — the remaining Python hot spot
once the fast path has taken the well-formed majority.  The flag ships
OFF because neither library is installed in this build environment, so
backend parity cannot be pinned here; ``tests/test_html_lib_backend.py``
pins backend outputs identical to ``parse_doc_py``/``extract_text_py``
on the golden + property corpus and runs wherever a library is present
(skipped otherwise).  Enable only on clusters where that test passes.
"""

from __future__ import annotations

import os
import re
from html import unescape
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import MapType, StringType, StructField, StructType

HTML_FAST = os.environ.get("BATHYSCAPHE_HTML_FAST", "1") != "0"

# --- optional C-library backend (opt-in; see module docstring) ------------
HTML_LIB = os.environ.get("BATHYSCAPHE_HTML_LIB", "0") == "1"
_LIB_BACKEND: str | None = None
if HTML_LIB:
    try:
        from selectolax.parser import HTMLParser as _SelectolaxParser  # noqa: F401

        _LIB_BACKEND = "selectolax"
    except ImportError:
        try:
            import lxml.html as _lxml_html  # noqa: F401

            _LIB_BACKEND = "lxml"
        except ImportError:
            _LIB_BACKEND = None  # flag on but no library: stdlib fallback

# one well-formed tag: name/end/decl start, attrs with balanced quotes
# (quoted values may contain <, >, entities — HTMLParser skips them too).
# Possessive quantifiers (*+/++, py3.11) keep matching linear: the
# non-possessive nested-star form is exponential on near-miss inputs.
_TAG_RE = re.compile(r"<[a-zA-Z/!](?:[^<>\"']++|\"[^\"]*+\"|'[^']*+')*+>")
# whole-document guard: nothing but data runs and well-formed tags
_SIMPLE_RE = re.compile(
    r"(?:[^<]++|<[a-zA-Z/!](?:[^<>\"']++|\"[^\"]*+\"|'[^']*+')*+>)*+\Z"
)
# constructs whose CONTENT rules differ from plain markup: their bodies
# swallow tags/data in ways the tag regex can't see
_UNSAFE_SUBSTRINGS = ("<script", "<style", "<noscript", "<template", "<!--", "<![")
_NAME_RE = re.compile(r"<([a-zA-Z][-.a-zA-Z0-9:_]*)")
_TITLE_CLOSE_RE = re.compile(r"</\s*title\s*>\Z", re.IGNORECASE)
_META_OPEN_RE = re.compile(r"<meta(?=[\s/>])", re.IGNORECASE)


def _simple_lower(s: str) -> str | None:
    """The lowercased body when the fast-path guard accepts it, else
    None (one lower() pass shared by the guard and the callers'
    substring pre-checks)."""
    low = s.lower()
    if any(t in low for t in _UNSAFE_SUBSTRINGS):
        return None
    return low if _SIMPLE_RE.match(s) is not None else None


def _is_simple_html(s: str) -> bool:
    return _simple_lower(s) is not None

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


def _doc_feed_fast(s: str) -> str | None:
    """For a guard-approved document, the minimal substring whose stdlib
    parse yields the same (title, meta, description): the first
    ``<title>…</title>`` region verbatim plus every ``<meta …>`` tag
    outside it, in document order.  Returns None when an end tag looks
    title-ish but not strictly ``</title>`` — bail to the full parse
    rather than guess."""
    pieces: list[tuple[int, str]] = []
    t0: int | None = None
    t1: int | None = None
    for m in _TAG_RE.finditer(s):
        g = m.group(0)
        if t0 is not None and t1 is None:
            if g[1] == "/" and "title" in g.lower():
                if not _TITLE_CLOSE_RE.match(g):
                    return None  # bogus end tag — let HTMLParser decide
                t1 = m.end()
            continue  # tags inside the region travel with it verbatim
        nm = _NAME_RE.match(g)
        if nm is None:
            continue
        name = nm.group(1).lower()
        if name == "title" and t0 is None:
            t0 = m.start()
            if g.endswith("/>"):  # self-closing: region is the tag itself
                t1 = m.end()
        elif name == "meta" and _META_OPEN_RE.match(g):
            pieces.append((m.start(), g))
    if t0 is not None:
        pieces.append((t0, s[t0 : t1 if t1 is not None else len(s)]))
        pieces.sort()
    return "".join(p for _, p in pieces)


def _parse_doc_lib(body: str) -> tuple[str, dict[str, str], str] | None:
    """Library-backed (title, meta, description) with the reference
    semantics (first-title text, name-falling-back-to-property keys
    lowercased, later duplicates overwrite).  None ⇒ no backend / parse
    error ⇒ caller falls through to the stdlib state machine."""
    if _LIB_BACKEND is None:
        return None
    try:
        if _LIB_BACKEND == "selectolax":
            tree = _SelectolaxParser(body)
            t = tree.css_first("title")
            title = t.text() if t is not None else ""
            meta: dict[str, str] = {}
            for n in tree.css("meta"):
                a = n.attributes
                name = a.get("name") or a.get("property") or ""
                if name:
                    meta[name.lower()] = a.get("content") or ""
        else:  # lxml
            doc = _lxml_html.fromstring(body)
            t = doc.find(".//title")
            title = (t.text_content() if t is not None else "") or ""
            meta = {}
            for el in doc.iter("meta"):
                name = el.get("name") or el.get("property") or ""
                if name:
                    meta[name.lower()] = el.get("content") or ""
        return (title, meta, meta.get("description", ""))
    except Exception:
        return None


def _extract_text_lib(body: str) -> str | None:
    """Library-backed visible text (script/style/noscript/template
    dropped, whitespace collapsed).  None ⇒ stdlib fallback."""
    if _LIB_BACKEND is None:
        return None
    try:
        if _LIB_BACKEND == "selectolax":
            tree = _SelectolaxParser(body)
            for n in tree.css("script,style,noscript,template"):
                n.decompose()
            raw = tree.root.text(separator=" ") if tree.root is not None else ""
        else:  # lxml
            doc = _lxml_html.fromstring(body)
            for tag in _SKIP_CONTENT_TAGS:
                for el in doc.iter(tag):
                    el.drop_tree()
            raw = doc.text_content()
        return " ".join(raw.split())
    except Exception:
        return None


def parse_doc_py(body: str | bytes | None) -> tuple[str, dict[str, str], str]:
    if body is None:
        return ("", {}, "")
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", errors="replace")
    feed = body
    if HTML_FAST:
        low = _simple_lower(body)
        if low is not None:
            if "<title" not in low and "<meta" not in low:
                return ("", {}, "")
            fast = _doc_feed_fast(body)
            if fast is not None:
                feed = fast
    if feed is body and _LIB_BACKEND is not None:
        # guard-rejected document: C-library parse instead of feeding
        # the whole body through the per-character state machine
        lib = _parse_doc_lib(body)
        if lib is not None:
            return lib
    p = _DocParser()
    try:
        p.feed(feed)
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
    if HTML_FAST and _simple_lower(body) is not None:
        # guard guarantees: no skip-content tags, every inter-tag run is
        # exactly one HTMLParser data chunk (charrefs converted per
        # chunk, so an entity split by a tag stays unconverted — same as
        # the state machine)
        parts = []
        for seg in _TAG_RE.split(body):
            if seg:
                w = unescape(seg).split()
                if w:
                    parts.append(" ".join(w))
        return " ".join(parts)
    if _LIB_BACKEND is not None:
        lib = _extract_text_lib(body)
        if lib is not None:
            return lib
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
