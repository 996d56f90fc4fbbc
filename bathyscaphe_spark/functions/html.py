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
from pyspark.sql import Column
from pyspark.sql import functions as F
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

# Tag spans are located with the stdlib parser's OWN compiled regex
# (``locatestarttagend_tolerant``) plus a transcription of
# ``check_for_whole_start_tag``'s follow-char rules, so start-tag
# boundaries cannot diverge from HTMLParser by construction.  A
# hand-written "well-formed tag" grammar is a trap here: HTMLParser only
# honors quotes in attribute VALUES (hypothesis counterexample
# ``<A">">`` — stdlib ends the tag at the first ``>`` and emits ``">``
# as data, a quotes-anywhere regex swallows it), requires an attribute
# NAME before ``=``, and ends declarations/bogus comments at the first
# ``>`` regardless of quotes.  End tags accept only the strict
# ``endtagfind`` shape; every other construct bails to the full parse.
from html import parser as _stdlib_parser

_LOCATE_START = _stdlib_parser.locatestarttagend_tolerant
_ENDTAG_RE = re.compile(r"</\s*[a-zA-Z][-.a-zA-Z0-9:_]*\s*>")
# constructs whose CONTENT rules differ from plain markup: their bodies
# swallow tags/data in ways a tag scan can't see (script/style flip the
# parser into CDATA mode; comments/marked sections nest `>` rules)
_UNSAFE_SUBSTRINGS = ("<script", "<style", "<noscript", "<template", "<!--", "<![")
_NAME_RE = re.compile(r"<([a-zA-Z][-.a-zA-Z0-9:_]*)")
_TITLE_CLOSE_RE = re.compile(r"</\s*title\s*>\Z", re.IGNORECASE)
_META_OPEN_RE = re.compile(r"<meta(?=[\s/>])", re.IGNORECASE)


def _scan_spans(s: str) -> list[tuple[int, int]] | None:
    """(start, end) spans of every non-data construct, exactly as the
    stdlib state machine would delimit them — or None when any ``<`` is
    a construct the scan can't vouch for (then the caller must run the
    real parser).  Callers pre-check ``_UNSAFE_SUBSTRINGS``."""
    spans: list[tuple[int, int]] = []
    pos = 0
    n = len(s)
    while True:
        lt = s.find("<", pos)
        if lt < 0:
            return spans
        c = s[lt + 1 : lt + 2]
        if c.isascii() and c.isalpha():
            # start tag: stdlib's own locator + its follow-char check
            j = _LOCATE_START.match(s, lt).end()
            if s.startswith(">", j):
                pos = j + 1
            elif s.startswith("/>", j):
                pos = j + 2
            else:
                return None  # stdlib would emit tag text as data / junk
        elif c == "/":
            m = _ENDTAG_RE.match(s, lt)
            if m is None:
                return None  # tolerant end-tag recovery: let stdlib do it
            pos = m.end()
        elif c == "!":
            # comment/marked-section excluded by _UNSAFE_SUBSTRINGS;
            # doctype AND bogus comments both end at the first '>'
            gt = s.find(">", lt + 2)
            if gt < 0:
                return None
            pos = gt + 1
        else:
            return None  # '<?', '< ', '<<', '<' at EOF, ...
        if pos > n:
            return None
        spans.append((lt, pos))


def _guard_scan(s: str) -> tuple[str, list[tuple[int, int]]] | None:
    """(lowercased body, construct spans) when the fast-path guard
    accepts the document, else None.  One lower() pass is shared by the
    unsafe-substring pre-check and the callers' ``<title``/``<meta``
    probes; the spans are reused by both fast kernels so the document is
    scanned exactly once."""
    low = s.lower()
    if any(t in low for t in _UNSAFE_SUBSTRINGS):
        return None
    spans = _scan_spans(s)
    if spans is None:
        return None
    return low, spans


def _is_simple_html(s: str) -> bool:
    return _guard_scan(s) is not None

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


def _doc_feed_fast(s: str, spans: list[tuple[int, int]]) -> str | None:
    """For a guard-approved document, the minimal substring whose stdlib
    parse yields the same (title, meta, description): the first
    ``<title>…</title>`` region verbatim plus every ``<meta …>`` tag
    outside it, in document order.  ``spans`` are the guard's construct
    spans (reused — no re-scan).  Returns None when an end tag looks
    title-ish but not strictly ``</title>`` — bail to the full parse
    rather than guess."""
    pieces: list[tuple[int, str]] = []
    t0: int | None = None
    t1: int | None = None
    for st, en in spans:
        g = s[st:en]
        if t0 is not None and t1 is None:
            if g[1] == "/" and "title" in g.lower():
                if not _TITLE_CLOSE_RE.match(g):
                    return None  # bogus end tag — let HTMLParser decide
                t1 = en
            continue  # tags inside the region travel with it verbatim
        nm = _NAME_RE.match(g)
        if nm is None:
            continue
        name = nm.group(1).lower()
        if name == "title" and t0 is None:
            t0 = st
            if g.endswith("/>"):  # self-closing: region is the tag itself
                t1 = en
        elif name == "meta" and _META_OPEN_RE.match(g):
            pieces.append((st, g))
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
        g = _guard_scan(body)
        if g is not None:
            low, spans = g
            if "<title" not in low and "<meta" not in low:
                return ("", {}, "")
            fast = _doc_feed_fast(body, spans)
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
    if HTML_FAST:
        g = _guard_scan(body)
        if g is not None:
            # guard guarantees: no skip-content tags, every inter-tag run
            # is exactly one HTMLParser data chunk (charrefs converted per
            # chunk, so an entity split by a tag stays unconverted — same
            # as the state machine)
            _, spans = g
            parts = []
            prev = 0
            for st, en in spans + [(len(body), len(body))]:
                seg = body[prev:st]
                prev = en
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


# --- anchor (href, text) pairs — codegen path -------------------------------

# Well-formed double-quoted anchors with tag-free inner text.  This is
# the strict-subset extractor for the anchor-text corpus signal: the
# href↔text PAIRING needs tag awareness the crawl kernel's xurls-style
# URL regex deliberately lacks, and for the common well-formed case a
# pure column-expression pipeline beats a per-row parse.  Anchors whose
# inner text nests markup do not match (their urls are still harvested
# by the crawl kernel; only the text pairing is skipped).  Java∩RE2-safe
# so the DuckDB oracle runs the literal same pattern.
ANCHOR_RE = "<a [^>]*href=\"([^\"]*)\"[^>]*>([^<]*)</a>"


def anchor_pairs_col(html: Column) -> Column:
    """array<struct<href:string, anchor:string>> of well-formed anchors,
    document order.  Two group-extractions over the same full-match
    array — all JVM regexp, no UDF."""
    matches = F.regexp_extract_all(html, F.lit(ANCHOR_RE), 0)
    return F.transform(
        matches,
        lambda m: F.struct(
            F.regexp_extract(m, ANCHOR_RE, 1).alias("href"),
            F.regexp_extract(m, ANCHOR_RE, 2).alias("anchor"),
        ),
    )


CANONICAL_RE = '<link [^>]*rel="canonical"[^>]*href="([^"]*)"'


def canonical_href_col(html: Column) -> Column:
    """First ``<link rel="canonical" href="...">`` target, or NULL when
    the page declares none.  Strict-contract pure-codegen regexp (same
    discipline as ANCHOR_RE: double-quoted attributes, rel before
    href); the tolerant-parser path is not needed because a canonical
    link that doesn't parse strictly is ignored by the big engines too.
    Java and RE2 agree on every construct used here."""
    hit = F.regexp_extract(html, CANONICAL_RE, 1)
    return F.when(hit != "", hit)


# Published-date extraction (trafilatura-style cascade, public
# convention): OpenGraph article:published_time (either attribute
# order), JSON-LD datePublished, <time datetime=...>, then a
# /YYYY/MM/DD/ or /YYYY-MM-DD URL path date.  Java∩RE2-safe patterns
# (same discipline as PII_* / ANCHOR_RE) so the DuckDB oracle runs the
# literal same strings; strict double-quoted attributes by the
# CANONICAL_RE contract.
DATE_OG_RE = (
    '<meta [^>]*property="article:published_time"[^>]*'
    ' content="([^"]+)"'
)
DATE_OG_REV_RE = (
    '<meta [^>]*content="([^"]+)"[^>]*'
    ' property="article:published_time"'
)
DATE_JSONLD_RE = '"datePublished"\\s*:\\s*"([^"]+)"'
DATE_TIME_RE = '<time [^>]*datetime="([^"]+)"'
DATE_URL_RE = (
    "/((?:19|20)[0-9]{2})[/-](0[1-9]|1[0-2])[/-]"
    "(0[1-9]|[12][0-9]|3[01])(?:[/?#]|$)"
)


def published_date_cols(html: Column, url: Column) -> dict[str, Column]:
    """(published, date_source) — publication date as a 'YYYY-MM-DD'
    string (NULL when nothing plausible) plus which cascade stage won
    ('og' | 'jsonld' | 'time' | 'url' | NULL).

    All pure codegen regexp + try_to_date: candidate strings truncate
    to their first 10 chars (ISO timestamps keep the date part),
    non-dates fall out as NULL via try semantics, and years clamp to
    [1995, 2035] — a matched-but-implausible candidate does NOT fall
    through to a later stage (the page SAID a date; a wrong claim is
    not evidence for a weaker extractor).  Recency weighting at corpus
    scale needs exactly this: a narrow map-stage projection, no parse,
    no UDF, no shuffle.
    """

    def _hit(re_: str, src: Column) -> Column:
        v = F.regexp_extract(src, re_, 1)
        return F.when(v != "", v)

    url_date = F.when(
        F.regexp_extract(url, DATE_URL_RE, 1) != "",
        F.concat_ws(
            "-",
            F.regexp_extract(url, DATE_URL_RE, 1),
            F.regexp_extract(url, DATE_URL_RE, 2),
            F.regexp_extract(url, DATE_URL_RE, 3),
        ),
    )
    stages = [
        ("og", F.coalesce(_hit(DATE_OG_RE, html), _hit(DATE_OG_REV_RE, html))),
        ("jsonld", _hit(DATE_JSONLD_RE, html)),
        ("time", _hit(DATE_TIME_RE, html)),
        ("url", url_date),
    ]
    raw = F.coalesce(*(c for _, c in stages))
    src = F.coalesce(
        *(F.when(c.isNotNull(), F.lit(name)) for name, c in stages)
    )
    d = F.try_to_date(F.substring(raw, 1, 10))
    d = F.when((F.year(d) >= 1995) & (F.year(d) <= 2035), d)
    return {
        "published": F.date_format(d, "yyyy-MM-dd"),
        "date_source": F.when(d.isNotNull(), src),
    }


# --- robots meta directives (page-level noindex/nofollow) -------------------

# <meta name="robots" content="..."> with the attributes in either
# order; (?i) inline flag is the one case-insensitivity syntax Java
# regex and RE2 share, so the DuckDB oracle runs these VERBATIM
_ROBOTS_META_NC = (
    "(?i)<meta[^>]*\\bname\\s*=\\s*[\"']robots[\"']"
    "[^>]*\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']"
)
_ROBOTS_META_CN = (
    "(?i)<meta[^>]*\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']"
    "[^>]*\\bname\\s*=\\s*[\"']robots[\"']"
)


def _directive(combined, name: str):
    from pyspark.sql import functions as F

    return combined.rlike(f"(?i)(^|[,\\s]){name}([,\\s]|$)") | combined.rlike(
        "(?i)(^|[,\\s])none([,\\s]|$)"
    )


def robots_meta_cols(html, xrobots):
    """Page-level robots directives (the Robots Exclusion Protocol's
    per-page half, public: Google/Bing REP docs): ``<meta
    name="robots" content="...">`` in either attribute order, UNIONED
    with the ``X-Robots-Tag`` response header (pass the already
    lowercase-keyed headers map's value), token-matched
    case-insensitively on comma/space boundaries; ``none`` implies
    both noindex and nofollow.

    Returns dict of columns: ``meta_robots`` (raw meta content or
    NULL), ``noindex`` — drop from the resources sink, ``nofollow`` —
    skip link extraction for the page.  Pure codegen regexp — a
    map-only projection; the regexes are shared VERBATIM with the
    DuckDB oracle.
    """
    from pyspark.sql import functions as F

    meta = F.coalesce(
        F.nullif(F.regexp_extract(html, _ROBOTS_META_NC, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _ROBOTS_META_CN, 1), F.lit("")),
    )
    # X-Robots-Tag may be user-agent scoped ("googlebot: noindex" —
    # Google's REP docs): a leading token+colon that is NOT itself a
    # known directive addresses a different agent, so the value must
    # not apply to this crawler (the conservative documented choice;
    # unavailable_after's own colon stays a directive)
    xr_prefix = F.regexp_extract(
        F.coalesce(xrobots, F.lit("")), r"^\s*([A-Za-z0-9_-]+)\s*:", 1
    )
    xr_eff = F.when(
        (xr_prefix != "")
        & ~F.lower(xr_prefix).isin(
            "noindex", "nofollow", "none", "noarchive", "nosnippet",
            "notranslate", "noimageindex", "unavailable_after",
        ),
        F.lit(None),
    ).otherwise(xrobots)
    combined = F.concat_ws(",", meta, xr_eff)
    return {
        "meta_robots": meta,
        "noindex": _directive(combined, "noindex"),
        "nofollow": _directive(combined, "nofollow"),
    }


def _attr_sql(name: str) -> str:
    """SQL expression extracting attribute ``name`` from a tag's
    attribute-list string ``t`` in any HTML quoting form — double-
    quoted, single-quoted, or unquoted (all three are ubiquitous in
    real markup; a double-quote-only pattern silently drops the rest).
    Quote characters appear only as \\x22/\\x27 escapes so the same
    pattern text survives Spark SQL, Java regex, and RE2 quoting.
    Returns '' when absent.  Mirrored by queries._duck_attr.

    The name is anchored at an attribute boundary (start of the list,
    whitespace, or a closing quote) so ``rel=`` never fires inside a
    LONGER attribute name like ``data-rel=`` — RE2 has no lookbehind,
    so the boundary is a non-capturing prefix group and the value
    stays capture group 1.  Known limit shared with the oracle: a
    ``name=`` sequence inside ANOTHER attribute's quoted value still
    matches the unquoted branch (full tokenization would need a
    parser, not a regex)."""

    def ex(pat: str) -> str:
        return f"nullif(regexp_extract(t, '{pat}', 1), '')"

    b = r"(?:^|[\\s\\x22\\x27])"
    dq = ex(rf"(?i){b}{name}\\s*=\\s*\\x22([^\\x22]*)\\x22")
    sq = ex(rf"(?i){b}{name}\\s*=\\s*\\x27([^\\x27]*)\\x27")
    un = ex(rf"(?i){b}{name}\\s*=\\s*([^\\s>\\x27\\x22]+)")
    return f"coalesce({dq}, {sq}, {un}, '')"


def anchor_rel_cols(html_col: str = "html"):
    """Per-anchor (href, rel) extraction with REL SEMANTICS — the
    link-graph half of the Robots Exclusion Protocol's page-level
    rules: links carrying ``rel="nofollow"`` (or its ``ugc`` /
    ``sponsored`` refinements — Google's public link-attribute spec)
    convey NO endorsement and must not feed PageRank/OPIC edges or
    anchor-text aggregation.

    Returns an array<struct<href, rel, follow>> column: every
    ``<a …>`` open tag parses attribute-order-independently (the whole
    attribute list extracts once, href/rel pick out of it), ``follow``
    is false iff rel token-contains nofollow/ugc/sponsored.  Pure
    codegen — regexp_extract_all + transform, no UDF.
    """
    from pyspark.sql import functions as F

    tags = F.expr(
        rf"""transform(
  regexp_extract_all({html_col}, '(?i)<a\\s([^>]*)>', 1),
  t -> named_struct(
    'href', {_attr_sql("href")},
    'rel',  {_attr_sql("rel")},
    'follow', NOT {_attr_sql("rel")}
              rlike '(?i)(^| )(nofollow|ugc|sponsored)( |$)'
  ))"""
    )
    return tags


def anchor_endorsements(pages, id_col: str = "doc_id", url_col: str | None = None):
    """Per-target endorsement rollup over :func:`anchor_rel_cols`:
    (href, n_follow, n_nofollow) — the edge-weight table a rank pass
    consumes (follow-only edges) and the spam analyst reads (a target
    whose inlinks are overwhelmingly nofollow earns no rank from its
    volume).  One explode + one target-keyed agg; in-degree skew is
    bounded exactly like anchor_text's rollup.

    Pass ``url_col`` (the page URL) to RESOLVE each href via RFC 3986
    before grouping — without it, identical relative paths from
    unrelated hosts ('/about' everywhere) merge into one meaningless
    key; with it the rollup keys on absolute target URLs, which is the
    only form a rank pass may consume."""
    from pyspark.sql import functions as F

    cols = [F.col(id_col).alias("_id")]
    if url_col is not None:
        cols.append(F.col(url_col).alias("_url"))
    a = pages.select(*cols, F.explode(anchor_rel_cols()).alias("a")).where(
        F.col("a.href") != ""
    )
    if url_col is not None:
        from ..functions.urltools import resolve_reference_col

        target = resolve_reference_col(F.col("_url"), F.col("a.href"))
    else:
        target = F.col("a.href")
    return a.groupBy(target.alias("href")).agg(
        F.sum(F.when(F.col("a.follow"), 1).otherwise(0))
        .cast("long")
        .alias("n_follow"),
        F.sum(F.when(F.col("a.follow"), 0).otherwise(1))
        .cast("long")
        .alias("n_nofollow"),
    )


def hreflang_pairs(pages, url_col: str = "url", html_col: str = "html"):
    """hreflang alternate extraction + the RECIPROCITY validity rule
    (Google's public hreflang spec: annotations only count when the
    alternate page links back) — the language-variant mapping that
    exempts translations from near-dup collapse and aligns
    multilingual corpora.

    Output: (src, lang, alt, reciprocal) — one row per
    ``<link rel="alternate" hreflang="…" href="…">``, attribute-order
    independent; ``reciprocal`` = the alternate declares ANY hreflang
    back to src.

    Per the WHATWG link-types spec, ``alternate`` appearing TOGETHER
    with ``stylesheet`` means "alternative stylesheet" and creates NO
    alternate-document link — such rel lists are excluded (a localized
    CSS file must not be clustered as a language variant).

    Plan: codegen tag parse (regexp_extract_all + transform over
    ``<link …>`` attribute lists), one explode, and ONE self-join on
    the (alt, src) url pair for reciprocity — an equi-join on the
    output's own key, no windows, no UDFs.
    """
    from pyspark.sql import functions as F

    tags = F.expr(
        rf"""filter(transform(
  regexp_extract_all({html_col}, '(?i)<link\\s([^>]*)>', 1),
  t -> named_struct(
    'rel',  {_attr_sql("rel")},
    'lang', {_attr_sql("hreflang")},
    'href', {_attr_sql("href")}
  )),
  s -> s.rel rlike '(?i)(^| )alternate( |$)'
       AND NOT s.rel rlike '(?i)(^| )stylesheet( |$)'
       AND s.lang != '' AND s.href != '')"""
    )
    e = pages.select(
        F.col(url_col).alias("src"), F.explode(tags).alias("t")
    ).select(
        "src", F.lower(F.col("t.lang")).alias("lang"),
        F.col("t.href").alias("alt"),
    )
    back = e.select(F.col("src").alias("alt"), F.col("alt").alias("src"))
    return (
        e.join(back.distinct().withColumn("_r", F.lit(True)), ["src", "alt"], "left")
        .select(
            "src", "lang", "alt", F.coalesce("_r", F.lit(False)).alias("reciprocal")
        )
    )
