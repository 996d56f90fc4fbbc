"""Indexer extraction goldens (elastic_test.go:9-61)."""

from bathyscaphe_spark.functions.html import parse_doc_py

ELASTIC_BODY = """
<title>Creekorful Inc</title>

This is sparta

<a href="https://google.com/test?test=test#12">

<meta name="Description" content="Zhello world">
<meta property="og:url" content="https://example.org">
"""


def test_elastic_golden():
    title, meta, description = parse_doc_py(ELASTIC_BODY)
    assert title == "Creekorful Inc"
    assert description == "Zhello world"
    assert meta["description"] == "Zhello world"
    assert meta["og:url"] == "https://example.org"


def test_meta_name_fallback_property():
    # key = name attr, fallback property, skip if both empty; lowercased
    _, meta, _ = parse_doc_py(
        '<meta name="A" content="1"><meta property="B" content="2">'
        '<meta content="orphan"><meta name="A" content="3">'
    )
    assert meta == {"a": "3", "b": "2"}  # later duplicates overwrite


def test_first_title_only():
    title, _, _ = parse_doc_py("<title>First</title><title>Second</title>")
    assert title == "First"


def test_missing_description():
    title, meta, description = parse_doc_py("<p>no meta here</p>")
    assert title == "" and meta == {} and description == ""


def test_bytes_input():
    title, _, _ = parse_doc_py(b"<title>Bin</title>")
    assert title == "Bin"


# --- fast-path equivalence (guarded regex path vs full stdlib parse) -----

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bathyscaphe_spark.functions import html as H


def _slow_doc(s):
    p = H._DocParser()
    p.feed(s if isinstance(s, str) else s.decode("utf-8", "replace"))
    p.close()
    return ("".join(p.title_parts), p.meta, p.meta.get("description", ""))


def _slow_text(s):
    p = H._TextParser()
    p.feed(s if isinstance(s, str) else s.decode("utf-8", "replace"))
    p.close()
    return " ".join(p.parts)


FAST_CASES = [
    ELASTIC_BODY,
    "<title>First</title><title>Second</title>",
    '<meta name="A" content="1"><meta property="B" content="2">'
    '<meta content="orphan"><meta name="A" content="3">',
    "<p>no meta here</p>",
    "<title>Bin</title>",
    "<title/>after a self-closing title <b>bold</b>",
    "<title>unclosed to eof <meta name=\"k\" content=\"v\">tail",
    '<TITLE >Upper &amp; spaced</TITLE ><META NAME="X" CONTENT="Y">',
    '<img alt="<title>not a title</title>"><title>real</title>',
    "a &lt;tag&gt; &amp; entity &#65; &nbsp; soup",
    "text<b>adjacent</b>runs and <i>nested <u>tags</u></i>",
    '<meta name="dup" content="1"><title>t<meta name="in-title" content="x"></title><meta name="dup" content="2">',
    "<!DOCTYPE html><html><head><title>d</title></head><body>b</body></html>",
    "&amp<b>;split entity</b>",
]

SLOW_CASES = [  # guard must refuse these (stdlib semantics differ)
    "<script>var a = '<title>no</title>';</script>visible",
    "<style>p { color: red }</style>x",
    "<!-- <title>comment</title> -->y",
    "stray < bracket",
    "<![CDATA[ x > y ]]>z",
    "<p unbalanced='quote>text",
]


@pytest.mark.parametrize("body", FAST_CASES)
def test_fast_path_triggers_and_matches(body):
    assert H._is_simple_html(body)
    assert H.parse_doc_py(body) == _slow_doc(body)
    assert H.extract_text_py(body) == _slow_text(body)


@pytest.mark.parametrize("body", SLOW_CASES)
def test_guard_refuses_unsafe(body):
    assert not H._is_simple_html(body)
    # fallback path still runs and equals the stdlib parse trivially
    assert H.parse_doc_py(body) == _slow_doc(body)
    assert H.extract_text_py(body) == _slow_text(body)


_frag = st.one_of(
    st.sampled_from(
        [
            "<title>", "</title>", "<title/>", "<meta name='k' content='v'>",
            '<meta property="p" content="c&amp;c">', "<b>", "</b>", "<br/>",
            "&amp;", "&lt;", "&#65;", "&nbsp;", "&bogus;", "&amp", " ", "\n",
            "plain text", "a>b", '<img alt="x>y">', "<!DOCTYPE html>",
            "<p class=unquoted>", "<script>bad()</script>", "<!-- c -->",
            "< stray", "tail",
        ]
    ),
    st.text(
        alphabet="abc &;#<>\"'/=\n\tA1", min_size=0, max_size=12
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_frag, min_size=0, max_size=12).map("".join))
def test_fast_matches_slow_property(body):
    # whatever the guard accepts must match the full stdlib parse
    if H._is_simple_html(body):
        assert H.parse_doc_py(body) == _slow_doc(body)
        assert H.extract_text_py(body) == _slow_text(body)


ADVERSARIAL = [  # equivalence must hold whichever path runs
    "<title>a\rb\r\nc</title>body \r text",
    "<title>x</b title='y'>z</title>",
    "<title>a&am<b>p;</title>",
    "<title>&#x41;&Aacute;&notreal;&amp</title>",
    "<meta name='k' content='a&quot;b'>",
    "<meta name=K content=V><meta NAME='k' CONTENT='w'>",
    "<meta name='k'>",
    "<meta/>",
    "<em title='<meta name=\"fake\" content=\"x\">'>real text</em>",
    "<title></title><meta name='a' content='1'>",
    "<title>t1</title>mid<title>t2</title><meta name='z' content='9'>",
    "<br/><hr/><input value='a>b'/>text",
    "<!doctype html><p>x</p>",
    "<title>no close ever <meta name='m' content='c'> tail text",
    # stdlib quote-tolerance traps: quotes only matter in attribute
    # VALUES, a bare quote ends nothing, '=' needs a name before it
    '<A">">x',
    '<a b=">">x',
    "<p =v>text",
    "<a/b>c</a>d",
    "<a b = 'c'>'d'</a>",
    "<meta name='k' content='v'x>y",
]


@pytest.mark.parametrize("body", ADVERSARIAL)
def test_adversarial_equivalence(body):
    assert H.parse_doc_py(body) == _slow_doc(body)
    assert H.extract_text_py(body) == _slow_text(body)


# --- anchor (href, text) pair extraction (codegen) --------------------


def test_anchor_pairs_well_formed_and_strict(spark):
    from bathyscaphe_spark.functions.html import anchor_pairs_col
    from pyspark.sql import functions as F

    cases = [
        # (html, expected [(href, anchor), ...])
        ('<a href="/x">one</a><a class="c" href="/y">two</a>',
         [("/x", "one"), ("/y", "two")]),
        # nested markup inside the anchor: excluded (strict contract)
        ('<a href="/z"><b>bold</b></a>', []),
        # single-quoted href: excluded (strict contract)
        ("<a href='/q'>q</a>", []),
        # empty text and empty href both extract
        ('<a href="">e</a><a href="/w"></a>', [("", "e"), ("/w", "")]),
        # no anchors
        ("<p>nothing here</p>", []),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
    )
    rows = (
        df.select("i", anchor_pairs_col(F.col("html")).alias("a"))
        .orderBy("i")
        .collect()
    )
    for (html, want), r in zip(cases, rows):
        got = [(p["href"], p["anchor"]) for p in r.a]
        assert got == want, html


class TestCanonicalHref:
    def _one(self, spark, html):
        from pyspark.sql import functions as F

        from bathyscaphe_spark.functions.html import canonical_href_col

        df = spark.createDataFrame([(html,)], "html string")
        return df.select(canonical_href_col(F.col("html")).alias("c")).first()["c"]

    def test_extracts_first_canonical(self, spark):
        h = ('<html><head><link type="x" rel="canonical" href="http://a/1">'
             '<link rel="canonical" href="http://a/2"></head></html>')
        assert self._one(spark, h) == "http://a/1"

    def test_none_declared_is_null(self, spark):
        assert self._one(spark, "<html><head><title>t</title></head></html>") is None

    def test_other_link_rels_ignored(self, spark):
        h = '<link rel="stylesheet" href="/s.css">'
        assert self._one(spark, h) is None

    def test_empty_href_is_null(self, spark):
        assert self._one(spark, '<link rel="canonical" href="">') is None


class TestPublishedDate:
    def _run(self, spark, rows):
        from pyspark.sql import functions as F

        from bathyscaphe_spark.functions.html import published_date_cols

        df = spark.createDataFrame(rows, "i long, html string, url string")
        c = published_date_cols(F.col("html"), F.col("url"))
        out = df.select(
            "i", c["published"].alias("d"), c["date_source"].alias("s")
        )
        return {r.i: (r.d, r.s) for r in out.collect()}

    def test_cascade_priority_and_stages(self, spark):
        u = "https://x.com/a"
        got = self._run(spark, [
            (1, '<meta property="article:published_time"'
                ' content="2023-05-12T08:00:00Z">', u),
            (2, '<meta content="2021-01-31"'
                ' property="article:published_time">', u),
            (3, '{"datePublished": "2019-07-04T00:00:00"}', u),
            (4, '<time class="x" datetime="2020-02-29">x</time>', u),
            (5, "<p>none</p>", "https://x.com/blog/2018/11/03/post"),
            (6, "<p>none</p>", "https://x.com/blog/2018-11-03"),
            # og outranks a time tag on the same page
            (7, '<time a="b" datetime="2011-01-01">x</time>'
                '<meta property="article:published_time"'
                ' content="2023-05-12">', u),
        ])
        assert got[1] == ("2023-05-12", "og")
        assert got[2] == ("2021-01-31", "og")
        assert got[3] == ("2019-07-04", "jsonld")
        assert got[4] == ("2020-02-29", "time")  # real leap day
        assert got[5] == ("2018-11-03", "url")
        assert got[6] == ("2018-11-03", "url")
        assert got[7] == ("2023-05-12", "og")

    def test_implausible_never_falls_through(self, spark):
        got = self._run(spark, [
            # matched og with ancient year: NULL, not the time tag below
            (1, '<meta property="article:published_time"'
                ' content="1492-01-01">'
                '<time r="s" datetime="2015-06-01">x</time>',
                "https://x.com/a"),
            # unparsable time value with a perfectly good url date
            (2, '<time q="r" datetime="notadate">x</time>',
                "https://x.com/2017/05/05/"),
            # Feb 30 passes the regex but fails the calendar
            (3, "<p>x</p>", "https://x.com/2020/02/30/"),
        ])
        assert got[1] == (None, None)
        assert got[2] == (None, None)
        assert got[3] == (None, None)

    def test_url_pattern_boundaries(self, spark):
        got = self._run(spark, [
            (1, "<p>x</p>", "https://x.com/p/2018/13/03/"),   # month 13
            (2, "<p>x</p>", "https://x.com/2018-11-035"),      # no boundary
            (3, "<p>x</p>", "https://x.com/2018/11/03?id=1"),  # ? boundary
            (4, "<p>x</p>", "https://x.com/2018/11/03"),       # end anchor
            (5, None, None),
        ])
        assert got[1] == (None, None)
        assert got[2] == (None, None)
        assert got[3] == ("2018-11-03", "url")
        assert got[4] == ("2018-11-03", "url")
        assert got[5] == (None, None)


class TestRobotsMeta:
    """Page-level robots directives: meta tag + X-Robots-Tag union."""

    def _run(self, spark, rows):
        from pyspark.sql import functions as F

        from bathyscaphe_spark.functions.html import robots_meta_cols

        df = spark.createDataFrame(rows, "id long, html string, xr string")
        c = robots_meta_cols(F.col("html"), F.col("xr"))
        out = df.select("id", c["noindex"].alias("ni"), c["nofollow"].alias("nf"))
        return {r["id"]: (r["ni"], r["nf"]) for r in out.collect()}

    def test_attribute_orders_case_and_none(self, spark):
        got = self._run(spark, [
            (1, '<meta name="robots" content="noindex">', None),
            (2, '<meta content="nofollow" name="robots">', None),
            (3, '<meta name="ROBOTS" content="NONE">', None),
            (4, "<body>plain</body>", None),
        ])
        assert got == {1: (True, False), 2: (False, True),
                       3: (True, True), 4: (False, False)}

    def test_header_unions_with_meta(self, spark):
        got = self._run(spark, [
            (1, '<meta name="robots" content="noindex">', "nofollow"),
            (2, "<body>x</body>", "noindex, noarchive"),
        ])
        assert got == {1: (True, True), 2: (True, False)}

    def test_decoy_and_token_boundaries(self, spark):
        got = self._run(spark, [
            # name="description" must not match
            (1, '<meta name="description" content="noindex">', None),
            # 'noindexing' is NOT the noindex token
            (2, '<meta name="robots" content="noindexing">', None),
        ])
        assert got == {1: (False, False), 2: (False, False)}


class TestAnchorEndorsements:
    """rel=nofollow/ugc/sponsored per-link semantics."""

    def test_rel_variants(self, spark):
        from bathyscaphe_spark.functions.html import anchor_endorsements

        rows = [(1,
            '<a href="/a">x</a><a rel="nofollow" href="/a">y</a>'
            '<a href="/b" rel="ugc noopener">z</a>'
            '<A HREF="/c" REL="SPONSORED">s</A>'
            '<a rel="noopener" href="/d">k</a>'
            '<a href="/e" rel="nofollowX">near-miss</a>'
            '<a name="no-href">dropped</a>')]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        got = {r["href"]: (r["n_follow"], r["n_nofollow"])
               for r in anchor_endorsements(df).collect()}
        assert got == {"/a": (1, 1), "/b": (0, 1), "/c": (0, 1),
                       "/d": (1, 0), "/e": (1, 0)}

    def test_attr_name_boundary(self, spark):
        # 'rel=' must not fire inside a LONGER attribute name:
        # data-rel="x" here precedes the real rel="nofollow", and an
        # unanchored pattern extracted rel='x' -> follow=True, feeding
        # a nofollow link into the endorsement rollup
        from bathyscaphe_spark.functions.html import anchor_endorsements

        rows = [(1,
            '<a data-rel="x" rel="nofollow" href="/a">y</a>'
            '<a data-rel="nofollow" href="/b">decoy-only</a>')]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        got = {r["href"]: (r["n_follow"], r["n_nofollow"])
               for r in anchor_endorsements(df).collect()}
        assert got == {"/a": (0, 1), "/b": (1, 0)}


class TestLinkHarvest:
    """Anchors + rel + <base href> + RFC 3986 resolution, end-to-end."""

    def test_base_tag_reroots_and_nofollow_drops(self, spark):
        from pyspark.sql import functions as F

        from bathyscaphe_spark.functions.html import anchor_rel_cols
        from bathyscaphe_spark.functions.urltools import resolve_reference_col

        rows = [(
            "http://h.onion/sec/page.html",
            '<head><base href="/cdn/"></head>'
            '<a href="img.png">i</a><a href="/rooted">r</a>'
            '<a href="//m.onion/z">m</a><a rel="nofollow" href="/paid">n</a>',
        )]
        pages = spark.createDataFrame(rows, "url string, html string")
        bh = F.regexp_extract(
            F.col("html"), r'(?i)<base\s[^>]*href\s*=\s*"([^"]*)"', 1
        )
        eff = F.when(bh == "", F.col("url")).otherwise(
            resolve_reference_col(F.col("url"), bh)
        )
        a = pages.select(
            "url", eff.alias("b"), F.explode(anchor_rel_cols()).alias("a")
        ).where(F.col("a.follow") & (F.col("a.href") != ""))
        got = sorted(
            r["dst"]
            for r in a.select(
                resolve_reference_col(F.col("b"), F.col("a.href")).alias("dst")
            ).collect()
        )
        # relative href resolves against the BASE TAG dir, not the page
        assert got == [
            "http://h.onion/cdn/img.png",
            "http://h.onion/rooted",
            "http://m.onion/z",
        ]


class TestHreflangPairs:
    """hreflang alternates with the reciprocity validity rule."""

    def test_reciprocity_and_decoys(self, spark):
        from bathyscaphe_spark.functions.html import hreflang_pairs

        rows = [
            ("http://s/en",
             '<link rel="alternate" hreflang="DE" href="http://s/de">'
             '<link rel="stylesheet" href="/css">'
             # WHATWG: alternate + stylesheet = alternative STYLESHEET,
             # not a document alternate — must extract nothing
             '<link rel="alternate stylesheet" hreflang="es" href="http://s/es">'
             '<link hreflang="fr" rel="alternate x" href="http://s/fr">'),
            ("http://s/de",
             '<link rel="alternate" hreflang="en" href="http://s/en">'),
            # fr page declares nothing back
            ("http://s/fr", "<p>no links</p>"),
        ]
        df = spark.createDataFrame(rows, "url string, html string")
        got = {(r["src"], r["lang"], r["alt"]): r["reciprocal"]
               for r in hreflang_pairs(df).collect()}
        assert got == {
            ("http://s/en", "de", "http://s/de"): True,
            ("http://s/en", "fr", "http://s/fr"): False,
            ("http://s/de", "en", "http://s/en"): True,
        }


def test_robots_meta_ua_scoped_header(spark):
    """UA-scoped X-Robots-Tag values address a DIFFERENT agent and must
    not apply; directive-colon forms (unavailable_after:) still pass."""
    from pyspark.sql import functions as F

    from bathyscaphe_spark.functions.html import robots_meta_cols

    rows = [(1, "<p>x</p>", "googlebot: noindex"),
            (2, "<p>x</p>", "unavailable_after: 25 Jun 2030, noindex"),
            (3, "<p>x</p>", "noindex")]
    df = spark.createDataFrame(rows, "id long, html string, xr string")
    c = robots_meta_cols(F.col("html"), F.col("xr"))
    got = {r["id"]: r["ni"] for r in df.select("id", c["noindex"].alias("ni")).collect()}
    assert got == {1: False, 2: True, 3: True}


def test_anchor_endorsements_resolved_mode(spark):
    """With url_col, identical relative hrefs on different hosts must
    NOT merge (the reviewed defect)."""
    from bathyscaphe_spark.functions.html import anchor_endorsements

    rows = [(1, "http://a.onion/x/p.html", '<a href="/about">t</a>'),
            (2, "http://b.onion/y/p.html", '<a href="/about">t</a>')]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = sorted(r["href"] for r in anchor_endorsements(df, url_col="url").collect())
    assert got == ["http://a.onion/about", "http://b.onion/about"]
