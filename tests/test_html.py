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
