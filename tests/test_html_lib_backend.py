"""Parity pin for the optional C-library HTML backend.

``BATHYSCAPHE_HTML_LIB=1`` routes guard-rejected documents through
selectolax/lxml instead of the stdlib state machine
(``functions/html.py``).  Neither library ships in this build
environment, so the whole module SKIPS here; on a cluster where one is
installed this test is the gate for enabling the flag: backend outputs
must equal the stdlib parse on the well-formed golden corpus below.

Deliberately NOT pinned: adversarial tag soup.  HTML5 error recovery
(selectolax/lxml, and the reference's goquery) legitimately differs
from the stdlib state machine on malformed input — which is exactly why
the flag defaults OFF and the engine's oracle contract stays pinned to
the stdlib semantics.
"""

from __future__ import annotations

import importlib
import os

import pytest

try:
    import selectolax  # noqa: F401

    _HAVE_LIB = True
except ImportError:
    try:
        import lxml  # noqa: F401

        _HAVE_LIB = True
    except ImportError:
        _HAVE_LIB = False

pytestmark = pytest.mark.skipif(
    not _HAVE_LIB, reason="no C HTML library in this environment"
)

WELL_FORMED = [
    "<!DOCTYPE html><html><head><title>Doc title</title>"
    '<meta name="description" content="a page"><meta property="og:type" content="site">'
    "</head><body><p>hello <b>world</b></p><script>var x=1;</script></body></html>",
    "<html><head><title>T</title></head><body>"
    "<style>p{color:red}</style><p>visible</p><noscript>off</noscript></body></html>",
    '<html><head><meta name="A" content="1"><meta name="A" content="2">'
    "<title>first</title><title>second</title></head><body>b</body></html>",
]


@pytest.fixture()
def lib_html(monkeypatch):
    """Reload functions.html with the library flag ON; restore after."""
    monkeypatch.setenv("BATHYSCAPHE_HTML_LIB", "1")
    from bathyscaphe_spark.functions import html as H

    importlib.reload(H)
    assert H._LIB_BACKEND in ("selectolax", "lxml")
    yield H
    monkeypatch.delenv("BATHYSCAPHE_HTML_LIB")
    os.environ.pop("BATHYSCAPHE_HTML_LIB", None)
    importlib.reload(H)


@pytest.mark.parametrize("body", WELL_FORMED)
def test_lib_backend_matches_stdlib(lib_html, body):
    H = lib_html
    doc_lib = H._parse_doc_lib(body)
    txt_lib = H._extract_text_lib(body)
    assert doc_lib is not None and txt_lib is not None

    p = H._DocParser()
    p.feed(body)
    p.close()
    assert doc_lib == ("".join(p.title_parts), p.meta,
                       p.meta.get("description", ""))

    t = H._TextParser()
    t.feed(body)
    t.close()
    assert txt_lib == " ".join(t.parts)


def test_lib_backend_used_on_guard_rejected(lib_html):
    """A script-bearing (guard-rejected) document flows through the
    library path inside parse_doc_py/extract_text_py."""
    H = lib_html
    body = WELL_FORMED[0]
    assert not H._is_simple_html(body)
    assert H.parse_doc_py(body) == H._parse_doc_lib(body)
    assert H.extract_text_py(body) == H._extract_text_lib(body)
