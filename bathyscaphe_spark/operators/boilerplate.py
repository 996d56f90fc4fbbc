"""Block-level boilerplate classification (jusText-style main-content
extraction — Pomikálek 2011, public).

``html_text`` strips tags but keeps EVERYTHING — navigation, footers,
link farms.  A training corpus wants the main content only, and the
classic public answer (jusText / boilerpipe family) is block-level:
segment the page at block-level tags, score each block's link density
and length, then let undecided short blocks inherit from their decided
neighbors (a short block INSIDE good flow is a heading/caption and
stays; a trailing short block is a footer and goes).

Two stages, split exactly on the engine's UDF boundary rule:

1. **Segmentation** needs a real HTML parse → one Arrow-batched
   ``mapInPandas`` kernel emitting (doc, block_idx, text, chars,
   link_chars) rows — the same stdlib-tolerant parser family as
   ``functions/html.py`` (reference parity: the reference's goquery
   extraction is also a per-page parse,
   `/root/reference/internal/crawler/crawler.go:113-120`).
2. **Classification** is pure codegen: integer link-density and length
   thresholds, then the context pass as two IGNORE-NULLS window
   functions over (doc, block_idx) — one shuffle, one sort, both
   windows share it.  No per-row Python beyond the unavoidable parse.

Determinism: thresholds are integer cross-multiplications
(``link_chars·1000 ≥ LINK_DENSITY_PM·chars``), the context rule is a
pure CASE over two deterministic window lookups — bit-identical at any
parallelism and replicated verbatim by the DuckDB oracle.

Scale: blocks are a bounded fan-out of pages (tens per page); the only
exchange is the per-doc window sort, partitioned by doc id — no skew
(a single page has bounded blocks), no driver involvement.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.html import _SKIP_CONTENT_TAGS

# block-level segmentation boundaries (HTML5 flow-content splitters)
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 ul ol li dl dt dd table thead tbody tr td th"
    " blockquote pre nav header footer aside section article form fieldset"
    " br hr title head body html".split()
)

LINK_DENSITY_PM = 330  # ≥ 33.0% of block chars inside <a> ⇒ boilerplate
LEN_GOOD = 50  # ≥ 50 collapsed chars (and not link-dense) ⇒ content


class _BlockParser(HTMLParser):
    """Segment visible text into blocks at block-tag boundaries,
    tracking how many characters sit inside anchors.  Whitespace
    collapses per data run exactly as ``extract_text`` does; runs in a
    block join with single spaces (joining spaces count toward
    ``chars`` but never toward ``link_chars``)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._runs: list[tuple[str, bool]] = []
        self._skip = 0
        self._adepth = 0

    def _flush(self) -> None:
        runs = self._runs
        self._runs = []
        if not runs:
            return
        text = " ".join(r[0] for r in runs)
        link = sum(len(r[0]) for r in runs if r[1])
        self.blocks.append((text, len(text), link))

    def handle_starttag(self, tag, attrs) -> None:
        if tag in _SKIP_CONTENT_TAGS:
            self._skip += 1
            return
        if tag == "a":
            self._adepth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag) -> None:
        if tag in _SKIP_CONTENT_TAGS:
            if self._skip:
                self._skip -= 1
            return
        if tag == "a" and self._adepth:
            self._adepth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data) -> None:
        if self._skip:
            return
        w = data.split()
        if w:
            self._runs.append((" ".join(w), self._adepth > 0))


def block_segments_py(body: str | bytes | None) -> list[tuple[str, int, int]]:
    """html → [(block_text, chars, link_chars)] in document order."""
    if body is None:
        return []
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", errors="replace")
    p = _BlockParser()
    try:
        p.feed(body)
        p.close()
    except Exception:
        pass
    p._flush()
    return p.blocks


def block_segments(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Exploded block rows: (id, block_idx, text, chars, link_chars)."""
    out_schema = (
        f"{id_col} long, block_idx int, text string,"
        " chars long, link_chars long"
    )

    def _run(batches):
        for pdf in batches:
            ids, idxs, texts, chars, links = [], [], [], [], []
            for iid, body in zip(pdf[id_col], pdf[html_col]):
                for i, (t, c, l) in enumerate(block_segments_py(body)):
                    ids.append(int(iid))
                    idxs.append(i)
                    texts.append(t)
                    chars.append(c)
                    links.append(l)
            yield pd.DataFrame(
                {id_col: ids, "block_idx": idxs, "text": texts,
                 "chars": chars, "link_chars": links}
            )

    return df.select(id_col, html_col).mapInPandas(_run, schema=out_schema)


def classify_blocks(blocks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Context-free labels + the neighbor-inheritance pass, all codegen.

    Context-free: ``bad`` when link-dense (integer cross-multiply),
    ``good`` when ≥ LEN_GOOD collapsed chars, else ``short``
    (undecided).  Context: a short block is kept only when the nearest
    DECIDED neighbors on BOTH sides are good (document edges count as
    bad) — captions inside good flow stay, leading titles and trailing
    footers go.  Adds (ctx_label, label).
    """
    ctx = (
        F.when(
            (F.col("chars") > 0)
            & (F.col("link_chars") * 1000 >= LINK_DENSITY_PM * F.col("chars")),
            F.lit("bad"),
        )
        .when(F.col("chars") >= LEN_GOOD, F.lit("good"))
        .otherwise(F.lit("short"))
    )
    b = blocks.withColumn("ctx_label", ctx)
    decided = F.when(F.col("ctx_label") != "short", F.col("ctx_label"))
    wp = (
        Window.partitionBy(id_col)
        .orderBy("block_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy(id_col)
        .orderBy("block_idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev_d = F.last(decided, ignorenulls=True).over(wp)
    next_d = F.first(decided, ignorenulls=True).over(wn)
    label = F.when(F.col("ctx_label") != "short", F.col("ctx_label")).otherwise(
        F.when(
            (F.coalesce(prev_d, F.lit("bad")) == "good")
            & (F.coalesce(next_d, F.lit("bad")) == "good"),
            F.lit("good"),
        ).otherwise(F.lit("bad"))
    )
    return b.withColumn("label", label)


def main_content(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Page → main content text: good blocks re-joined in document
    order (array_sort over collected (idx, text) structs — no second
    window)."""
    labeled = classify_blocks(block_segments(df, id_col, html_col), id_col)
    arr = F.array_sort(F.collect_list(F.struct("block_idx", "text")))
    return (
        labeled.where(F.col("label") == "good")
        .groupBy(id_col)
        .agg(arr.alias("p"))
        .select(
            id_col,
            F.expr("array_join(transform(p, x -> x.text), ' ')").alias(
                "main_text"
            ),
        )
    )
