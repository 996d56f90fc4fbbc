"""Crawler — the fetch stage of a round.

Re-creates the reference crawler (internal/crawler/crawler.go:91-155) as a
set-oriented join instead of per-message HTTP:

* S4 fetch: the sandbox has no network, so fetching is an equi-join of the
  scheduled frontier against the ``pages`` universe table on ``url``
  (SURVEY.md S4).  In a real deployment this stage swaps to a
  ``mapInPandas`` async HTTP pool; everything up/downstream is unchanged.
* F4: forbidden-hostname check also runs crawler-side (crawler.go:99-104).
* O4 timeouts: rows whose synthetic ``status`` marks a timeout become the
  round's ``timeouts`` delta (crawler.go:106-114).
* F6 redirects: 301/302 are followed (the pages fixture stores resolved
  bodies); status > 302 ⇒ dropped (http/client.go:48-56).
* F5 content-type: allowed iff the response Content-Type CONTAINS any
  configured content-type prefix; an EMPTY allowlist allows everything
  (crawler.go:116-135, crawler_test.go:93-97).

Scale notes: frontier⋈pages is the big join of the system — both sides
hash-partition on ``url``; AQE handles stragglers and the politeness stage
has already bounded per-host row counts, so the join key is near-uniform.
The fetch stage runs on the salted partitioning produced by
operators/politeness.py so a mega-host never pins a single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig
from .scheduler import apply_hostname_blacklist

STATUS_TIMEOUT = -1  # synthetic marker (reference: chttp.ErrTimeout)


def content_type_allowed(
    content_type: Column, allowed: tuple[str, ...]
) -> Column:
    """F5: contains-match against the configured content types; empty
    allowlist ⇒ allow all.  NULL content-type only passes the empty-list
    case, mirroring Go where a missing header is "" and contains("")
    is true — so a non-empty config with prefix '' also allows all."""
    if not allowed:
        return F.lit(True)
    ct = F.coalesce(content_type, F.lit(""))
    ok = F.lit(False)
    for prefix in allowed:
        ok = ok | ct.contains(prefix)
    return ok


def fetch_join(
    scheduled: DataFrame,
    pages: DataFrame,
    blacklist: DataFrame | list[str] | None = None,
) -> DataFrame:
    """S4: the raw fetch join (frontier ⋈ pages on url) with the
    crawler-side F4 filter applied first.  Callers persist THIS and
    derive both branches from the cache — the join runs once per round."""
    scheduled = apply_hostname_blacklist(scheduled, blacklist)
    page_cols = ["url", "html", "headers", "warc_ts", "status"]
    return scheduled.join(pages.select(*page_cols), "url", "inner")


def split_fetched(
    fetched: DataFrame, config: CrawlConfig
) -> tuple[DataFrame, DataFrame]:
    """(fetched_ok, timeouts) from the (cached) fetch join output."""
    timeouts = fetched.where(F.col("status") == STATUS_TIMEOUT).select(
        "url", "host"
    )
    ok = fetched.where((F.col("status") >= 200) & (F.col("status") <= 302))
    # Go's http.Header canonicalizes to Content-Type; WARC-ingested
    # headers arrive lowercased (X7) — accept either casing
    ct = F.coalesce(
        F.element_at(F.col("headers"), "Content-Type"),
        F.element_at(F.col("headers"), "content-type"),
    )
    if config.mime_sniff_enabled:
        # payload wins over a lying or missing header: when the sniffed
        # essence contradicts the declared essence the F5 match runs
        # against the sniffed one (functions/textfmt.py sniff_mime)
        from ..functions.textfmt import declared_essence, sniff_mime

        sniffed = sniff_mime(F.col("html"))
        ct = (
            F.when(sniffed.isNull(), ct)
            .when(ct.isNull() | (sniffed != declared_essence(ct)), sniffed)
            .otherwise(ct)
        )
    ok = ok.where(content_type_allowed(ct, config.allowed_content_types))
    return ok, timeouts


def fetch(
    scheduled: DataFrame,
    pages: DataFrame,
    config: CrawlConfig,
    blacklist: DataFrame | list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Simulated fetch of the scheduled frontier.

    Returns ``(fetched_ok, timeouts)``:

    * ``fetched_ok``: frontier rows joined with their page payload
      (html, headers, warc_ts), redirect- and content-type-filtered —
      the round's ``NewResourceEvent`` set,
    * ``timeouts``: (url, host) rows for the blacklister.

    Frontier rows with no page in the universe simulate dead links
    (reference: fetch error ⇒ drop, crawler.go:106-114).
    """
    return split_fetched(fetch_join(scheduled, pages, blacklist), config)


# --------------------------------------------------------------------------
# soft-404 detection (error pages served with HTTP 200)
# --------------------------------------------------------------------------

SOFT404_PHRASES = (
    "page not found|404 error|does not exist|no longer available"
    "|page you requested|been removed"
)
SOFT404_TEMPLATE_MIN = 5  # distinct URLs sharing one body on one host


def soft404_flags(
    fetched: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    text_col: str = "text",
    phrases: str = SOFT404_PHRASES,
    template_min: int = SOFT404_TEMPLATE_MIN,
) -> DataFrame:
    """Flag error pages served with HTTP 200 — the classic crawl-index
    pollution source (a host's catch-all template returns 200 for any
    path, and every dead outlink becomes a "document").

    Two signals, both relational:

    * ``phrase_hit`` — an error-phrase regex over the lowercased body
      (pure codegen, one pass);
    * ``template_size`` — how many DISTINCT URLs on the same host serve
      this exact body (xxhash64 of the text; one (host, body-hash)
      aggregation).  A host's soft-404 template is the body that
      appears at many different URLs, which is how production crawlers
      detect it (fetch a known-random path, compare — here the corpus
      itself supplies the evidence).

    ``soft404`` = phrase_hit OR template_size ≥ template_min.  The
    phrase list errs conservative; the template signal catches the
    phrase-free templates and localized error pages.

    Scale shape: one groupBy (host, body-hash) with map-side combine +
    one equi-join back on the same key — no windows, no UDFs; the join
    key reuses the aggregation's partitioning.

    Output: fetched + (phrase_hit, template_size, soft404).
    """
    bh = F.xxhash64(F.col(text_col))
    tagged = fetched.withColumn("_bh", bh).withColumn(
        "phrase_hit", F.lower(F.col(text_col)).rlike(phrases)
    )
    templates = tagged.groupBy(
        F.col(host_col).alias("_th"), F.col("_bh").alias("_tb")
    ).agg(F.countDistinct(url_col).alias("template_size"))
    return (
        tagged.join(
            templates,
            (F.col(host_col) == F.col("_th")) & (F.col("_bh") == F.col("_tb")),
        )
        .drop("_th", "_tb", "_bh")
        .withColumn(
            "soft404",
            F.col("phrase_hit") | (F.col("template_size") >= template_min),
        )
    )
