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
