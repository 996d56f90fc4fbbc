"""RSS 2.0 / Atom 1.0 feed ingestion — syndication bodies into seeds.

Why a crawler needs this: a sitemap advertises a host's *inventory*, a
feed advertises its *recency*.  The reference discovers URLs only by
parsing fetched HTML bodies (`/root/reference/internal/scheduler/
scheduler.go:61-78` — xurls over the page text), so a new article is
only found once something already crawled links to it; polling the
site's feed surfaces it immediately.  Both wire formats are public
specs: RSS 2.0 (rssboard.org/rss-specification) and Atom (RFC 4287).

Parsing is stdlib ElementTree with namespace-wildcard matching,
tolerant of junk bodies (returns empty), one vectorized mapInPandas
stage — the same shape as sitemap ingestion (`sources/sitemap.py`).
RSS items carry ``<link>`` text and an RFC-822 ``<pubDate>``; Atom
entries carry ``<link href="…">`` (the alternate link per RFC 4287
§4.2.7.2: explicit ``rel="alternate"`` or no rel at all) and an
RFC-3339 ``<updated>``/``<published>``.  URLs are X2-normalized so
feed-discovered URLs join and dedup exactly like every other frontier
URL.

``feed_recency`` turns the publish date into a frontier priority boost
with pure integer arithmetic (newer ⇒ larger, linear to zero over the
horizon) — the recency half of the freshness policy, beside the
change-rate half ``operators/recrawl.py`` estimates from fetch history.
Both date grammars are parsed JVM-side (``to_timestamp`` after a
codegen'd reshape; the weekday token is stripped for Spark's post-3.0
parser, as in ``retry_after_budgets``) — no Python in the date path.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEED_SCHEMA = "host string, url string, title string, published string, kind string"


def _text(parent: ET.Element, tag: str) -> str | None:
    el = parent.find("{*}" + tag)
    if el is None:
        return None
    t = (el.text or "").strip()
    return t or None


def _atom_link(entry: ET.Element) -> str | None:
    """RFC 4287 §4.2.7.2: the alternate link — explicit
    rel="alternate" wins, else the first link with no rel."""
    fallback = None
    for link in entry.findall("{*}link"):
        href = (link.get("href") or "").strip()
        if not href:
            continue
        rel = link.get("rel")
        if rel == "alternate":
            return href
        if rel is None and fallback is None:
            fallback = href
    return fallback


def parse_feed_py(
    body: str | bytes | None,
) -> list[tuple[str, str | None, str | None, str]]:
    """One feed body → [(url, title, published_raw, kind)] with kind in
    {'rss', 'atom'}.  Malformed XML or a non-feed root yields []."""
    if body is None:
        return []
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", errors="replace")
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return []
    tag = root.tag.rsplit("}", 1)[-1].lower()
    out: list[tuple[str, str | None, str | None, str]] = []
    if tag == "rss":
        channel = root.find("{*}channel")
        if channel is None:
            return []
        for item in channel.findall("{*}item"):
            url = _text(item, "link")
            if url is None:
                continue
            out.append((url, _text(item, "title"), _text(item, "pubDate"), "rss"))
    elif tag == "feed":
        for entry in root.findall("{*}entry"):
            url = _atom_link(entry)
            if url is None:
                continue
            pub = _text(entry, "published") or _text(entry, "updated")
            out.append((url, _text(entry, "title"), pub, "atom"))
    return out


def read_feeds(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) rows of fetched feed files → (host, url, title,
    published, kind) — one vectorized mapInPandas stage, urls
    X2-normalized (null/unparseable dropped)."""
    from ..functions.urltools import normalize_url

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for url, title, pub, kind in parse_feed_py(body):
                    rows.append((host, url, title, pub, kind))
            yield pd.DataFrame(
                rows, columns=["host", "url", "title", "published", "kind"]
            )

    out = bodies.select(
        F.col(host_col).alias(host_col), F.col(body_col).alias(body_col)
    ).mapInPandas(_run, schema=FEED_SCHEMA)
    return out.withColumn("url", normalize_url(F.col("url"))).where(
        F.col("url").isNotNull()
    )


def seeds_from_feeds(
    bodies: DataFrame,
    now: str,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Feed entries as a seeds frame for ``pipeline.driver.bootstrap``:
    (url, host, boost) — deduplicated per url keeping the freshest
    claim (a URL syndicated by several feeds takes its max recency
    boost, deterministically: max boost, then max pub_epoch)."""
    from ..functions.urltools import url_host_py

    entries = feed_recency(read_feeds(bodies, host_col, body_col), now=now)

    @F.pandas_udf("string")
    def _host_of(u: pd.Series) -> pd.Series:
        return u.map(lambda v: url_host_py(v) if v is not None else None)

    return (
        entries.groupBy("url")
        .agg(
            F.max("boost").alias("boost"),
            F.max("pub_epoch").alias("pub_epoch"),
        )
        .select("url", _host_of(F.col("url")).alias("host"), "boost",
                "pub_epoch")
    )


def parse_feed_ts(published: Column, kind: Column) -> Column:
    """Publish-date string → timestamp, JVM-side, both grammars:

    * rss — RFC 822 ``Tue, 10 Jun 2003 04:00:00 GMT``: weekday token
      dropped (Spark's post-3.0 parser rejects localized EEE on parse),
      trailing zone token dropped (feeds in the wild say GMT/UT/+0000;
      only the UTC forms are accepted — anything else parses NULL
      rather than silently shifting).
    * atom — RFC 3339 ``2003-12-13T18:30:02Z``: native
      ``yyyy-MM-dd'T'HH:mm:ssX`` parse.

    Unparseable → NULL (callers treat NULL as "no recency signal").
    """
    rss_clean = F.regexp_replace(
        F.regexp_replace(published, r"^[A-Za-z]{3},\s*", ""),
        r"\s+(GMT|UT|UTC|Z|\+0000|\+00:00)\s*$",
        "",
    )
    rss_ok = published.rlike(r"(GMT|UT|UTC|Z|\+0000|\+00:00)\s*$")
    return F.when(
        kind == F.lit("rss"),
        # 'd' (flexible 1-2 digit day), not 'dd': RFC 822 allows
        # 1*2DIGIT and many feed generators emit "Tue, 1 Jul 2003 …" —
        # a strict 'dd' parse silently NULLs their recency signal
        F.when(rss_ok, F.try_to_timestamp(rss_clean, F.lit("d MMM yyyy HH:mm:ss"))),
    ).otherwise(F.try_to_timestamp(published, F.lit("yyyy-MM-dd'T'HH:mm:ssX")))


def feed_recency(
    entries: DataFrame,
    now: str,
    horizon_s: int = 7 * 86400,
    max_boost: int = 500,
) -> DataFrame:
    """Publish dates → integer frontier-priority boosts under the
    replayable ``now`` clock (never wall time — same discipline as
    ``retry_after_budgets``).

    boost = max_boost · (horizon − age) DIV horizon, clamped to
    [0, max_boost]; future-dated entries (age < 0, a real feed
    pathology) clamp to the full boost rather than extrapolating.
    Unparseable/absent dates boost 0.  Output adds (pub_epoch, boost);
    pure column arithmetic, no shuffle.
    """
    ts = parse_feed_ts(F.col("published"), F.col("kind"))
    age = F.unix_timestamp(F.lit(now).cast("timestamp")) - F.unix_timestamp(ts)
    # age clamped into [0, horizon]: future-dated ⇒ full boost, older
    # than the horizon ⇒ 0; then one integer ramp (no floats anywhere)
    age_c = F.least(F.greatest(age, F.lit(0)), F.lit(int(horizon_s)))
    boost = F.expr(
        f"CAST({int(max_boost)} * ({int(horizon_s)} - _feed_age_c) "
        f"DIV {int(horizon_s)} AS INT)"
    )
    return (
        entries.withColumn("_feed_age_c", age_c)
        .withColumn("pub_epoch", F.unix_timestamp(ts))
        .withColumn(
            "boost",
            F.when(F.col("pub_epoch").isNull(), F.lit(0)).otherwise(boost),
        )
        .drop("_feed_age_c")
    )
