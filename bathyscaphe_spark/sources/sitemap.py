"""Sitemap ingestion — sitemap.xml / sitemap-index bodies into seeds.

The sitemaps protocol (sitemaps.org, public spec) is the crawl-world's
push channel: hosts advertise their own URL inventory with optional
``lastmod``.  The reference has no sitemap handling (seeds are
hand-published events, README.md:22-33); at Common-Crawl scale sitemaps
are the cheapest frontier bootstrap there is, so the engine ingests
them as a first-class source.

Parsing is stdlib ``xml.etree`` with namespace-wildcard matching (the
spec's namespace varies in the wild), tolerant of junk bodies (returns
empty).  Both document kinds are handled: ``<urlset>`` (leaf pages) and
``<sitemapindex>`` (pointers to more sitemaps — emitted with
``is_index=true`` so the driver can fetch-and-recurse a level per
round).  URLs are canonicalized with the engine's X2 normalizer so they
join/dedup exactly like every other frontier URL.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITEMAP_SCHEMA = ("host string, url string, lastmod string, is_index boolean,"
                  " changefreq string, priority_milli int")


def _priority_milli(text: str | None) -> int | None:
    """<priority> 0.0–1.0 → integer milli (deterministic; out-of-range
    or unparseable → None, per the protocol's 'ignore' guidance)."""
    if text is None:
        return None
    try:
        v = float(text.strip())
    except ValueError:
        return None
    if not 0.0 <= v <= 1.0:
        return None
    return int(round(v * 1000))


def parse_sitemap_py(
    body: str | bytes | None,
) -> list[tuple[str, str | None, bool, str | None, int | None]]:
    """One sitemap body → [(loc, lastmod, is_index, changefreq,
    priority_milli)].  Malformed XML or a non-sitemap root yields []."""
    if body is None:
        return []
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", errors="replace")
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return []
    tag = root.tag.rsplit("}", 1)[-1].lower()
    if tag not in ("urlset", "sitemapindex"):
        return []
    is_index = tag == "sitemapindex"
    out: list[tuple[str, str | None, bool, str | None, int | None]] = []
    for entry in root:
        loc = entry.find("{*}loc")
        if loc is None or not (loc.text or "").strip():
            continue
        lastmod = entry.find("{*}lastmod")
        cf = entry.find("{*}changefreq")
        pr = entry.find("{*}priority")
        out.append(
            (
                loc.text.strip(),
                (lastmod.text or "").strip() if lastmod is not None else None,
                is_index,
                (cf.text or "").strip().lower() if cf is not None else None,
                _priority_milli(pr.text if pr is not None else None),
            )
        )
    return out


def read_sitemaps(bodies: DataFrame, host_col: str = "host",
                  body_col: str = "body") -> DataFrame:
    """(host, body) rows of fetched sitemap files →
    (host, url, lastmod, is_index) — one vectorized mapInPandas stage,
    urls X2-normalized (null/unparseable dropped)."""
    from ..functions.urltools import normalize_url

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for loc, mod, is_idx, cf, pm in parse_sitemap_py(body):
                    rows.append((host, loc, mod, is_idx, cf, pm))
            yield pd.DataFrame(
                rows,
                columns=["host", "url", "lastmod", "is_index",
                         "changefreq", "priority_milli"],
            )

    out = bodies.select(
        F.col(host_col).alias(host_col), F.col(body_col).alias(body_col)
    ).mapInPandas(_run, schema=SITEMAP_SCHEMA)
    return out.withColumn("url", normalize_url(F.col("url"))).where(
        F.col("url").isNotNull()
    )


def seeds_from_sitemaps(bodies: DataFrame, host_col: str = "host",
                        body_col: str = "body") -> DataFrame:
    """Leaf sitemap entries as a seeds frame for
    ``pipeline.driver.bootstrap``: (url, host) — deduplicated, index
    pointers excluded (recurse those with another fetch round)."""
    from ..functions.urltools import url_host_py

    entries = read_sitemaps(bodies, host_col, body_col)

    @F.pandas_udf("string")
    def _host_of(u: pd.Series) -> pd.Series:
        return u.map(lambda v: url_host_py(v) if v is not None else None)

    return (
        entries.where(~F.col("is_index"))
        .select("url", _host_of(F.col("url")).alias("host"))
        .dropDuplicates(["url"])
    )


# --- sitemap GENERATION (the export side of the protocol) -------------------

SITEMAP_MAX_URLS = 50_000  # sitemaps.org protocol hard limit per file

_SM_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
)
_SM_FOOTER = "</urlset>\n"


def sitemap_export(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    host_col: str = "host",
    max_urls: int = SITEMAP_MAX_URLS,
) -> DataFrame:
    """Generate per-host urlset sitemap documents from crawled pages —
    the export side of the protocol this engine already parses
    (read_sitemaps) and schedules by (sitemap_refresh): a mirror /
    re-publish pipeline advertises its corpus back the same way it was
    discovered.  Respects the public 50k-URLs-per-file limit by
    chunking each host's URL list (url-ordered, deterministic) and
    emits byte-deterministic XML — lastmod as W3C date, '&' escaped in
    locs (fixture-safe superset of the XML escapes).

    Scale shape: one (host) window for the chunk ordinal, then one
    groupBy (host, chunk) whose collect_list is BOUNDED by max_urls —
    the protocol's own limit is the skew cap; no host ever aggregates
    more than 50k rows per output file.

    Output: (host, chunk, n_urls, xml).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(url_col)
    chunked = pages.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("lastmod"),
    ).withColumn(
        "chunk",
        ((F.row_number().over(
            Window.partitionBy(host_col).orderBy("url")
        ) - 1) / max_urls).cast("long"),
    )
    entry = lambda s: F.concat(  # noqa: E731
        F.lit("  <url><loc>"),
        F.replace(s["url"], F.lit("&"), F.lit("&amp;")),
        F.lit("</loc><lastmod>"),
        s["lastmod"],
        F.lit("</lastmod></url>\n"),
    )
    return (
        chunked.groupBy("host", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.array_sort(F.collect_list(F.struct("url", "lastmod"))).alias("a"),
        )
        .select(
            "host",
            "chunk",
            "n_urls",
            F.concat(
                F.lit(_SM_HEADER),
                F.array_join(F.transform("a", entry), ""),
                F.lit(_SM_FOOTER),
            ).alias("xml"),
        )
    )


_SMI_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
)
_SMI_FOOTER = "</sitemapindex>\n"


def sitemap_index_export(chunks: DataFrame) -> DataFrame:
    """Generate the per-host ``sitemapindex`` over ``sitemap_export``'s
    chunks — the protocol's second level: a host past the 50k-URL
    limit advertises one index document pointing at its chunk files
    (``https://<host>/sitemap-<chunk>.xml``, the conventional layout
    ``read_sitemaps`` already recognizes as ``is_index`` on the parse
    side).  One groupBy(host) over the CHUNK table (already tiny —
    1/50k of the URL count), byte-deterministic XML.

    Output: (host, n_sitemaps, total_urls, xml).
    """
    entry = lambda s: F.concat(  # noqa: E731
        F.lit("  <sitemap><loc>https://"),
        s["host"],
        F.lit("/sitemap-"),
        s["chunk"].cast("string"),
        F.lit(".xml</loc></sitemap>\n"),
    )
    return (
        chunks.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_sitemaps"),
            F.sum("n_urls").alias("total_urls"),
            F.array_sort(F.collect_list(F.struct("chunk", "host"))).alias("a"),
        )
        .select(
            "host",
            "n_sitemaps",
            "total_urls",
            F.concat(
                F.lit(_SMI_HEADER),
                F.array_join(F.transform("a", entry), ""),
                F.lit(_SMI_FOOTER),
            ).alias("xml"),
        )
    )


# the sitemaps-protocol changefreq vocabulary → refetch interval seconds
# ("always" floors at hourly — a batch crawler cannot refetch mid-round;
# "never" and absent → NULL: no protocol-driven schedule, the adaptive
# recrawl policy owns the URL)
CHANGEFREQ_S = {
    "always": 3600, "hourly": 3600, "daily": 86400, "weekly": 604800,
    "monthly": 2592000, "yearly": 31536000,
}


def sitemap_schedule(entries: DataFrame) -> DataFrame:
    """Scheduling view of parsed sitemap entries — the protocol's whole
    point: (host, url, priority_milli defaulting 500, interval_s from
    the changefreq table).  Pure codegen CASE over ``read_sitemaps``
    output; sitemapindex rows are excluded (they are fetch targets,
    not schedulable pages).  Feed the priority into the frontier boost
    and the interval into recrawl_due's per-URL TTL."""
    cf = F.lower(F.col("changefreq"))
    interval = F.when(F.lit(False), F.lit(None).cast("long"))
    for k, v in CHANGEFREQ_S.items():
        interval = interval.when(cf == k, F.lit(v).cast("long"))
    return entries.where(~F.col("is_index")).select(
        "host",
        "url",
        F.coalesce(F.col("priority_milli"), F.lit(500))
        .cast("int")
        .alias("priority_milli"),
        interval.alias("interval_s"),
    )
