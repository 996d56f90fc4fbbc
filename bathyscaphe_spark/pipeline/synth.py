"""Deterministic synthetic crawl universe.

Generates a Common-Crawl-style ``pages`` table shaped per
``BASELINE.json input_hint`` — (url, warc_ts, html, text, lang) plus the
engine-internal (headers, status, host) — entirely with column
expressions over ``spark.range``:

* pure function of (ids, seed): same output at any parallelism level —
  the two-parallelism determinism check depends on this,
* Zipf-ish host skew: host popularity follows a power law so a handful of
  mega-hosts dominate, exercising the skew-splitting path,
* the link graph embeds absolute URLs of OTHER generated pages into each
  body, so extraction → normalization → fetch-join closes over the
  universe (targets are computed with the same url expression),
* bodies carry <title>/<meta> markup for the indexer and a mix of
  eligible (.html/.php/no-ext), rejected (.png) and non-onion links for
  the filters,
* a deterministic subset of hosts is "down": their rows carry the
  timeout status and drive the blacklister.

No wall-clock anywhere: timestamps derive from the reference golden time
2020-10-29T12:04:09Z (local_test.go:18).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.crawler import STATUS_TIMEOUT

BASE_TS = 1603973049  # 2020-10-29T12:04:09Z
SEED = 42


def _u(col: Column, salt: int) -> Column:
    """Deterministic uniform in [0,1) from an id column."""
    h = F.xxhash64(col, F.lit(SEED + salt))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def _host_id(id_col: Column, n_hosts: int) -> Column:
    """Power-law host assignment: host h gets ~ 1/(h+1)^0.8 of pages —
    host 0 is the mega-host."""
    u = _u(id_col, 1)
    # inverse-CDF of a truncated power law, cheap approximation:
    return F.floor(F.pow(u, F.lit(3.0)) * n_hosts).cast("int")


def host_name(host_id: Column) -> Column:
    return F.concat(F.lit("host"), host_id.cast("string"), F.lit(".onion"))


def _ext_for(id_col: Column) -> Column:
    """Deterministic extension mix: 40% .html, 25% .php, 15% no-ext,
    10% .htm, 10% .png (scheduler-rejected)."""
    m = F.pmod(F.xxhash64(id_col, F.lit(SEED + 2)), F.lit(20))
    return (
        F.when(m < 8, F.lit(".html"))
        .when(m < 13, F.lit(".php"))
        .when(m < 16, F.lit(""))
        .when(m < 18, F.lit(".htm"))
        .otherwise(F.lit(".png"))
    )


def url_for(id_col: Column, n_hosts: int) -> Column:
    """The canonical URL of page ``id`` — already in normalized form
    (lowercase, no fragment, no default port, no trailing slash) so that
    extract→normalize reproduces it byte-identically."""
    hid = _host_id(id_col, n_hosts)
    section = F.pmod(F.xxhash64(id_col, F.lit(SEED + 3)), F.lit(7))
    return F.concat(
        F.lit("http://"),
        host_name(hid),
        F.lit("/s"),
        section.cast("string"),
        F.lit("/page"),
        id_col.cast("string"),
        _ext_for(id_col),
    )


def _link_target(id_col: Column, j: int, n_pages: int) -> Column:
    """j-th outlink of page id: a deterministic scatter over the universe.
    Terms are mod-reduced before the add so the expression never overflows
    a long, even at 10^10-page universes (ANSI mode)."""
    h = F.pmod(F.xxhash64(id_col, F.lit(SEED + 10 + j)), F.lit(n_pages))
    return F.pmod(h + F.lit((j * 40503 + 7) % n_pages), F.lit(n_pages))


def build_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int | None = None,
    links_per_page: int = 8,
    timeout_host_every: int = 13,
    parallelism: int | None = None,
) -> DataFrame:
    """The fetch universe.  Columns:
    (page_id, url, host, warc_ts, html, text, lang, headers, status).
    """
    n_hosts = n_hosts or max(10, n_pages // 200)
    rng = spark.range(0, n_pages, 1, parallelism) if parallelism else spark.range(n_pages)
    id_col = F.col("id")
    hid = _host_id(id_col, n_hosts)
    url = url_for(id_col, n_hosts)

    # --- outlinks: absolute URLs of other pages + a few filter-exercising
    # links (non-onion, ftp) --------------------------------------------------
    link_parts = []
    for j in range(links_per_page):
        target = _link_target(id_col, j, n_pages)
        link_parts.append(
            F.concat(
                F.lit('<a href="'),
                url_for(target, n_hosts),
                F.lit('">link '),
                target.cast("string"),
                F.lit("</a>\n"),
            )
        )
    # every 3rd page links to a clearnet site (F1-rejected), every 5th an
    # ftp url (F2-rejected)
    clearnet = F.when(
        F.pmod(id_col, F.lit(3)) == 0,
        F.concat(
            F.lit("see also https://mirror"),
            F.pmod(id_col, F.lit(50)).cast("string"),
            F.lit(".example.com/copy\n"),
        ),
    ).otherwise(F.lit(""))
    ftp = F.when(
        F.pmod(id_col, F.lit(5)) == 0,
        F.concat(
            F.lit("archive at ftp://files"),
            F.pmod(id_col, F.lit(20)).cast("string"),
            F.lit(".onion/dump\n"),
        ),
    ).otherwise(F.lit(""))

    title = F.concat(F.lit("Page "), id_col.cast("string"), F.lit(" of "), host_name(hid))
    body = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit('</title>\n<meta name="description" content="synthetic page '),
        id_col.cast("string"),
        F.lit('">\n<meta property="og:url" content="'),
        url,
        F.lit('">\n</head><body>\n'),
        *link_parts,
        clearnet,
        ftp,
        F.lit("</body></html>\n"),
    )

    # --- status: down hosts time out; sprinkle 404s and redirects ----------
    host_down = F.pmod(hid, F.lit(timeout_host_every)) == F.lit(timeout_host_every - 1)
    m = F.pmod(F.xxhash64(id_col, F.lit(SEED + 4)), F.lit(100))
    status = (
        F.when(host_down, F.lit(STATUS_TIMEOUT))
        .when(m < 3, F.lit(404))
        .when(m < 5, F.lit(301))
        .otherwise(F.lit(200))
    )

    content_type = F.when(
        _ext_for(id_col) == ".png", F.lit("image/png")
    ).otherwise(F.lit("text/html; charset=utf-8"))
    headers = F.create_map(
        F.lit("Content-Type"), content_type,
        F.lit("Server"), F.concat(F.lit("srv-"), F.pmod(hid, F.lit(5)).cast("string")),
    )

    warc_ts = F.timestamp_seconds(F.lit(BASE_TS) + F.pmod(id_col, F.lit(86400)))
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("fr"), F.lit("de")),
        (F.pmod(F.xxhash64(id_col, F.lit(SEED + 5)), F.lit(5)) + 1).cast("int"),
    )

    df = rng.select(
        id_col.alias("page_id"),
        url.alias("url"),
        host_name(hid).alias("host"),
        warc_ts.alias("warc_ts"),
        body.cast("binary").alias("html"),
        lang.alias("lang"),
        headers.alias("headers"),
        status.alias("status"),
    )
    # the byte-identical text invariant, precomputed on the universe
    from ..functions.textfmt import resource_text

    return df.withColumn(
        "text", resource_text(F.col("url"), F.col("headers"), F.col("html").cast("string"))
    )


def build_seeds(spark: SparkSession, pages: DataFrame, n_seeds: int) -> DataFrame:
    """Seed frontier: the lowest-id page per host for the first n_seeds
    hosts (deterministic), shaped like a frontier delta."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("page_id")
    seeds = (
        pages.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .orderBy("page_id")
        .limit(n_seeds)
        .select("url", "host")
    )
    return seeds


def build_host_status(pages: DataFrame) -> DataFrame:
    """F8 liveness fixture: a host is up iff any of its pages responds."""
    return (
        pages.groupBy("host")
        .agg(F.max((F.col("status") != STATUS_TIMEOUT).cast("int")).alias("_up"))
        .select("host", (F.col("_up") == 1).alias("up"))
    )
