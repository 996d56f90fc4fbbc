"""Adaptive recrawl scheduling from revisit history.

The reference recrawls on a fixed TTL (cache.go TTL semantics — our D3
operator).  A production crawler instead ESTIMATES each URL's change
rate from its capture history and spends the fetch budget on pages
that are probably stale (Cho & Garcia-Molina, "Effective Page Refresh
Policies for Web Crawlers", TODS 2003 — public).  This operator turns
a captures table (url, warc_ts, content_hash) into per-URL staleness
scores the politeness/priority stage can rank on.

Definitions (all integer arithmetic → bit-identical at any parallelism
and in the DuckDB oracle):

* ``n_changes``  — count of consecutive-capture hash changes per url;
* ``span_s``     — seconds between first and last capture;
* ``age_s``      — seconds since the last capture, measured against a
  corpus-wide ``now`` = max(warc_ts) + horizon (a 1-row broadcast, so
  the score needs no wall clock and stays deterministic);
* ``due_milli``  — 1000 · age_s · n_changes DIV span_s: age expressed
  in thousandths of the URL's mean observed change interval.  0 when
  the URL never changed or has a single capture (nothing observed ⇒
  no evidence it goes stale; a seed-rotation policy handles those).

Scale design: one window (lag over url, ordered by ts) followed by a
groupBy(url) — the window's hash-partitioning by url already satisfies
the aggregation's distribution, so the whole operator is ONE shuffle;
``now`` attaches as a broadcast of a single aggregated row, never a
driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recrawl_priority(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    hash_col: str = "content_hash",
    horizon_s: int = 86_400,
) -> DataFrame:
    """Per-URL recrawl staleness: (url, n_caps, n_changes, span_s,
    age_s, due_milli)."""
    w = Window.partitionBy(url_col).orderBy(ts_col)
    prev = F.lag(F.col(hash_col)).over(w)
    changed = (prev.isNotNull() & (F.col(hash_col) != prev)).cast("long")
    ts_l = F.unix_timestamp(F.col(ts_col))

    per_url = (
        captures.select(
            F.col(url_col).alias("url"),
            ts_l.alias("_ts"),
            changed.alias("_chg"),
        )
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_caps"),
            F.sum("_chg").alias("n_changes"),
            F.min("_ts").alias("_first"),
            F.max("_ts").alias("_last"),
        )
    )
    now = captures.agg(
        (F.max(F.unix_timestamp(F.col(ts_col))) + F.lit(horizon_s)).alias("_now")
    )
    j = per_url.crossJoin(F.broadcast(now))
    span_s: Column = (F.col("_last") - F.col("_first")).cast("long")
    age_s: Column = (F.col("_now") - F.col("_last")).cast("long")
    due = F.when(
        (span_s > 0) & (F.col("n_changes") > 0),
        F.expr("1000 * (_now - _last) * n_changes DIV (_last - _first)"),
    ).otherwise(F.lit(0)).cast("long")
    return j.select(
        "url",
        "n_caps",
        F.col("n_changes").cast("long").alias("n_changes"),
        span_s.alias("span_s"),
        age_s.alias("age_s"),
        due.alias("due_milli"),
    )


# --- pipeline integration: adaptive per-URL seen TTL ------------------------


def adaptive_seen_delta(
    new_urls: DataFrame,
    seen: DataFrame | None,
    fetch_meta: DataFrame | None,
    now_s: int,
    base_s: int,
    min_s: int,
    max_s: int,
    round_n: int,
) -> DataFrame:
    """Seen-delta rows for this round's discoveries with a PER-URL TTL
    adapted from fetch history (multiplicative refresh adaptation: the
    public crawler policy of doubling the revisit interval while a page
    stays byte-stable and halving it when it churns).

    A URL re-discovered after expiry has, by D1, only expired seen
    rows; its fetch history tells us whether the content changed
    between its last two fetches:

    * fewer than two fetches observed → ``base_s`` (nothing to adapt);
    * last two content hashes equal   → min(prev_ttl · 2, max_s);
    * differ                          → max(prev_ttl DIV 2, min_s);

    where prev_ttl is the ttl_s written on the URL's latest prior seen
    row (base_s when that row predates the feature).  Adaptation lags
    one revisit by construction — a change is OBSERVED at the second
    fetch, so the shortened interval applies from the next cycle.

    Scale: fetch_meta and seen are filtered to this round's (small)
    discovery set FIRST — the top-2-by-round window and the max_by
    aggregation run over |new_urls|-sized joins, never over the full
    10^10-row tables.
    """
    keys = new_urls.select("url_hash")
    hist = None
    if fetch_meta is not None:
        m = fetch_meta.join(keys, "url_hash")
        w = Window.partitionBy("url_hash").orderBy(F.desc("round"))
        top2 = m.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= 2)
        hist = top2.groupBy("url_hash").agg(
            F.max(F.when(F.col("_rk") == 1, F.col("content_fnv"))).alias("_last_fnv"),
            F.max(F.when(F.col("_rk") == 2, F.col("content_fnv"))).alias("_prev_fnv"),
        )
    prev = None
    if seen is not None and "ttl_s" in seen.columns:
        prev = (
            seen.join(keys, "url_hash")
            .groupBy("url_hash")
            .agg(F.max_by("ttl_s", "first_seen_round").alias("_prev_ttl"))
        )

    d = new_urls
    if hist is not None:
        d = d.join(hist, "url_hash", "left")
    else:
        d = d.withColumn("_last_fnv", F.lit(None).cast("long")).withColumn(
            "_prev_fnv", F.lit(None).cast("long")
        )
    if prev is not None:
        d = d.join(prev, "url_hash", "left")
    else:
        d = d.withColumn("_prev_ttl", F.lit(None).cast("long"))

    p_ttl = F.coalesce(F.col("_prev_ttl"), F.lit(base_s)).cast("long")
    ttl = (
        F.when(
            F.col("_last_fnv").isNull() | F.col("_prev_fnv").isNull(),
            F.lit(base_s),
        )
        .when(
            F.col("_last_fnv") == F.col("_prev_fnv"),
            F.least(p_ttl * 2, F.lit(max_s)),
        )
        .otherwise(F.greatest(F.floor(p_ttl / 2).cast("long"), F.lit(min_s)))
    ).cast("long")
    return d.select(
        "url_hash",
        F.lit(round_n).alias("first_seen_round"),
        F.timestamp_seconds(F.lit(now_s) + ttl).alias("expires_ts"),
        ttl.alias("ttl_s"),
    )


def compact_fetch_meta(df: DataFrame) -> DataFrame:
    """agg_fn for ``TableCatalog.compact_deltas("fetch_meta", ...)``:
    only the last two fetches per URL feed the TTL adaptation, so
    history beyond them is dead weight — at 10^10 URLs the table would
    otherwise grow by one row per fetch forever.  Keeping exactly the
    top-2 rounds per url_hash preserves adaptive_seen_delta's output
    bit-for-bit."""
    w = Window.partitionBy("url_hash").orderBy(F.desc("round"))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= 2)
        .drop("_rk")
    )


def recrawl_due(
    fetch_meta: DataFrame,
    seen: DataFrame,
    frontier_hashes: DataFrame,
    rts: Column,
    budget: int,
    priority_v: int,
    round_n: int,
) -> DataFrame:
    """The recrawl pump's due-set selection (shared by run_round and the
    ``recrawl_due`` contract query): previously-fetched URLs with NO
    live seen row and not already in the frontier, ranked
    CHANGED-FIRST then oldest-fetch-first (url_hash tie-break) and
    capped at ``budget`` via TakeOrdered — never a global sort.  A URL
    whose last two observations differed is the best staleness
    evidence available (the same signal recrawl_priority scores), so
    it outranks equally-old stable pages when the budget binds.
    Returns frontier-shaped rows.

    max_by(url/host/content_fnv, round) is unambiguous because
    fetch_meta holds at most one row per (url_hash, round) by
    construction.

    Scale note: the change flag needs the last TWO fetches, so the
    pump pays one hash(url_hash) shuffle of fetch_meta with a top-2
    row_number — the same cost class as the seen anti-join.  Periodic
    ``compact_fetch_meta`` (kept-rows ≤ 2 per url) keeps the per-key
    sort O(1) and the table itself O(|fetched urls|), not O(fetches);
    a deployment that skips compaction pays the sort over its full
    fetch history."""
    live = seen.where(
        F.col("expires_ts").isNull() | (F.col("expires_ts") > rts)
    ).select("url_hash")
    w = Window.partitionBy("url_hash").orderBy(F.desc("round"))
    top2 = fetch_meta.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= 2
    )
    last_fetch = top2.groupBy("url_hash").agg(
        F.max_by("url", "round").alias("url"),
        F.max_by("host", "round").alias("host"),
        F.max("round").alias("_last_round"),
        F.max(F.when(F.col("_rk") == 1, F.col("content_fnv"))).alias("_last_fnv"),
        F.max(F.when(F.col("_rk") == 2, F.col("content_fnv"))).alias("_prev_fnv"),
    )
    changed = (
        F.col("_prev_fnv").isNotNull()
        & (F.col("_last_fnv") != F.col("_prev_fnv"))
    ).cast("int")
    due = (
        last_fetch.withColumn("_chg", changed)
        .join(live, "url_hash", "left_anti")
        .join(frontier_hashes.select("url_hash"), "url_hash", "left_anti")
        .orderBy(F.desc("_chg"), F.asc("_last_round"), F.asc("url_hash"))
        .limit(budget)
    )
    return due.select(
        "url",
        "url_hash",
        "host",
        F.lit(0).cast("int").alias("depth"),
        F.lit(priority_v).cast("int").alias("priority"),
        rts.alias("discovered_ts"),
        F.lit(round_n).cast("int").alias("round"),
    )


def conditional_fetch_plan(
    captures: DataFrame,
    url_col: str = "url",
    headers_col: str = "headers",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Plan conditional refetches from each URL's LATEST capture — the
    HTTP revalidation economizer (RFC 9110 §13.1: send If-None-Match
    when the server gave an ETag, else If-Modified-Since from
    Last-Modified; a 304 costs headers, not the body): at recrawl
    cadence most URLs are unchanged, so the validator header is the
    cheapest bandwidth lever a crawler has — cheaper than any
    content-hash dedup because the byte never ships.

    Relational shape: latest capture per url (one window, the
    ``latest_captures`` pick), then a pure-codegen header projection —
    ETag outranks Last-Modified (strong beats heuristic), weak ETags
    (``W/"..."``) are kept verbatim (RFC allows weak validators for
    If-None-Match), and URLs with neither validator fall back to an
    unconditional fetch row.  Case-insensitive header lookup, like the
    rest of the engine.

    Output: (url, validator — 'etag' | 'last-modified' | NULL,
    cond_header, cond_value, n_captures).
    """
    from pyspark.sql import Window

    etag = F.coalesce(
        F.element_at(F.col(headers_col), "ETag"),
        F.element_at(F.col(headers_col), "etag"),
    )
    lastmod = F.coalesce(
        F.element_at(F.col(headers_col), "Last-Modified"),
        F.element_at(F.col(headers_col), "last-modified"),
    )
    # equal-timestamp captures tie-break on the validators themselves
    # (the partition key cannot order within its own partition)
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).desc(),
        F.md5(
            F.concat_ws(
                "|", F.coalesce(etag, F.lit("")), F.coalesce(lastmod, F.lit(""))
            )
        ).asc(),
    )
    latest = (
        captures.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_captures", F.count(F.lit(1)).over(Window.partitionBy(url_col))
        )
        .where(F.col("_rn") == 1)
    )
    validator = (
        F.when(etag.isNotNull(), F.lit("etag"))
        .when(lastmod.isNotNull(), F.lit("last-modified"))
    )
    return latest.select(
        F.col(url_col).alias("url"),
        validator.alias("validator"),
        F.when(etag.isNotNull(), F.lit("If-None-Match"))
        .when(lastmod.isNotNull(), F.lit("If-Modified-Since"))
        .alias("cond_header"),
        F.coalesce(etag, lastmod).alias("cond_value"),
        F.col("n_captures").cast("long").alias("n_captures"),
    )


def revalidation_merge(
    captures: DataFrame,
    responses: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """The RESPONSE half of HTTP revalidation (RFC 9110 §15.4.5 — the
    pair of conditional_fetch_plan): a ``304 Not Modified`` carries no
    body, so the effective capture is the STORED one carried forward
    (the bytes the validator saved are exactly the stored body's), a
    ``200`` replaces it, and anything else keeps the store untouched
    but records the failure.

    ``responses``: (url, status, html) — html non-null only for 200s.

    Output: (url, status, effective_html, source — 'fresh' | 'cache' |
    'none', bytes_saved).

    Plan: ONE latest-capture window over the store (shared shape with
    conditional_fetch_plan) + one url-keyed equi-join; 304 rows never
    ship a body anywhere — the carry-forward is a column pick, not a
    copy.  Pure codegen.
    """
    from pyspark.sql import Window

    # tie-break on exact-equal timestamps must be CONTENT-derived
    # (ordering by the partition key is a no-op): md5(html) is stable
    # across runs and partitionings
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).desc(), F.md5(F.col("html")).asc()
    )
    latest = (
        captures.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col(url_col).alias("url"), F.col("html").alias("_stored"))
    )
    r = responses.join(latest, "url", "left")
    eff = (
        F.when(F.col("status") == 200, F.col("html"))
        .when(F.col("status") == 304, F.col("_stored"))
        .otherwise(F.lit(None))
    )
    return r.select(
        "url",
        "status",
        eff.alias("effective_html"),
        F.when(F.col("status") == 200, F.lit("fresh"))
        .when(
            (F.col("status") == 304) & F.col("_stored").isNotNull(),
            F.lit("cache"),
        )
        .otherwise(F.lit("none"))
        .alias("source"),
        F.when(
            F.col("status") == 304,
            F.coalesce(F.length("_stored"), F.lit(0)),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bytes_saved"),
    )


def cache_policy(
    fetched: DataFrame,
    heuristic_pct: int = 10,
    default_ttl_s: int | None = None,
    url_col: str = "url",
    headers_col: str = "headers",
) -> DataFrame:
    """Server-declared freshness lifetime per response (RFC 9111 §4.2 —
    the HTTP caching spec, public): the third recrawl signal beside
    content-change history (adaptive TTLs) and sitemap <changefreq> —
    when the server SAYS how long the page stays fresh, the crawler
    should not refetch sooner.

    Precedence, exactly the RFC's:
      1. ``Cache-Control: no-store`` / ``no-cache`` ⇒ freshness 0
         (always revalidate; ``max-age=0`` lands at the same 0 via
         rule 2);
      2. ``Cache-Control: max-age=N`` ⇒ N seconds (wins over Expires,
         §4.2.1; s-maxage is for shared caches — a crawler is a private
         consumer, so it is ignored, the conservative reading);
      3. ``Expires`` − ``Date`` (both IMF-fixdate; stale/invalid or
         Expires ≤ Date clamps to 0, §4.2.1's "already expired");
      4. heuristic (§4.2.2): ``heuristic_pct``% of (Date −
         Last-Modified), the classic 10% rule, floor 0;
      5. none of the above ⇒ ``default_ttl_s`` (NULL when None — the
         adaptive policy owns the URL).

    Everything is codegen: case-insensitive header picks, one regexp
    for the max-age directive, the engine's standard IMF-fixdate parse
    (weekday prefix stripped — redundant — ' GMT' dropped; malformed
    dates try_to_timestamp to NULL and fall through to the next rule).
    One narrow projection, no shuffle, no UDF; feeds recrawl_due as
    (url, not-before) like the sitemap intervals do.

    Output: (url, policy — 'no-cache' | 'max-age' | 'expires' |
    'heuristic' | 'default', freshness_s).
    """

    def hdr(name: str) -> Column:
        return F.coalesce(
            F.element_at(F.col(headers_col), name),
            F.element_at(F.col(headers_col), name.lower()),
        )

    from ..functions.textfmt import http_date

    cc = F.lower(F.coalesce(hdr("Cache-Control"), F.lit("")))
    # directive-boundary match: "no-cache" must not fire on
    # "no-cache-xyz" tokens; directives are comma-separated (RFC 9111
    # §5.2) so anchor on start/comma and end/comma/equals
    no_fresh = cc.rlike(r"(^|[,\s])(no-store|no-cache)($|[,\s;=])")
    max_age = F.regexp_extract(cc, r"(^|[,\s])max-age=(\d+)", 2).try_cast(
        "bigint"
    )
    date = http_date(hdr("Date"))
    expires = http_date(hdr("Expires"))
    lastmod = http_date(hdr("Last-Modified"))
    expires_s = F.greatest(
        F.lit(0).cast("bigint"),
        (F.unix_timestamp(expires) - F.unix_timestamp(date)).cast("bigint"),
    )
    # integer-exact percentage: x DIV 100 as (x − x mod 100)/100 — the
    # subtraction makes the double division exact (multiple of 100,
    # far inside 2^53), so no float-truncation-vs-rounding ambiguity
    age_x = (
        F.greatest(
            F.lit(0).cast("bigint"),
            (F.unix_timestamp(date) - F.unix_timestamp(lastmod)).cast(
                "bigint"
            ),
        )
        * F.lit(int(heuristic_pct))
    )
    heur_s = ((age_x - F.pmod(age_x, F.lit(100))) / F.lit(100)).cast("bigint")
    default_lit = (
        F.lit(int(default_ttl_s)).cast("bigint")
        if default_ttl_s is not None
        else F.lit(None).cast("bigint")
    )
    policy = (
        F.when(no_fresh, F.lit("no-cache"))
        .when(max_age.isNotNull(), F.lit("max-age"))
        .when(expires.isNotNull() & date.isNotNull(), F.lit("expires"))
        .when(lastmod.isNotNull() & date.isNotNull(), F.lit("heuristic"))
        .otherwise(F.lit("default"))
    )
    fresh = (
        F.when(no_fresh, F.lit(0).cast("bigint"))
        .when(max_age.isNotNull(), max_age)
        .when(expires.isNotNull() & date.isNotNull(), expires_s)
        .when(lastmod.isNotNull() & date.isNotNull(), heur_s)
        .otherwise(default_lit)
    )
    return fetched.select(
        F.col(url_col).alias("url"),
        policy.alias("policy"),
        fresh.alias("freshness_s"),
    )


def refresh_plan(
    latest_fetch: DataFrame,
    adaptive: DataFrame | None = None,
    sitemap: DataFrame | None = None,
    cache: DataFrame | None = None,
    default_interval_s: int = 7 * 86400,
    min_interval_s: int = 3600,
) -> DataFrame:
    """Fuse the engine's three refresh signals into one per-URL plan —
    the decision a production recrawler actually makes:

      * ``adaptive``  (url, interval_s) — change-history TTLs
        (adaptive_seen_delta): the OBSERVED change rate;
      * ``sitemap``   (url, interval_s) — the site's ADVERTISED cadence
        (sitemap_schedule <changefreq>);
      * ``cache``     (url, freshness_s) — the server's DECLARED
        freshness lifetime (cache_policy, RFC 9111): fetching before
        it expires is guaranteed-wasted bandwidth, so it FLOORS the
        interval rather than competing with the cadence signals.

    Target interval = adaptive if present (observed beats advertised),
    else sitemap, else ``default_interval_s``; effective interval =
    max(target, freshness floor, ``min_interval_s``).  All BIGINT
    seconds — no float, no timezone arithmetic; callers add the epoch.

    One narrow projection over three url-keyed LEFT joins (each side
    is one row per url; at 10^10 URLs all four tables share the same
    url_hash bucketing, so the joins are co-located scan-side).

    Output: (url, source 'adaptive'|'sitemap'|'default', interval_s,
    floor_s, eff_interval_s, next_fetch_epoch).
    """
    out = latest_fetch.select("url", F.col("fetch_epoch").cast("bigint"))
    a = (
        adaptive.select("url", F.col("interval_s").cast("bigint").alias("_a"))
        if adaptive is not None
        else None
    )
    s = (
        sitemap.select("url", F.col("interval_s").cast("bigint").alias("_s"))
        if sitemap is not None
        else None
    )
    c = (
        cache.select("url", F.col("freshness_s").cast("bigint").alias("_f"))
        if cache is not None
        else None
    )
    for t in (a, s, c):
        if t is not None:
            out = out.join(t, "url", "left")
    for col in ("_a", "_s", "_f"):
        if col not in out.columns:
            out = out.withColumn(col, F.lit(None).cast("bigint"))
    source = (
        F.when(F.col("_a").isNotNull(), F.lit("adaptive"))
        .when(F.col("_s").isNotNull(), F.lit("sitemap"))
        .otherwise(F.lit("default"))
    )
    interval = F.coalesce(
        F.col("_a"), F.col("_s"), F.lit(int(default_interval_s)).cast("bigint")
    )
    floor = F.coalesce(F.col("_f"), F.lit(0).cast("bigint"))
    eff = F.greatest(interval, floor, F.lit(int(min_interval_s)).cast("bigint"))
    return out.select(
        "url",
        source.alias("source"),
        interval.alias("interval_s"),
        floor.alias("floor_s"),
        eff.alias("eff_interval_s"),
        (F.col("fetch_epoch") + eff).alias("next_fetch_epoch"),
    )
