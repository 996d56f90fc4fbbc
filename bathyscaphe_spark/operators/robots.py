"""robots.txt parsing + path filtering (north-rule addition — the
reference has no robots handling; blacklisting is its only crawl-policy
filter).

Model: fetched ``/robots.txt`` bodies parse into a ``robots`` table
(host, disallow: array<string> of path prefixes) via the standard
robots exclusion grammar (public spec: user-agent groups, Disallow
lines, '#' comments, empty-Disallow-means-unrestricted); candidates are
excluded when their host has a disallow prefix that prefixes the
candidate's path — a broadcast theta anti-join exactly like F4,
equality on host plus ``startswith`` on path.  The robots table is
per-host tiny (even at 10^10 URLs it is bounded by host count) —
always the broadcast side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, StringType


def _split_groups(text: str) -> list[tuple[list[str], list[str], float | None]]:
    """robots.txt → [(agents, disallow_prefixes, crawl_delay)] groups:
    consecutive User-agent lines open a group, any rule line enters its
    body, '#' starts a comment, empty Disallow values skip."""
    groups: list[tuple[list[str], list[str], float | None]] = []
    agents: list[str] = []
    dis: list[str] = []
    delay: float | None = None
    in_body = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_body:
                groups.append((agents, dis, delay))
                agents, dis, delay, in_body = [], [], None, False
            agents.append(val)
        elif key in ("disallow", "allow", "crawl-delay"):
            in_body = True
            if key == "disallow" and val:
                dis.append(val)
            elif key == "crawl-delay":
                try:
                    d = float(val)
                except ValueError:
                    continue
                if d > 0:
                    delay = max(delay or 0.0, d)
    if agents or dis or delay is not None:
        groups.append((agents, dis, delay))
    return groups


def _select_groups(groups, agent: str) -> list[int]:
    """RFC 9309 §2.2.1 group selection: the MOST SPECIFIC matching
    product token wins — a token matches when it equals the crawler's
    agent or prefixes it (the de-facto longest-prefix rule production
    crawlers apply), longer tokens beat shorter, groups tying on the
    winning length COMBINE, and the '*' groups apply only when no
    specific token matched at all."""
    agent = agent.lower()
    best = -1
    chosen: list[int] = []
    for idx, grp in enumerate(groups):
        toks = [a.lower() for a in grp[0]]
        spec = [
            len(t) for t in toks
            if t != "*" and (agent == t or agent.startswith(t))
        ]
        if spec:
            length = max(spec)
            if length > best:
                best, chosen = length, [idx]
            elif length == best:
                chosen.append(idx)
    if chosen:
        return chosen
    return [i for i, g in enumerate(groups) if any(a == "*" for a in g[0])]


def parse_robots_py(text: str, agent: str = "*") -> list[str]:
    """Disallow prefixes applying to ``agent``: groups per the robots
    exclusion grammar, group SELECTION per RFC 9309 §2.2.1 (most
    specific matching product token wins, ties combine, '*' is the
    no-specific-match fallback — a page allowed for googlebot by its
    own group is NOT also subject to the '*' rules).  Allow lines only
    terminate the agent run (prefix semantics keep this engine
    deny-only, like most minimal crawlers)."""
    groups = _split_groups(text)
    out: list[str] = []
    for i in _select_groups(groups, agent):
        out.extend(groups[i][1])
    return out


def parse_crawl_delay_py(text: str, agent: str = "*") -> float | None:
    """Crawl-delay seconds applying to ``agent``: the same RFC 9309
    §2.2.1 group selection as ``parse_robots_py`` (most specific token,
    ties combine, '*' fallback), then the strictest — the MAX — delay
    across the SELECTED groups (de-facto extension honored by most
    crawlers).  Invalid / negative values are ignored."""
    groups = _split_groups(text)
    delays = [
        groups[i][2] for i in _select_groups(groups, agent)
        if groups[i][2] is not None
    ]
    return max(delays) if delays else None


@pandas_udf(ArrayType(StringType()))
def parse_robots(text: pd.Series) -> pd.Series:
    """robots.txt body → array of '*'-group Disallow prefixes."""
    return text.map(parse_robots_py)


@pandas_udf(DoubleType())
def parse_crawl_delay(text: pd.Series) -> pd.Series:
    """robots.txt body → '*'-group Crawl-delay seconds (null if none)."""
    return text.map(parse_crawl_delay_py)


def robots_table_from_fetch(fetched: DataFrame, body_col: str = "html") -> DataFrame:
    """(host, <body>) rows of fetched /robots.txt files → the ``robots``
    full-state table shape (host, disallow array<string>,
    crawl_delay_s double nullable)."""
    body = F.col(body_col)
    body = F.when(body.isNotNull(), body.cast("string")).otherwise(F.lit(""))
    return fetched.select(
        "host",
        parse_robots(body).alias("disallow"),
        parse_crawl_delay(body).alias("crawl_delay_s"),
    ).where((F.size("disallow") > 0) | F.col("crawl_delay_s").isNotNull())


def empty_robots(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "host string, disallow array<string>, crawl_delay_s double"
    )


def robots_seed_urls(
    new_urls: DataFrame, robots_state: DataFrame | None,
    seen: DataFrame | None, round_ts,
) -> DataFrame:
    """Proactive robots scheduling: for each host appearing in this
    round's discoveries that has no robots state yet, emit its
    ``http://<host>/robots.txt`` as a depth-0 (top-priority) frontier
    row.  Live-seen hosts are skipped, so a host whose robots fetch
    found nothing (404) is tried exactly once — its hash lands in the
    seen set with the rest of the round's schedule."""
    from ..functions.fnv import fnv1_64

    hosts = new_urls.select("host").distinct()
    if robots_state is not None:
        hosts = hosts.join(
            F.broadcast(robots_state.select("host")), "host", "left_anti"
        )
    url = F.concat(F.lit("http://"), F.col("host"), F.lit("/robots.txt"))
    rows = hosts.select(
        url.alias("url"),
        fnv1_64(url).alias("url_hash"),
        "host",
        F.lit(0).alias("depth"),
    )
    if seen is not None:
        live = seen.where(
            F.col("expires_ts").isNull() | (F.col("expires_ts") > round_ts)
        ).select("url_hash")
        rows = rows.join(live, "url_hash", "left_anti")
    return rows.select("url", "url_hash", "host", "depth")


def budgets_from_robots(robots: DataFrame, config) -> DataFrame | None:
    """(host, budget) derived from Crawl-delay: a host advertising a
    delay of d seconds gets at most floor(round_period_s / d) fetches
    per round (≥ 1) — the batch-round translation of the per-request
    delay.  Returns None when the table has no crawl_delay_s column
    (pre-delay state dirs) or no delayed hosts."""
    if "crawl_delay_s" not in robots.columns:
        return None
    budgets = robots.where(
        F.col("crawl_delay_s").isNotNull() & (F.col("crawl_delay_s") > 0)
    ).select(
        "host",
        F.greatest(
            F.lit(1),
            F.floor(F.lit(float(config.round_period_s)) / F.col("crawl_delay_s")),
        ).cast("int").alias("budget"),
    )
    return budgets


def expand_robots(robots: DataFrame) -> DataFrame:
    """(host, disallow array) → (host, prefix) rows."""
    return robots.select(
        "host", F.explode("disallow").alias("prefix")
    ).where(F.col("prefix") != "")


def apply_robots(
    candidates: DataFrame, robots: DataFrame,
    host_col: str = "host", path_col: str = "path",
) -> DataFrame:
    """Drop candidates whose (host, path) hits a disallow prefix."""
    r = expand_robots(robots).select(
        F.col("host").alias("_r_host"), F.col("prefix").alias("_r_prefix")
    )
    cond = (F.col(host_col) == F.col("_r_host")) & F.col(path_col).startswith(
        F.col("_r_prefix")
    )
    return candidates.join(F.broadcast(r), cond, "left_anti")


def parse_sitemaps_py(text: str) -> list[str]:
    """``Sitemap:`` directive URLs, in order of appearance.  Per the
    sitemaps protocol these are GLOBAL lines — independent of any
    user-agent group — so no agent parameter; '#' comments strip first
    (a commented-out Sitemap line must not parse), and the value splits
    on the FIRST ':' only (the URL itself contains one)."""
    out: list[str] = []
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def sitemap_urls_col():
    """Arrow-batched column form of ``parse_sitemaps_py`` (lazy: no
    SparkSession needed at import)."""

    @pandas_udf(ArrayType(StringType()))
    def _sm(bodies: pd.Series) -> pd.Series:
        return pd.Series(
            [parse_sitemaps_py(b if isinstance(b, str) else
                               (bytes(b).decode("utf-8", "replace") if b is not None else ""))
             for b in bodies]
        )

    return _sm


def parse_rules_py(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """(rule_path, is_allow) pairs applying to ``agent`` — BOTH Allow
    and Disallow lines, for RFC 9309 longest-match precedence (the
    deny-only ``parse_robots_py`` remains the minimal-crawler default).
    Empty values are no-rules; plain path prefixes only (the wildcard
    extension is out of scope and documented so)."""
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    in_body = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_body:
                groups.append((agents, rules))
                agents, rules, in_body = [], [], False
            agents.append(val)
        elif key in ("disallow", "allow"):
            in_body = True
            if val:
                rules.append((val, key == "allow"))
    if agents or rules:
        groups.append((agents, rules))
    agent = agent.lower()
    out: list[tuple[str, bool]] = []
    for grp_agents, grp_rules in groups:
        if any(a == "*" or a.lower() == agent for a in grp_agents):
            out.extend(grp_rules)
    return out


def rfc9309_allowed(
    cands: DataFrame, rules: DataFrame, url_col: str = "url",
    host_col: str = "host", path_col: str = "path",
) -> DataFrame:
    """RFC 9309 precedence over plain-prefix rules: among the rules of
    the candidate's host whose path is a prefix of the candidate's
    path, the LONGEST wins; a length tie goes to Allow; no matching
    rule means allowed.  ``rules``: (host, rule, is_allow) — per-host
    tiny, always the broadcast side.  Output: cands + ``allowed``.

    Plan: one broadcast theta join (host equality + startswith) and a
    max(struct(rule_len, is_allow)) aggregation on the candidate key —
    the struct comparison IS the precedence rule (longer beats
    shorter; on equal length TRUE > FALSE, i.e. Allow wins)."""
    r = F.broadcast(
        rules.select(
            F.col("host").alias("_rh"),
            F.col("rule").alias("_rule"),
            F.col("is_allow").alias("_ra"),
        )
    )
    j = cands.join(
        r,
        (F.col(host_col) == F.col("_rh"))
        & F.col(path_col).startswith(F.col("_rule")),
        "left",
    )
    verdict = j.groupBy(url_col).agg(
        F.max(
            F.when(
                F.col("_rule").isNotNull(),
                F.struct(F.length("_rule").alias("l"), F.col("_ra").alias("a")),
            )
        ).alias("_m")
    )
    return cands.join(verdict, url_col).select(
        *cands.columns,
        (F.col("_m").isNull() | F.col("_m.a")).alias("allowed"),
    )


# --------------------------------------------------------------------------
# RFC 9309 wildcard rules (* matches any run, $ anchors end-of-path)
# --------------------------------------------------------------------------

_RE_META = ".\\+?[](){}^|"


def wildcard_rule_regex_py(rule: str) -> str:
    """robots rule → anchored regex implementing RFC 9309 §2.2.2
    special characters: ``*`` matches any character run, a TRAILING
    ``$`` anchors at end-of-path (mid-rule ``$`` is literal).  All
    other characters are matched literally (regex-escaped).  The
    output uses only constructs Java regex and RE2 interpret
    identically (literal escapes, ``.*``, ``^``/``$`` anchors), so the
    engine (Spark rlike) and the oracle (DuckDB regexp_matches) can
    never diverge.  Rules are per-host tiny — this runs driver-side at
    table build, never per page."""
    anchored_end = rule.endswith("$")
    body = rule[:-1] if anchored_end else rule
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _RE_META or ch == "$":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored_end else "")


def rfc9309_allowed_wild(
    cands: DataFrame, rules: DataFrame, url_col: str = "url",
    host_col: str = "host", path_col: str = "path",
) -> DataFrame:
    """``rfc9309_allowed`` with full special-character support:
    ``rules`` carries (host, rule, rule_regex, is_allow) where
    ``rule_regex`` comes from ``wildcard_rule_regex_py``.  Precedence
    is unchanged — longest RAW rule wins (octet length, ``*``/``$``
    counted, per the spec's most-specific-by-length), ties go to
    Allow, no match means allowed.  Same plan shape as the prefix
    variant: one broadcast theta join (host equality + regex match)
    and one max(struct) aggregation; the per-row regex evaluates
    against the tiny broadcast side's pattern column, never a corpus
    blowup."""
    r = F.broadcast(
        rules.select(
            F.col("host").alias("_rh"),
            F.col("rule").alias("_rule"),
            F.col("rule_regex").alias("_rx"),
            F.col("is_allow").alias("_ra"),
        )
    )
    j = cands.join(
        r,
        (F.col(host_col) == F.col("_rh"))
        & F.expr(f"{path_col} rlike _rx"),
        "left",
    )
    verdict = j.groupBy(url_col).agg(
        F.max(
            F.when(
                F.col("_rule").isNotNull(),
                F.struct(F.length("_rule").alias("l"), F.col("_ra").alias("a")),
            )
        ).alias("_m")
    )
    return cands.join(verdict, url_col).select(
        *cands.columns,
        (F.col("_m").isNull() | F.col("_m.a")).alias("allowed"),
    )


def robots_availability(
    fetches: DataFrame,
    now,
    cache_max_age_h: int = 24,
    unreachable_grace_d: int = 30,
) -> DataFrame:
    """RFC 9309 §2.3.1 availability semantics + §2.4 cache staleness:
    map each host's last robots.txt FETCH OUTCOME to the effective
    crawl policy.  The rule-parsing suite (``parse_robots`` /
    ``rfc9309_allowed``) assumes a 2xx body; this operator decides
    what to do for every other outcome — the part of the spec a real
    fetcher hits constantly:

    * 2xx → ``rules`` (apply the parsed rule set);
    * 4xx ("unavailable", §2.3.1.3) → ``allow_all`` — the file does
      not exist, crawlers MAY access any resources;
    * 3xx terminal status ("redirects", §2.3.1.2) — the fetcher gave
      up past the ≥5-hop requirement without reaching a body →
      treated as unavailable → ``allow_all``;
    * 5xx or network error (status NULL; "unreachable", §2.3.1.4) →
      ``disallow_all`` (MUST assume complete disallow), unless the
      failure streak exceeds ``unreachable_grace_d`` days, after which
      a crawler MAY fall back: ``cached_rules`` when a previously
      fetched copy exists (``ok_ts`` non-NULL), else ``allow_all``;
    * ``refetch_due`` (§2.4): cached copies SHOULD NOT be used beyond
      ``cache_max_age_h`` hours, so any attempt older than that is
      due — and unreachable hosts inside the grace window retry every
      round (their disallow-all verdict is the costly one to hold).

    ``fetches`` carries one row per host: (host, status:int — NULL
    means the network attempt itself failed, attempt_ts — last
    attempt, ok_ts — last 2xx success or NULL, fail_since_ts — start
    of the current consecutive-failure streak, NULL when the last
    attempt succeeded).  ``now`` is an explicit timestamp (tests and
    oracles pass a literal; the driver passes the round's clock) —
    never a wall-clock read, so verdicts are replayable.

    Scale/plan: pure whole-stage-codegen CASE arithmetic on integer
    epoch seconds — no joins, no shuffles, no UDFs; one row per host
    (bounded by host count, not URL count).
    """
    now_s = F.unix_timestamp(F.lit(now).cast("timestamp"))
    age_s = now_s - F.unix_timestamp(F.col("attempt_ts"))
    fail_s = now_s - F.unix_timestamp(F.col("fail_since_ts"))
    unreachable = F.col("status").isNull() | F.col("status").between(500, 599)
    policy = (
        F.when(F.col("status").between(200, 299), F.lit("rules"))
        .when(F.col("status").between(400, 499), F.lit("allow_all"))
        .when(F.col("status").between(300, 399), F.lit("allow_all"))
        .when(
            unreachable & (fail_s > F.lit(unreachable_grace_d * 86400)),
            F.when(F.col("ok_ts").isNotNull(), F.lit("cached_rules")).otherwise(
                F.lit("allow_all")
            ),
        )
        .otherwise(F.lit("disallow_all"))
    )
    return fetches.select(
        "host",
        policy.alias("policy"),
        (
            (policy == F.lit("disallow_all"))
            | (age_s >= F.lit(cache_max_age_h * 3600))
        ).alias("refetch_due"),
    )
