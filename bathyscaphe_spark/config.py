"""Crawl configuration — the engine's equivalent of the reference's
ConfigAPI key-value store (reference: internal/configapi/client/client.go:17-50,
defaults from deployments/docker/docker-compose.yml:90-93).

In the batch-iterative design the config is a frozen dataclass loaded at
the driver and closed over by the round's column expressions / broadcast to
executors — no pub/sub needed: changes take effect at round boundaries,
which is exactly the reproducibility the snapshot model wants.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


_DURATION_UNITS = {
    "ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
    "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0, "w": 604800.0,
}


def parse_duration_s(duration: str) -> float:
    """X11: human duration string → seconds, -1 on empty/invalid
    (reference: internal/duration/duration.go:10-21, str2duration
    semantics — goldens in duration_test.go:8-24).  Supports compound
    forms like '1h30m'."""
    if not duration:
        return -1
    import re as _re

    parts = _re.findall(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w)", duration)
    if not parts or "".join(n + u for n, u in parts) != duration:
        return -1
    return sum(float(n) * _DURATION_UNITS[u] for n, u in parts)


@dataclass(frozen=True)
class MimeType:
    content_type: str = ""
    extensions: tuple[str, ...] = ()


@dataclass(frozen=True)
class CrawlConfig:
    # allowed-mime-types (client.go:28-34; compose default docker-compose.yml:91)
    allowed_mime_types: tuple[MimeType, ...] = (
        MimeType(content_type="text/", extensions=("html", "php", "aspx", "htm")),
    )
    # forbidden-hostnames (client.go:36-39) — substring-contains semantics
    forbidden_hostnames: tuple[str, ...] = ()
    # refresh-delay seconds; 0 => seen entries never expire (cache.go:9-12)
    refresh_delay_s: int = 0
    # adaptive refresh (engine addition; operators/recrawl.py): per-URL
    # seen TTLs adapt multiplicatively to observed content change —
    # byte-stable pages double toward refresh_max_s, churning pages
    # halve toward refresh_min_s; refresh_delay_s is the starting TTL
    # (must be > 0 when enabled).  Off by default: the reference has a
    # single fixed TTL and the parity oracles replay that exactly.
    # Requires a state dir that has been adaptive from round 0 (the
    # seen schema gains a ttl_s column and a fetch_meta table appears).
    adaptive_refresh: bool = False
    refresh_min_s: int = 60
    refresh_max_s: int = 30 * 86_400
    # recrawl generator (requires adaptive_refresh): up to this many
    # previously-fetched URLs whose seen TTL has fully expired are
    # re-enqueued into each round's frontier, oldest-fetch-first —
    # the pump that makes expiry-driven refetching continuous instead
    # of waiting for link re-discovery.  0 = off.
    recrawl_budget: int = 0
    # frontier priority for pumped refetches (fresh discoveries start
    # at 1000 - depth*10; refetches deliberately rank below them)
    recrawl_priority: int = 500
    # blacklist-config (client.go:46-50; compose default threshold=5 ttl=1200)
    blacklist_threshold: int = 5
    blacklist_ttl_s: int = 1200
    # engine additions (north-star scheduler): politeness + priority
    per_host_budget: int = 20  # max fetches per host per round
    # nominal wall seconds of one round — converts a robots Crawl-delay
    # of d seconds into a per-host budget of floor(round_period_s / d)
    round_period_s: int = 60
    # proactive robots handling: newly discovered hosts get their
    # /robots.txt scheduled (top priority), fetched bodies are harvested
    # into the robots state (disallow prefixes + Crawl-delay budgets).
    # Off by default: the reference has no robots fetching, and the
    # parity oracles replay reference semantics exactly.
    fetch_robots: bool = False
    max_depth: int = 50
    # skew handling: hosts with more frontier URLs than this get salted
    # across this many sub-partitions during the fetch stage
    skew_threshold: int = 10_000
    skew_salt_buckets: int = 16
    # membership router for the seen anti-join: "bloom" (rebuilt per
    # round) or "cuckoo" (deletable — TTL expiries patch the filter);
    # bloom_enabled=False disables routing entirely (plain anti-join)
    bloom_enabled: bool = True
    seen_filter: str = "bloom"
    bloom_fpp: float = 0.01
    bloom_shards: int = 8
    # incremental seen filter: the driver folds each round's seen Δ into
    # the running bloom (O(Δ)/round) instead of rebuilding from the full
    # seen table (O(|seen|)/round).  The filter is pre-sized with
    # ``bloom_capacity_slack`` headroom; when inserts outgrow capacity it
    # is rebuilt once at double size (amortized O(1) rebuilds).  Routing
    # results are identical either way — stale bits only add exact-join
    # verification work, never drops.  Ignored for seen_filter="cuckoo"
    # (the deletable variant is rebuilt per round).
    bloom_incremental: bool = True
    bloom_capacity_slack: float = 4.0
    # persist the incremental filter's shards into the state dir at each
    # (amortized-O(1)) capacity rebuild; a resumed crawl then loads the
    # snapshot and folds only the seen Δs committed AFTER it — O(Δ since
    # last rebuild) instead of an O(|seen|) full-table rescan per
    # restart, the difference that matters at a 10^10-URL seen set
    bloom_persist: bool = True
    # bucket-compacted seen base (state/seenstore.py): every
    # ``seen_bucket_every`` rounds the driver rewrites the seen set into
    # a bucketBy(url_hash) table; the D1 exact verification then reads
    # the 10^10-row base WITHOUT a seen-side exchange and anti-joins the
    # small post-compaction Δ tail separately.  Output-identical to the
    # plain path (tests/test_seenstore.py pins both parity and the
    # one-exchange plan shape).
    seen_bucketed: bool = False
    seen_bucket_every: int = 4
    seen_buckets: int = 32
    # link-graph priority (operators/graph.py): when on, each round
    # harvests distinct (src_host → dst_host) edges from extraction into
    # the link_edges state table, and later rounds boost frontier
    # priority by the host's fixed-point PageRank (per-mille of total
    # mass).  Off by default: an engine addition — the reference's AMQP
    # queue has no importance ordering.
    link_rank_enabled: bool = False
    link_rank_iters: int = 3
    # host-reputation demotion: each round appends per-capture evidence
    # (status, content hash, soft-404 flag) to the host_repute state;
    # at rank time operators/blacklister.host_reputation folds it into
    # an integer score and the frontier priority drops by
    # ((1000 − reputation_pm) · reputation_weight) DIV 1000 — rank-time
    # only (leftovers restore their base priority, like the link boost).
    # Off by default: an engine addition beyond the reference's
    # dead-or-alive blacklister.
    reputation_enabled: bool = False
    reputation_weight: int = 1000
    # frontier priority AGING (starvation guard): under politeness /
    # global-cap budgets a low-priority deep URL can requeue forever —
    # with a boost > 0 its rank-time priority grows by
    # age_boost_per_round for every full round since discovered_ts, so
    # every deferred row eventually outranks fresh shallow ones.
    # Rank-time only (_base_priority restore), default off.
    age_boost_per_round: int = 0
    # global per-round fetch cap: after the per-host politeness rank,
    # keep only the top-K rows in the deterministic cross-host priority
    # order (TakeOrdered — no full sort materializes).  This is the
    # consumer of cross-host priority (and of the link-rank boost): a
    # 10^10-URL frontier cannot fetch everything each round, and the cut
    # rows requeue via the defer-never-drop leftover path.  None ⇒ only
    # per-host budgets apply (reference-parity behavior).
    round_fetch_budget: int | None = None
    # frontier-delta row count (known from parquet footers — no job) at
    # which the politeness leftover switches from a plain anti-join
    # (cheapest when AQE broadcasts the scheduled side) to the shared
    # window-split (cheapest when the frontier shuffle dominates);
    # outputs are identical either way (equivalence-tested)
    leftover_split_threshold: int = 500_000
    # crawler-trap guard (operators/scheduler.py trap_filter_col): drop
    # discovered candidates whose URL shape indicates an infinite crawl
    # space.  Off by default — the reference schedules trap URLs, and
    # the parity oracles replay reference semantics exactly.
    trap_guard_enabled: bool = False
    # domain host-explosion guard (operators/politeness.py
    # host_explosion_guard): at most N hosts per registered domain may
    # schedule in one round (IRLbot-style spam-farm containment); the
    # cut hosts' rows DEFER to the next frontier (defer-never-drop,
    # like the politeness budget).  0 = off (reference parity).
    host_explosion_max: int = 0

    # page-level robots directives (functions/html.py robots_meta_cols):
    # <meta name="robots"> ∪ X-Robots-Tag — nofollow pages contribute no
    # links, noindex pages never reach the resources sink.  Off by
    # default — the reference ignores page-level directives, and the
    # parity oracles replay reference semantics exactly.
    robots_meta_enabled: bool = False

    # MIME sniffing (functions/textfmt.py sniff_mime): when on, the F5
    # content-type filter audits the header against the payload's magic
    # bytes — a sniffed essence that contradicts the declared essence
    # (or a missing header) replaces it, so a lying server can't walk a
    # binary past the text/ allowlist.  Off by default — the reference
    # trusts the header outright (crawler.go:67-78) and the parity
    # oracles replay that.
    mime_sniff_enabled: bool = False

    @property
    def allowed_extensions(self) -> tuple[str, ...]:
        return tuple(
            ext for mt in self.allowed_mime_types for ext in mt.extensions
        )

    @property
    def allowed_content_types(self) -> tuple[str, ...]:
        return tuple(
            mt.content_type for mt in self.allowed_mime_types if mt.content_type
        )

    def with_updates(self, raw: dict) -> "CrawlConfig":
        """Overlay reference-ConfigAPI-shaped keys (client.go:17-50) on
        this config — the S11 runtime-mutation path: values come from
        the catalog's committed ``config`` state table and take effect
        at the next round boundary (see state/configstore.py)."""
        import dataclasses

        kwargs = _configapi_kwargs(raw)
        return dataclasses.replace(self, **kwargs) if kwargs else self

    @staticmethod
    def from_json(path: str) -> "CrawlConfig":
        with open(path) as f:
            raw = json.load(f)
        return CrawlConfig(**_configapi_kwargs(raw))


def _secs(v, default: int) -> int:
    """Accept integer seconds or a '50d'-style duration string (X11);
    invalid strings fall back to the default, matching the reference's
    -1-means-unset contract."""
    if isinstance(v, str):
        parsed = parse_duration_s(v)
        return int(parsed) if parsed >= 0 else default
    return int(v)


def _configapi_kwargs(raw: dict) -> dict:
    """ConfigAPI JSON keys → CrawlConfig kwargs (shared by from_json and
    the runtime with_updates overlay)."""
    mimes = tuple(
        MimeType(m.get("content-type", ""), tuple(m.get("extensions", ())))
        for m in raw.get("allowed-mime-types", ())
    )
    kwargs: dict = {}
    if mimes:
        kwargs["allowed_mime_types"] = mimes
    if "forbidden-hostnames" in raw:
        kwargs["forbidden_hostnames"] = tuple(
            h["hostname"] if isinstance(h, dict) else h
            for h in raw["forbidden-hostnames"]
        )
    if "refresh-delay" in raw:
        kwargs["refresh_delay_s"] = _secs(raw["refresh-delay"].get("delay", 0), 0)
    if "blacklist-config" in raw:
        bc = raw["blacklist-config"]
        kwargs["blacklist_threshold"] = int(bc.get("threshold", 5))
        kwargs["blacklist_ttl_s"] = _secs(bc.get("ttl", 1200), 1200)
    # engine-extension passthrough: any key that IS a CrawlConfig field
    # name (snake_case — disjoint from the reference's hyphenated key
    # space) overlays directly, so every flag-gated engine feature
    # (link_rank_enabled, host_explosion_max, seen_bucketed, …) is
    # runtime-mutable through the same S11 ConfigAPI path.  Unknown
    # keys stay ignored (reference tolerance contract).
    import dataclasses

    field_types = {
        f.name: f.type for f in dataclasses.fields(CrawlConfig)
    }
    for k, v in raw.items():
        if k in kwargs or k not in field_types or v is None:
            continue
        t = str(field_types[k])
        if t.startswith("bool"):
            kwargs[k] = bool(v)
        elif t.startswith("int"):
            kwargs[k] = int(v)
        elif t.startswith("float"):
            kwargs[k] = float(v)
        elif t.startswith("str"):
            kwargs[k] = str(v)
        else:  # tuples and structured fields keep the typed JSON value
            kwargs[k] = tuple(v) if isinstance(v, list) else v
    return kwargs


DEFAULT_CONFIG = CrawlConfig()
