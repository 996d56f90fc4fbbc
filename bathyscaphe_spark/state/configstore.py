"""Runtime config mutation — the ConfigAPI equivalent (S11).

The reference mutates crawl behavior mid-flight through a REST
key-value service with pub/sub fan-out (internal/configapi/
configapi.go:117-147, client/client.go:257-274): the blacklister PUTs
``forbidden-hostnames``, operators PUT ``allowed-mime-types`` /
``refresh-delay``, and every consumer reloads on the published event.

The batch-iterative engine gets the same capability at ROUND
granularity — which is exactly when the reference's changes become
observable in crawl output anyway — by storing the key-value overlay
in a ``config`` full-state catalog table:

* ``set_config(catalog, updates)``    — the PUT: merge + atomically
  publish a new config state (WAP commit like every other table),
* ``load_config(catalog, base)``      — the subscriber: overlay the
  committed state on the static base config; ``crawl()`` calls this at
  EVERY round boundary, so a mutation lands in the very next round of
  a running crawl with no restart,
* values are the reference's own ConfigAPI JSON shapes
  (``allowed-mime-types``, ``forbidden-hostnames``, ``refresh-delay``,
  ``blacklist-config`` — config.py _configapi_kwargs).

Scale: the config table is a handful of rows, rewritten whole per
mutation and broadcast-read once per round — negligible at any scale.
"""

from __future__ import annotations

import json

from ..config import CrawlConfig
from .tables import TableCatalog

CONFIG_SCHEMA = "key string, value string"


def get_config_raw(catalog: TableCatalog) -> dict[str, str]:
    """The committed overlay as {configapi-key: json-encoded value}."""
    df = catalog.read_state("config")
    if df is None:
        return {}
    return {r["key"]: r["value"] for r in df.collect()}


def set_config(catalog: TableCatalog, updates: dict[str, object]) -> int:
    """PUT: merge ``updates`` (values in ConfigAPI JSON shape) into the
    committed overlay and publish atomically.  Returns the round the
    state was committed under; a running crawl picks it up at its next
    round boundary."""
    merged = get_config_raw(catalog)
    merged.update({k: json.dumps(v) for k, v in updates.items()})
    # always a FRESH round number: re-staging the config table under an
    # already-committed round would rmtree a committed dir (stage_round
    # now refuses that), opening a crash window where the manifest
    # points at a missing dir.  read_state picks the latest committed
    # config round, so monotone round numbers are all that matters;
    # expire_rounds reclaims the superseded rewrites.
    round_n = catalog.last_committed_round() + 1
    df = catalog.spark.createDataFrame(
        sorted(merged.items()), CONFIG_SCHEMA
    )
    catalog.stage_round("config", df, round_n)
    catalog.commit_round(round_n, ["config"])
    return round_n


def load_config(catalog: TableCatalog, base: CrawlConfig) -> CrawlConfig:
    """Overlay the committed config state on ``base`` (identity when no
    mutation has ever been published)."""
    raw = {k: json.loads(v) for k, v in get_config_raw(catalog).items()}
    return base.with_updates(raw) if raw else base
