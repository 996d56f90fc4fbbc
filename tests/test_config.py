"""Config + duration parsing goldens (duration_test.go:8-24,
docker-compose.yml:90-93 defaults)."""

import json

from bathyscaphe_spark.config import CrawlConfig, parse_duration_s


def test_duration_goldens():
    assert parse_duration_s("") == -1
    assert parse_duration_s("50s") == 50
    assert parse_duration_s("50m") == 50 * 60
    assert parse_duration_s("50h") == 50 * 3600
    assert parse_duration_s("50d") == 50 * 86400
    assert parse_duration_s("1h30m") == 5400
    assert parse_duration_s("nonsense") == -1
    assert parse_duration_s("5x") == -1


def test_defaults_match_compose():
    cfg = CrawlConfig()
    assert cfg.allowed_extensions == ("html", "php", "aspx", "htm")
    assert cfg.allowed_content_types == ("text/",)
    assert cfg.blacklist_threshold == 5
    assert cfg.blacklist_ttl_s == 1200
    assert cfg.refresh_delay_s == 0
    assert cfg.forbidden_hostnames == ()


def test_from_json(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "allowed-mime-types": [{"content-type": "text/", "extensions": ["php"]}],
        "forbidden-hostnames": [{"hostname": "fbi.onion"}],
        "refresh-delay": {"delay": 3600},
        "blacklist-config": {"threshold": 10, "ttl": 600},
    }))
    cfg = CrawlConfig.from_json(str(p))
    assert cfg.allowed_extensions == ("php",)
    assert cfg.forbidden_hostnames == ("fbi.onion",)
    assert cfg.refresh_delay_s == 3600
    assert cfg.blacklist_threshold == 10 and cfg.blacklist_ttl_s == 600


def test_local_sink_partitioned_write(spark, tmp_path):
    import datetime

    from bathyscaphe_spark.operators.indexer import build_local_sink, write_local_sink

    fetched = spark.createDataFrame(
        [
            ("https://a.onion/x.html", "a.onion", bytearray(b"<title>t</title>"),
             {"Content-Type": "text/html"}, datetime.datetime(2020, 10, 29, 12, 4, 9)),
            ("http://b.onion", "b.onion", bytearray(b"body"),
             {"Content-Type": "text/html"}, datetime.datetime(2020, 10, 29, 12, 4, 9)),
        ],
        "url string, host string, html binary, headers map<string,string>, warc_ts timestamp",
    )
    out = str(tmp_path / "sink")
    write_local_sink(build_local_sink(fetched), out)
    back = spark.read.parquet(out)
    rows = {r["url"]: r for r in back.collect()}
    # partition columns round-trip and the hash segment is omitted for '/'
    assert rows["http://b.onion"]["scheme"] == "http"
    assert rows["http://b.onion"]["sink_path"] == "http/b.onion/1603973049"
    assert rows["https://a.onion/x.html"]["sink_path"].count("/") == 3


def test_with_updates_overlay():
    """S11: ConfigAPI-shaped overlay on a frozen base config."""
    from bathyscaphe_spark.config import CrawlConfig

    cfg = CrawlConfig()
    cfg2 = cfg.with_updates(
        {
            "refresh-delay": {"delay": "1h"},
            "allowed-mime-types": [
                {"content-type": "text/plain", "extensions": ["txt"]}
            ],
        }
    )
    assert cfg2.refresh_delay_s == 3600
    assert cfg2.allowed_extensions == ("txt",)
    assert cfg.refresh_delay_s == 0 and cfg.allowed_extensions != ("txt",)
    assert cfg.with_updates({}) is cfg


def test_runtime_config_mutation_mid_crawl(spark, tmp_path):
    """S11 end-to-end: set_config() between rounds of a RUNNING crawl
    forbids a hostname; the very next round stops fetching and stops
    discovering URLs on it — no restart, no JSON editing."""
    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.pipeline.synth import build_pages, build_seeds
    from bathyscaphe_spark.state.configstore import load_config, set_config
    from bathyscaphe_spark.state.tables import TableCatalog

    pages = build_pages(spark, 800, n_hosts=20, links_per_page=4).persist()
    seeds = build_seeds(spark, pages, 6)
    cfg = CrawlConfig(bloom_enabled=False)
    root = str(tmp_path / "s")
    crawl(spark, pages, seeds, root, cfg, max_rounds=2)
    cat = TableCatalog(spark, root)
    upcoming = cat.read_round("frontier", 2)
    target = sorted(
        r["host"] for r in upcoming.select("host").distinct().collect()
    )[0]
    set_config(cat, {"forbidden-hostnames": [target]})
    assert load_config(cat, cfg).forbidden_hostnames == (target,)

    crawl(spark, pages, None, root, cfg, max_rounds=4)
    for rn in (3, 4):
        f = cat.read_round("frontier", rn)
        if f is not None:
            assert f.where(f.host == target).count() == 0, rn
    pages.unpersist()


def test_with_updates_engine_extension_passthrough():
    """Snake-case CrawlConfig field names overlay via the same S11
    ConfigAPI path as the reference's hyphenated keys; unknown keys
    stay ignored."""
    cfg = CrawlConfig()
    cfg2 = cfg.with_updates(
        {
            "host_explosion_max": 7,
            "link_rank_enabled": True,
            "bloom_fpp": 0.001,
            "not-a-real-key": 42,
            "nor_this_one": 1,
        }
    )
    assert cfg2.host_explosion_max == 7
    assert cfg2.link_rank_enabled is True
    assert cfg2.bloom_fpp == 0.001
    assert cfg.host_explosion_max == 0  # original untouched


def test_with_updates_reference_keys_win_over_passthrough():
    # the hyphenated reference form maps first; the snake form is
    # skipped when the reference key already set the field
    cfg = CrawlConfig().with_updates(
        {"blacklist-config": {"threshold": 9}, "blacklist_threshold": 3}
    )
    assert cfg.blacklist_threshold == 9
    cfg2 = CrawlConfig().with_updates({"blacklist_threshold": 3})
    assert cfg2.blacklist_threshold == 3
