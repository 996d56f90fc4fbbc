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
