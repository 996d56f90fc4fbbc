"""Indexer pipeline tests (indexer_test.go / elastic_test.go semantics)."""

import datetime

from bathyscaphe_spark.operators.indexer import build_local_sink, build_resources

BODY = (
    "<title>Creekorful Inc</title>\n\nThis is sparta\n\n"
    '<meta name="DescriptIon" content="Zhello world">\n'
    '<meta property="og:url" content="https://example.org">'
)


def _fetched(spark, url="https://example.onion/300", host="example.onion"):
    return spark.createDataFrame(
        [
            (
                url,
                host,
                bytearray(BODY, "utf-8"),
                {"Content-Type": "application/json", "Server": "Traefik"},
                datetime.datetime(2020, 10, 29, 12, 4, 9),
            )
        ],
        "url string, host string, html binary, headers map<string,string>, warc_ts timestamp",
    )


def test_resources_golden(spark):
    row = build_resources(_fetched(spark)).head()
    assert row["title"] == "Creekorful Inc"
    assert row["description"] == "Zhello world"
    assert row["meta"]["description"] == "Zhello world"  # key lowercased
    assert row["meta"]["og:url"] == "https://example.org"
    assert row["headers"] == {
        "content-type": "application/json",
        "server": "Traefik",
    }
    assert row["body"] == BODY
    assert row["time"] == datetime.datetime(2020, 10, 29, 12, 4, 9)


def test_indexer_hostname_filter(spark):
    # indexer.go:100-103
    out = build_resources(
        _fetched(spark, "https://m.fbi.onion/x", "m.fbi.onion"),
        blacklist=["fbi.onion"],
    )
    assert out.count() == 0


def test_local_sink_bytes(spark):
    row = build_local_sink(_fetched(spark)).head()
    # the local sink formats ORIGINAL header case, sorted (local.go:61-84)
    assert row["text"] == (
        "https://example.onion/300\n\n"
        "Content-Type: application/json\nServer: Traefik\n\n" + BODY
    )
    assert row["sink_path"].startswith("https/example.onion/")
    assert row["sink_path"].endswith("/1603973049")
