"""WARC source tests: round-trip, gzip members, truncation, pipeline feed."""

import gzip
import io

from bathyscaphe_spark.sources.warc import (
    build_warc_bytes,
    iter_warc_records,
    read_warc,
    warc_pages,
)

RECORDS = [
    (
        "http://example.onion/",
        "2024-05-01T12:00:00Z",
        200,
        {"Content-Type": "text/html", "X-Tor": "yes"},
        b"<html><title>home</title><a href='http://a.onion/x.php'>x</a></html>",
    ),
    (
        "http://example.onion/404",
        "2024-05-01T12:00:01Z",
        404,
        {"Content-Type": "text/html"},
        b"gone",
    ),
    (
        "http://other.onion/page",
        "2024-05-01T12:00:02Z",
        200,
        {"Content-Type": "text/plain"},
        b"plain body \xe2\x82\xac bytes",
    ),
]


def _request_record() -> bytes:
    payload = b"GET / HTTP/1.1\r\nHost: example.onion\r\n\r\n"
    return (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://example.onion/\r\n"
        b"WARC-Date: 2024-05-01T12:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=request\r\n"
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload + b"\r\n\r\n"
    )


def test_iter_records_roundtrip_plain():
    raw = _request_record() + build_warc_bytes(RECORDS, compress=False)
    recs = list(iter_warc_records(io.BytesIO(raw)))
    assert [r["record_type"] for r in recs] == ["request"] + ["response"] * 3
    resp = recs[1]
    assert resp["url"] == "http://example.onion/"
    assert resp["status"] == 200
    assert resp["headers"] == {"content-type": "text/html", "x-tor": "yes"}
    assert resp["html"] == RECORDS[0][4]
    assert resp["warc_ts"].isoformat() == "2024-05-01T12:00:00+00:00"
    assert recs[3]["html"] == RECORDS[2][4]  # bytes survive exactly


def test_iter_records_truncated_tail():
    raw = build_warc_bytes(RECORDS[:1], compress=False)
    cut = raw + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    recs = list(iter_warc_records(io.BytesIO(cut)))
    assert len(recs) == 1  # partial trailing record dropped, no raise


def test_read_warc_gzip_members(spark, tmp_path):
    gz = tmp_path / "crawl-00000.warc.gz"
    gz.write_bytes(build_warc_bytes(RECORDS, compress=True))
    # sanity: the fixture really is multi-member gzip (CC layout)
    assert gz.read_bytes().count(b"\x1f\x8b\x08") >= 3
    got = {r["url"]: r for r in read_warc(spark, str(gz)).collect()}
    assert set(got) == {u for u, *_ in RECORDS}
    assert got["http://example.onion/404"]["status"] == 404
    assert bytes(got["http://other.onion/page"]["html"]) == RECORDS[2][4]
    assert got["http://example.onion/"]["headers"]["x-tor"] == "yes"


def test_warc_pages_feeds_extraction(spark, tmp_path):
    """WARC → pages shape → the scheduler's candidate extraction."""
    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.operators.scheduler import extract_filtered_candidates

    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(build_warc_bytes(RECORDS[:2]))
    (d / "b.warc").write_bytes(build_warc_bytes(RECORDS[2:], compress=False))
    pages = warc_pages(spark, str(d) + "/*.warc*")
    rows = pages.collect()
    assert {r["url"] for r in rows} == {
        "http://example.onion/", "http://other.onion/page"
    }  # 404 filtered
    cand = extract_filtered_candidates(
        pages.withColumn("html", pages["html"].cast("string")),
        CrawlConfig(), forbidden=(),
    ).collect()
    assert {c["url"] for c in cand} == {"http://a.onion/x.php"}


def test_write_warc_roundtrip(spark, tmp_path):
    """Export → re-ingest is lossless for (url, ts, status, headers, body)."""
    from bathyscaphe_spark.sources.warc import write_warc

    gz = tmp_path / "in.warc.gz"
    gz.write_bytes(build_warc_bytes(RECORDS, compress=True))
    df = read_warc(spark, str(gz)).repartition(2)
    out_dir = tmp_path / "export"
    n = write_warc(df, str(out_dir))
    assert n == 3
    back = read_warc(spark, str(out_dir) + "/part-*.warc.gz")
    got = {
        (r["url"], r["status"], r["warc_ts"].isoformat(),
         tuple(sorted(r["headers"].items())), bytes(r["html"]))
        for r in back.collect()
    }
    # Spark collects session-UTC timestamps as naive datetimes
    want = {
        (u, s, ts[:-1],
         tuple(sorted((k.lower(), v) for k, v in h.items())), b)
        for u, ts, s, h, b in RECORDS
    }
    assert got == want


def test_extract_text_py():
    from bathyscaphe_spark.functions.html import extract_text_py

    html = (b"<html><head><title>T</title><style>p{color:red}</style>"
            b"<script>var x=1;</script></head>"
            b"<body><p>Hello   <b>world</b></p>\n<div>again &amp; again"
            b"</div><noscript>js off</noscript></body></html>")
    assert extract_text_py(html) == "T Hello world again & again"
    assert extract_text_py(None) == ""
    assert extract_text_py(b"no tags at all") == "no tags at all"


def test_warc_pages_enriched_shape(spark, tmp_path):
    """enrich=True lands the full input-hint shape (url, warc_ts, html,
    text, lang)."""
    body = (b"<html><title>The page</title><script>skip()</script>"
            b"<p>the cat and the dog and the bird</p></html>")
    gz = tmp_path / "e.warc.gz"
    gz.write_bytes(build_warc_bytes(
        [("http://e.onion/", "2024-05-01T12:00:00Z", 200,
          {"Content-Type": "text/html"}, body)]))
    rows = warc_pages(spark, str(gz), enrich=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert set(rows[0].asDict()) >= {"url", "warc_ts", "html", "text", "lang"}
    assert r["text"] == "The page the cat and the dog and the bird"
    assert r["lang"] == "en"


def test_crawl_over_warc_universe(spark, tmp_path):
    """The full loop: WARC archive → crawlable universe → crawl rounds
    (fetch join, extraction, dedup, state commits) — resources and a
    next frontier come out."""
    from bathyscaphe_spark.config import CrawlConfig
    from bathyscaphe_spark.pipeline.driver import crawl
    from bathyscaphe_spark.sources.warc import warc_universe

    hosts = [f"h{i}.onion" for i in range(4)]
    recs = []
    for i, h in enumerate(hosts):
        nxt = hosts[(i + 1) % len(hosts)]
        body = (f"<html><a href='http://{nxt}/'>n</a> "
                f"and http://{nxt}/deep{i}.html</html>").encode()
        recs.append((f"http://{h}/", f"2024-05-01T12:00:0{i}Z", 200,
                     {"Content-Type": "text/html"}, body))
    gz = tmp_path / "u.warc.gz"
    gz.write_bytes(build_warc_bytes(recs))

    uni = warc_universe(spark, str(gz))
    # seeds are published in engine-canonical (X2) form, like the
    # reference operator's hand-normalized seed event
    seeds = spark.createDataFrame(
        [(f"http://{hosts[0]}", hosts[0])], "url string, host string"
    )
    stats = crawl(spark, uni, seeds, str(tmp_path / "state"),
                  CrawlConfig(), max_rounds=3)
    assert stats[0].fetched == 1
    assert sum(s.discovered for s in stats) >= len(hosts)
    assert sum(s.fetched for s in stats) >= 3  # crawl walks the ring


def test_warc_roundtrip_property():
    """Property: build_warc_bytes → iter_warc_records is lossless for
    any printable-ASCII url/headers and ARBITRARY body bytes, compressed
    or not, for any record count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ascii_token = st.text(
        st.characters(min_codepoint=0x21, max_codepoint=0x7E), min_size=1, max_size=30
    )
    header_val = st.text(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=40
    ).map(str.strip)
    record = st.tuples(
        ascii_token.map(lambda s: "http://" + s),
        st.integers(0, 2**31 - 1).map(
            lambda t: __import__("datetime").datetime.fromtimestamp(
                t, __import__("datetime").timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
        ),
        st.sampled_from([200, 204, 301, 404, 500]),
        st.dictionaries(ascii_token.filter(lambda k: ":" not in k), header_val,
                        max_size=4),
        st.binary(max_size=300),
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(record, max_size=5), st.booleans())
    def _check(records, compress):
        raw = build_warc_bytes(records, compress=compress)
        if compress:
            stream = io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(raw)))
        else:
            stream = io.BytesIO(raw)
        got = list(iter_warc_records(stream))
        assert len(got) == len(records)
        for rec, (url, iso, status, headers, body) in zip(got, records):
            assert rec["url"] == url
            assert rec["status"] == status
            assert rec["html"] == body
            assert rec["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == iso
            want_h = {k.lower(): v for k, v in headers.items()}
            # later duplicate keys (case-insensitive) overwrite, like dict
            assert rec["headers"] == want_h

    _check()


# --- latest capture per SURT -------------------------------------------------

from datetime import datetime

from bathyscaphe_spark.sources.warc import latest_captures


def _captures(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, status int"
    )


def test_latest_capture_picks_newest(spark):
    t = lambda s: datetime(2024, 5, 1, 0, 0, s)
    rows = [
        ("https://a.onion/x", t(1), 200),
        ("https://a.onion/x", t(9), 404),
        ("https://a.onion/x", t(5), 200),
        ("https://b.onion/y", t(2), 200),
    ]
    out = {r.surt: r for r in latest_captures(_captures(spark, rows)).collect()}
    assert len(out) == 2
    a = out["onion,a)/x"]
    assert (a.warc_ts, a.status, a.n_captures) == (t(9), 404, 3)
    assert out["onion,b)/y"].n_captures == 1


def test_latest_capture_timestamp_tie_breaks_by_url(spark):
    # http vs https collapse to the same SURT but differ as strings:
    # the (warc_ts DESC, url ASC) order must pick the http variant
    t = datetime(2024, 5, 1)
    rows = [
        ("https://a.onion/x", t, 200),
        ("http://a.onion/x", t, 404),
    ]
    out = latest_captures(_captures(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].url == "http://a.onion/x"
    assert out[0].n_captures == 2


def test_latest_capture_partitioning_invariant(spark):
    t = lambda s: datetime(2024, 5, 1, 0, 0, s % 60, s)
    rows = [
        (f"https://h{i % 7}.onion/p{i % 23}", t(i * 13 % 59), 200 + (i % 2))
        for i in range(200)
    ]
    df = _captures(spark, rows)
    a = sorted(map(tuple, latest_captures(df).collect()))
    b = sorted(map(tuple, latest_captures(df.repartition(17)).collect()))
    assert a == b


class TestWet:
    def test_wet_roundtrip_bytes_identical(self, spark, tmp_path):
        import datetime as dt

        from bathyscaphe_spark.sources.warc import read_warc, write_wet

        rows = [
            ("http://a.onion/1", dt.datetime(2020, 3, 1), "plain ascii"),
            ("http://a.onion/2", dt.datetime(2020, 3, 2), "café ≠ cafe "),
            ("http://b.onion/3", None, "no timestamp"),
            ("http://b.onion/4", dt.datetime(2020, 3, 4), None),  # skipped
            (None, dt.datetime(2020, 3, 5), "no url"),             # skipped
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        )
        out = str(tmp_path / "wet")
        n = write_wet(df.repartition(2), out)
        assert n == 3
        back = read_warc(spark, out + "/*.warc.wet.gz", responses_only=False)
        got = {
            r["url"]: (r["record_type"], bytes(r["html"]).decode("utf-8"))
            for r in back.collect()
        }
        assert got == {
            "http://a.onion/1": ("conversion", "plain ascii"),
            "http://a.onion/2": ("conversion", "café ≠ cafe "),
            "http://b.onion/3": ("conversion", "no timestamp"),
        }

    def test_wet_records_framing_matches_writer(self, spark, tmp_path):
        """The codegen framing (wet_records) and the byte writer
        (write_wet) must agree: header+payload of the written file ==
        wet_record string, octet lengths included."""
        import datetime as dt
        import gzip as _gz

        from bathyscaphe_spark.sources.warc import wet_records, write_wet

        rows = [("http://h.onion/x", dt.datetime(2020, 3, 1), "héllo wörld")]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        )
        rec = wet_records(df).collect()[0]
        assert rec["content_length"] == len("héllo wörld".encode())
        out = str(tmp_path / "wet2")
        write_wet(df.coalesce(1), out)
        import glob

        raw = _gz.decompress(
            open(glob.glob(out + "/*.warc.wet.gz")[0], "rb").read()
        )
        assert raw == rec["wet_record"].encode("utf-8") + b"\r\n\r\n"

    def test_wet_reader_skips_conversion_when_responses_only(
        self, spark, tmp_path
    ):
        import datetime as dt

        from bathyscaphe_spark.sources.warc import read_warc, write_wet

        df = spark.createDataFrame(
            [("http://h.onion/x", dt.datetime(2020, 3, 1), "t")],
            "url string, warc_ts timestamp, text string",
        )
        out = str(tmp_path / "wet3")
        write_wet(df, out)
        assert read_warc(spark, out + "/*.warc.wet.gz").count() == 0


class TestWatRecords:
    def test_envelope_fields_and_framing(self, spark):
        import datetime
        import hashlib
        import json

        from bathyscaphe_spark.sources.warc import wat_records

        rows = [
            ("https://a.com/", datetime.datetime(2024, 1, 2, 3, 4, 5),
             '<html><head><title>T1</title>'
             '<meta name="description" content="D1"></head><body>'
             '<a href="https://b.com/x">b</a>'
             '<a href="/rel" class="z">r</a></body></html>'),
            ("https://nohtml.com/", datetime.datetime(2024, 1, 1), None),
            (None, datetime.datetime(2024, 1, 1), "<p>x</p>"),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html string")
        out = {r.url: r for r in wat_records(df).collect()}
        assert set(out) == {"https://a.com/"}  # null url/html dropped
        r = out["https://a.com/"]
        env = json.loads(r.payload)["Envelope"]
        assert env["WARC-Header-Metadata"] == {
            "WARC-Target-URI": "https://a.com/",
            "WARC-Date": "2024-01-02T03:04:05Z",
            "WARC-Type": "response",
        }
        hm = env["Payload-Metadata"]["HTML-Metadata"]
        assert hm["Head"]["Title"] == "T1"
        assert hm["Head"]["Metas"] == [{"name": "description", "content": "D1"}]
        assert [x["url"] for x in hm["Links"]] == ["https://b.com/x", "/rel"]
        # framing: content-length counts payload octets; id is md5(url)
        assert r.content_length == len(r.payload.encode("utf-8"))
        head, _, payload = r.wat_record.partition("\r\n\r\n")
        assert payload == r.payload
        assert "WARC-Type: metadata" in head
        assert hashlib.md5(b"https://a.com/").hexdigest() in head
        assert f"Content-Length: {r.content_length}" in head

    def test_missing_title_desc_links_empty_not_null(self, spark):
        import datetime
        import json

        from bathyscaphe_spark.sources.warc import wat_records

        df = spark.createDataFrame(
            [("https://c.com/", datetime.datetime(2024, 1, 1), "<p>bare</p>")],
            "url string, warc_ts timestamp, html string",
        )
        [r] = wat_records(df).collect()
        hm = json.loads(r.payload)["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
        assert hm["Head"]["Title"] == ""
        assert hm["Head"]["Metas"][0]["content"] == ""
        assert hm["Links"] == []


class TestZipnum:
    def test_logical_blocks_and_ragged_tail(self, spark):
        from bathyscaphe_spark.sources.warc import zipnum_index

        rows = [
            (f"{c}site,x)/p{i:02d}", f"202401{1 + i % 9:02d}000000", "{}")
            for c in "ab" for i in range(10)
        ]
        df = spark.createDataFrame(rows, "surt string, ts14 string, cdxj string")
        got = {
            (r.shard, r.block): (r.first_surt, r.n_lines)
            for r in zipnum_index(df.repartition(7), lines_per_block=4).collect()
        }
        assert got[("a", 0)] == ("asite,x)/p00", 4)
        assert got[("a", 1)] == ("asite,x)/p04", 4)
        assert got[("a", 2)] == ("asite,x)/p08", 2)  # ragged tail
        assert len(got) == 6

    def test_writer_round_trip_byte_offsets(self, spark, tmp_path):
        import gzip

        from bathyscaphe_spark.sources.warc import write_zipnum

        rows = [
            (f"{c}host,x)/page{i:03d}", f"2024010{1 + i % 9}000000",
             '{"s": %d}' % i)
            for c in "abc" for i in range(11)
        ]
        df = spark.createDataFrame(rows, "surt string, ts14 string, cdxj string")
        n = write_zipnum(df.repartition(5), str(tmp_path), lines_per_block=4)
        assert n == 33
        seen = []
        for sh in "abc":
            data = (tmp_path / f"{sh}.cdx.gz").read_bytes()
            covered = 0
            for ln in (tmp_path / f"{sh}.idx").read_text().splitlines():
                key, fn, off, length, blk = ln.split("\t")
                assert fn == f"{sh}.cdx.gz"
                member = gzip.decompress(data[int(off) : int(off) + int(length)])
                lines = member.decode().splitlines()
                assert lines[0].startswith(key)  # idx key = block's first line
                covered += int(off) + int(length) - int(off)
                seen.extend(lines)
            # members tile the shard file exactly: last offset+len = file size
            last = (tmp_path / f"{sh}.idx").read_text().splitlines()[-1].split("\t")
            assert int(last[2]) + int(last[3]) == len(data)
        # every primary line survives, globally sorted within each shard
        assert len(seen) == 33
        keys = [tuple(l.split(" ", 2)[:2]) for l in seen]
        by_shard = {}
        for k in keys:
            by_shard.setdefault(k[0][0], []).append(k)
        for sh, ks in by_shard.items():
            assert ks == sorted(ks)


class TestRevisits:
    def test_url_scoped_digest_dedup(self, spark):
        import datetime

        from bathyscaphe_spark.sources.warc import mark_revisits

        rows = [
            ("u1", datetime.datetime(2024, 1, 1), b"<p>same</p>"),
            ("u1", datetime.datetime(2024, 1, 2), b"<p>same</p>"),
            ("u1", datetime.datetime(2024, 1, 3), b"<p>changed</p>"),
            ("u1", datetime.datetime(2024, 1, 4), b"<p>same</p>"),
            ("u2", datetime.datetime(2024, 1, 1), b"<p>same</p>"),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
        got = {
            (r.url, r.warc_ts.day): (r.record_type, r.refers_to_ts and r.refers_to_ts.day)
            for r in mark_revisits(df.repartition(3)).collect()
        }
        assert got[("u1", 1)] == ("response", None)
        assert got[("u1", 2)] == ("revisit", 1)
        assert got[("u1", 3)] == ("response", None)   # new digest
        # content changed BACK: refers to the ORIGINAL, not the latest
        assert got[("u1", 4)] == ("revisit", 1)
        # cross-URL identical bodies never alias (url-scoped profile)
        assert got[("u2", 1)] == ("response", None)

    def test_saved_octets_and_partition_invariance(self, spark):
        import datetime

        from bathyscaphe_spark.sources.warc import mark_revisits

        rows = [
            (f"u{i % 5}", datetime.datetime(2024, 1, 1 + i // 5),
             f"body-{(i % 10) % 3}".encode())
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
        a = {(r.url, r.warc_ts): (r.record_type, r.refers_to_ts, r.saved_octets)
             for r in mark_revisits(df.repartition(1)).collect()}
        b = {(r.url, r.warc_ts): (r.record_type, r.refers_to_ts, r.saved_octets)
             for r in mark_revisits(df.repartition(11)).collect()}
        assert a == b
        for (_, _), (t, _, octets) in a.items():
            assert (octets > 0) == (t == "revisit")


class TestCdxQuery:
    """pywb CDX-server matchType semantics over the CDXJ index."""

    def _cdx(self, spark):
        from bathyscaphe_spark.sources.warc import cdx_index

        rows = [
            ("http://a.example.onion/img/1.png", 200),
            ("http://a.example.onion/img/2.png", 200),
            ("http://a.example.onion/page", 200),
            ("http://b.example.onion/page", 404),
            ("http://example.onion/page?b=2&a=1", 200),
            ("http://examples.onion/page", 200),  # domain near-miss
        ]
        df = spark.createDataFrame(
            [(u, s, i) for i, (u, s) in enumerate(rows)],
            "url string, status int, doc_id long",
        ).selectExpr(
            "url", "status",
            "to_timestamp(1714564800 + doc_id * 60) AS warc_ts",
            "'x' AS html",
        )
        return cdx_index(df)

    def _surts(self, df):
        return sorted(r["surt"] for r in df.collect())

    def test_exact_canonicalizes_query_params(self, spark):
        from bathyscaphe_spark.sources.warc import cdx_query

        # unsorted params in the probe url hit the sorted index key
        got = self._surts(cdx_query(
            self._cdx(spark), "http://example.onion/page?b=2&a=1", "exact"))
        assert got == ["onion,example)/page?a=1&b=2"]

    def test_prefix_scope(self, spark):
        from bathyscaphe_spark.sources.warc import cdx_query

        got = self._surts(cdx_query(
            self._cdx(spark), "http://a.example.onion/img/", "prefix"))
        assert got == [
            "onion,example,a)/img/1.png",
            "onion,example,a)/img/2.png",
        ]

    def test_host_scope_excludes_subdomains_of_others(self, spark):
        from bathyscaphe_spark.sources.warc import cdx_query

        got = self._surts(cdx_query(
            self._cdx(spark), "http://a.example.onion/", "host"))
        assert got == [
            "onion,example,a)/img/1.png",
            "onion,example,a)/img/2.png",
            "onion,example,a)/page",
        ]

    def test_domain_scope_includes_subdomains_not_lookalikes(self, spark):
        from bathyscaphe_spark.sources.warc import cdx_query

        got = self._surts(cdx_query(
            self._cdx(spark), "http://example.onion/", "domain"))
        # a./b. subdomains + apex, but NOT examples.onion
        assert got == [
            "onion,example)/page?a=1&b=2",
            "onion,example,a)/img/1.png",
            "onion,example,a)/img/2.png",
            "onion,example,a)/page",
            "onion,example,b)/page",
        ]

    def test_ts_bounds_inclusive(self, spark):
        from bathyscaphe_spark.sources.warc import cdx_query

        cdx = self._cdx(spark)
        all_ts = sorted(r["ts14"] for r in cdx.collect())
        got = cdx_query(
            cdx, "http://example.onion/", "domain",
            from_ts=all_ts[1], to_ts=all_ts[2],
        ).collect()
        assert sorted(r["ts14"] for r in got) == [all_ts[1], all_ts[2]]

    def test_unknown_scope_raises(self, spark):
        import pytest as _pytest

        from bathyscaphe_spark.sources.warc import cdx_query

        with _pytest.raises(ValueError):
            cdx_query(self._cdx(spark), "http://x.onion/", "fuzzy")


class TestTimemap:
    """RFC 7089 TimeMap relations over the CDX index."""

    def test_chain_relations(self, spark):
        from bathyscaphe_spark.sources.warc import timemap

        cdx = spark.createDataFrame(
            [("a)/", "20240101000000"), ("a)/", "20240102000000"),
             ("a)/", "20240103000000"), ("b)/", "20240105000000")],
            "surt string, ts14 string",
        )
        got = {(r["surt"], r["ts14"]): r for r in timemap(cdx).collect()}
        a1 = got[("a)/", "20240101000000")]
        a2 = got[("a)/", "20240102000000")]
        a3 = got[("a)/", "20240103000000")]
        b = got[("b)/", "20240105000000")]
        assert a1["is_first"] and not a1["is_last"] and a1["prev_ts14"] is None
        assert a1["next_ts14"] == "20240102000000"
        assert not a2["is_first"] and not a2["is_last"]
        assert a2["prev_ts14"] == "20240101000000"
        assert a2["next_ts14"] == "20240103000000"
        assert a3["is_last"] and a3["next_ts14"] is None
        assert a1["n_mementos"] == 3
        # single capture is both first and last
        assert b["is_first"] and b["is_last"] and b["n_mementos"] == 1
