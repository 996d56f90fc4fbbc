"""Byte-golden resource text + sink path tests (local_test.go:20-36,83,126-140)."""

import datetime

from pyspark.sql import functions as F

from bathyscaphe_spark.functions.textfmt import (
    lowercase_header_keys,
    resource_text,
    with_sink_path,
)

GOLDEN_TS = datetime.datetime(2020, 10, 29, 12, 4, 9)  # 1603973049 UTC


def test_resource_text_golden(spark):
    # local_test.go:126-140: url + sorted headers + body, byte-identical
    df = spark.createDataFrame(
        [
            (
                "https://google.com",
                {"Server": "Traefik", "Content-Type": "text/html"},
                "Hello, world",
            )
        ],
        "url string, headers map<string,string>, body string",
    )
    out = df.select(
        resource_text(F.col("url"), F.col("headers"), F.col("body")).alias("text")
    ).head()[0]
    assert out == (
        "https://google.com\n\nContent-Type: text/html\nServer: Traefik\n\nHello, world"
    )


def test_sink_path_goldens(spark):
    rows = [
        ("https://google.com", "https/google.com/1603973049"),
        (
            "http://facebook.com/admin/login.php?username=admin",
            "http/facebook.com/16609974401560122507/1603973049",
        ),
        (
            "http://thisisalonghostname.onion/admin/tools/list-accounts.php?token=123223453&username=test",
            "http/thisisalonghostname.onion/7883137132857825203/1603973049",
        ),
        # non-default port: the host segment is Go's u.Host — port KEPT
        # (local.go writes u.Host, not Hostname(); ADVICE r1)
        ("http://x.onion:8080", "http/x.onion:8080/1603973049"),
    ]
    df = spark.createDataFrame(
        [(u, GOLDEN_TS) for u, _ in rows], "url string, time timestamp"
    )
    got = {
        r["url"]: r["sink_path"]
        for r in with_sink_path(df).select("url", "sink_path").collect()
    }
    for url, want in rows:
        assert got[url] == want, url


def test_lowercase_headers(spark):
    df = spark.createDataFrame(
        [({"Content-Type": "application/json", "X-FOO": "Bar"},)],
        "headers map<string,string>",
    )
    out = df.select(lowercase_header_keys(F.col("headers")).alias("h")).head()[0]
    assert out == {"content-type": "application/json", "x-foo": "Bar"}


class TestSniffDecode:
    """WHATWG charset precedence: BOM > header > meta > cp1252."""

    def _run(self, spark, rows):
        from bathyscaphe_spark.functions.textfmt import sniff_decode

        df = spark.createDataFrame(rows, "id long, b binary, ct string")
        out = sniff_decode(df, "b", "ct")
        return {r["id"]: (r["text"], r["charset"]) for r in out.collect()}

    def test_precedence_matrix(self, spark):
        got = self._run(spark, [
            # BOM wins over a lying header, and is stripped
            (1, b"\xef\xbb\xbfcaf\xc3\xa9", "text/html; charset=ISO-8859-1"),
            # header drives latin-1 bytes
            (2, b"caf\xe9", "text/html; charset=ISO-8859-1"),
            # meta charset inside the prefix
            (3, '<meta charset="utf-8">café'.encode(), "text/html"),
            # unknown label → cp1252 default
            (4, b"caf\xe9", "text/html; charset=klingon-9"),
            # bare default
            (5, b"plain", None),
        ])
        assert got[1] == ("café", "utf-8")
        assert got[2] == ("café", "iso8859-1")
        assert got[3] == ('<meta charset="utf-8">café', "utf-8")
        assert got[4] == ("café", "cp1252")  # 0xE9 = é in cp1252 too
        assert got[5] == ("plain", "cp1252")

    def test_undecodable_replaces_not_raises(self, spark):
        got = self._run(spark, [(1, b"ok \xff\xfe then", "charset=utf-8")])
        assert "�" in got[1][0] and got[1][0].startswith("ok ")


def test_sniff_decode_utf16_boms(spark):
    from bathyscaphe_spark.functions.textfmt import sniff_decode

    rows = [(1, "café16".encode("utf-16-le"), None),
            (2, "café16".encode("utf-16-be"), None)]
    # prepend BOMs
    rows = [(1, b"\xff\xfe" + rows[0][1], None),
            (2, b"\xfe\xff" + rows[1][1], None)]
    df = spark.createDataFrame(rows, "id long, b binary, ct string")
    got = {r["id"]: (r["text"], r["charset"])
           for r in sniff_decode(df, "b", "ct").collect()}
    assert got[1] == ("café16", "utf-16-le")
    assert got[2] == ("café16", "utf-16-be")


class TestSniffMime:
    CASES = [
        (bytes.fromhex("89504E470D0A1A0A") + b"x", "image/png"),
        (b"GIF87a..", "image/gif"),
        (b"GIF89a..", "image/gif"),
        (b"\xff\xd8\xff\xe0jfif", "image/jpeg"),
        (b"%PDF-1.7", "application/pdf"),
        (b"%!PS-Adobe-3.0", "application/postscript"),
        (b"OggSxxxx", "application/ogg"),
        (b"ID3\x04tag", "audio/mpeg"),
        (b"PK\x03\x04zip", "application/zip"),
        (b"\x1f\x8b\x08gz", "application/gzip"),
        (b"RIFF1234WAVEfmt ", "audio/wave"),
        (b"RIFF1234WEBPVP8 ", "image/webp"),
        # whitespace-skipped, case-folded tag scan
        (b"  \t\r\n<HTML><body>", "text/html"),
        (b"<!DOCTYPE HTML>", "text/html"),
        (b"<!-- comment -->", "text/html"),
        (b"<?xml version='1.0'?>", "text/xml"),
        # binary-byte classification
        (b"nothing but words\nand lines", "text/plain"),
        (b"", "text/plain"),
        (b"pre\x00post", "application/octet-stream"),
        (b"esc\x1b ok?", "text/plain"),  # 0x1B is NOT a binary byte
        (b"ctl\x1c bad", "application/octet-stream"),
        # RIFF with an unknown format tag falls through to byte scan
        (b"RIFF1234JUNKdata", "text/plain"),
    ]

    def test_goldens(self, spark):
        from bathyscaphe_spark.functions.textfmt import sniff_mime

        df = spark.createDataFrame(
            [(i, b) for i, (b, _) in enumerate(self.CASES)],
            "i long, b binary",
        )
        got = {r["i"]: r["m"] for r in
               df.select("i", sniff_mime(F.col("b")).alias("m")).collect()}
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == want, (i, self.CASES[i], got[i])

    def test_null_and_essence(self, spark):
        from bathyscaphe_spark.functions.textfmt import (
            declared_essence,
            sniff_mime,
        )

        df = spark.createDataFrame(
            [(None, " Text/HTML ; charset=utf-8")], "b binary, ct string"
        )
        r = df.select(
            sniff_mime(F.col("b")).alias("m"),
            declared_essence(F.col("ct")).alias("e"),
        ).collect()[0]
        assert r["m"] is None
        assert r["e"] == "text/html"

    def test_codegen_no_python(self, spark):
        from bathyscaphe_spark.functions.textfmt import sniff_mime

        df = spark.createDataFrame([(b"x",)], "b binary")
        plan = df.select(sniff_mime(F.col("b")))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "EvalPython" not in plan
