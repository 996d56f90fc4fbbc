"""fetch_net — the opt-in real-network S4 seam (reference
internal/http/client.go:31-62), tested without external network: the
pool/schema/timeout semantics with an injected fake transport, and the
real SOCKS5+HTTP transport against an in-process loopback proxy."""

import socket
import threading

import pytest
from pyspark.sql import functions as F

from bathyscaphe_spark.config import CrawlConfig, MimeType
from bathyscaphe_spark.operators.crawler import STATUS_TIMEOUT, split_fetched
from bathyscaphe_spark.operators.fetch_net import (
    fetch_net,
    socks5_http_transport,
)

NOW = "2024-05-01 12:00:00"


def _frontier(spark, urls):
    return spark.createDataFrame(
        [(u, u.split("/")[2], i) for i, u in enumerate(urls)],
        "url string, host string, depth int",
    )


def make_fake_transport():
    # nested so cloudpickle ships it by VALUE: a module-level function
    # would pickle by reference to the test module, which Spark's
    # python workers cannot import
    def fake_transport(url):
        if "timeout" in url:
            raise TimeoutError("simulated")
        body = f"<html>{url}</html>".encode()
        return 200, {"Content-Type": "text/html"}, body

    return fake_transport


class TestFetchPool:
    def test_payload_schema_and_carry(self, spark):
        urls = [f"http://h{i}.onion/p{i}" for i in range(6)]
        out = fetch_net(_frontier(spark, urls), make_fake_transport(), NOW).collect()
        assert len(out) == 6
        by_url = {r["url"]: r for r in out}
        for u in urls:
            r = by_url[u]
            assert r["depth"] is not None and r["host"] == u.split("/")[2]
            assert r["status"] == 200
            assert r["headers"]["Content-Type"] == "text/html"
            assert bytes(r["html"]) == f"<html>{u}</html>".encode()
            assert str(r["warc_ts"]).startswith("2024-05-01 12:00:00")

    def test_errors_become_timeout_rows(self, spark):
        urls = ["http://ok.onion/a", "http://timeout.onion/b"]
        out = {r["url"]: r for r in
               fetch_net(_frontier(spark, urls), make_fake_transport(), NOW).collect()}
        t = out["http://timeout.onion/b"]
        assert t["status"] == STATUS_TIMEOUT
        assert t["html"] is None and t["headers"] == {}
        assert out["http://ok.onion/a"]["status"] == 200

    def test_composes_with_split_fetched(self, spark):
        """The downstream F5/O4 contract is transport-agnostic: the
        net-fetched frame splits exactly like the simulated join."""
        urls = ["http://a.onion/x", "http://timeout.onion/y"]
        fetched = fetch_net(
            _frontier(spark, urls), make_fake_transport(), NOW
        ).withColumn("warc_ts", F.col("warc_ts"))
        ok, timeouts = split_fetched(
            fetched,
            CrawlConfig(allowed_mime_types=(MimeType("text/html", ("html",)),)),
        )
        assert [r["url"] for r in ok.collect()] == ["http://a.onion/x"]
        assert [r["url"] for r in timeouts.collect()] == [
            "http://timeout.onion/y"
        ]

    def test_requires_transport(self, spark):
        with pytest.raises(ValueError, match="transport"):
            fetch_net(_frontier(spark, ["http://a.onion/"]), None, NOW)


# --------------------------------------------------------------------------
# loopback SOCKS5 proxy serving canned HTTP — exercises the REAL
# transport end-to-end (handshake, domain-name CONNECT, request line,
# header parse, content-length and chunked bodies) with no network
# --------------------------------------------------------------------------

def _serve_once(listener, response: bytes, seen: dict):
    conn, _ = listener.accept()
    with conn:
        assert conn.recv(3) == b"\x05\x01\x00"
        conn.sendall(b"\x05\x00")
        hdr = conn.recv(4)
        assert hdr[:4] == b"\x05\x01\x00\x03"
        n = conn.recv(1)[0]
        seen["host"] = conn.recv(n).decode()
        seen["port"] = int.from_bytes(conn.recv(2), "big")
        # reply: success, IPv4 0.0.0.0:0 bound address
        conn.sendall(b"\x05\x00\x00\x01" + bytes(6))
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        seen["request"] = req.decode("latin-1")
        conn.sendall(response)


def _roundtrip(response: bytes, url_path="/page"):
    listener = socket.socket()
    listener.bind(("127.0.0.1", 0))
    listener.listen(1)
    port = listener.getsockname()[1]
    seen: dict = {}
    t = threading.Thread(
        target=_serve_once, args=(listener, response, seen), daemon=True
    )
    t.start()
    try:
        transport = socks5_http_transport(
            "127.0.0.1", port, timeout_s=5.0, user_agent="ua-test"
        )
        got = transport(f"http://example.onion{url_path}")
    finally:
        t.join(timeout=5)
        listener.close()
    return got, seen


class TestSocksTransport:
    def test_content_length_get(self):
        resp = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: 11\r\n\r\nhello world")
        (status, headers, body), seen = _roundtrip(resp)
        assert (status, body) == (200, b"hello world")
        assert headers["Content-Type"] == "text/html"
        # CONNECT carried the domain name (proxy-side resolution — the
        # anonymity property) and the request was a well-formed GET
        assert seen["host"] == "example.onion" and seen["port"] == 80
        assert seen["request"].startswith("GET /page HTTP/1.1\r\n")
        assert "User-Agent: ua-test\r\n" in seen["request"]
        assert "Host: example.onion\r\n" in seen["request"]

    def test_chunked_body(self):
        resp = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
        (status, _, body), _ = _roundtrip(resp)
        assert (status, body) == (200, b"hello world")

    def test_redirect_status_passes_through(self):
        # F6 is downstream: the transport must NOT follow redirects
        resp = (b"HTTP/1.1 301 Moved\r\nLocation: http://x.onion/\r\n"
                b"Content-Length: 0\r\n\r\n")
        (status, headers, body), _ = _roundtrip(resp)
        assert status == 301 and headers["Location"] == "http://x.onion/"
        assert body == b""

    def test_refused_connect_raises(self):
        listener = socket.socket()
        listener.bind(("127.0.0.1", 0))
        listener.listen(1)
        port = listener.getsockname()[1]

        def refuse():
            conn, _ = listener.accept()
            with conn:
                conn.recv(3)
                conn.sendall(b"\x05\x00")
                conn.recv(262)
                # rep=0x05 connection refused
                conn.sendall(b"\x05\x05\x00\x01" + bytes(6))

        t = threading.Thread(target=refuse, daemon=True)
        t.start()
        try:
            transport = socks5_http_transport("127.0.0.1", port, timeout_s=5.0)
            with pytest.raises(OSError, match="refused"):
                transport("http://dead.onion/")
        finally:
            t.join(timeout=5)
            listener.close()

    def test_non_http_scheme_rejected(self):
        transport = socks5_http_transport("127.0.0.1", 1)
        with pytest.raises(ValueError, match="scheme"):
            transport("ftp://example.onion/")
