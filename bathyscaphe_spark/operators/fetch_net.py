"""Real-network fetch stage (opt-in) — the production S4 seam.

The engine's default fetch is the simulated frontier⋈pages join
(``operators/crawler.py``: this sandbox has no network).  This module
is the documented swap-in for a real deployment, re-creating the
reference's Tor-proxied HTTP client
(``/root/reference/internal/http/client.go:31-62``: fasthttp through a
SOCKS5 proxy, hard timeout, configurable user agent; invoked
per-message in ``internal/crawler/crawler.go:91-155``) as a
**bounded-concurrency fetch pool inside one ``mapInPandas`` stage**:

* INPUT: the scheduled frontier (any schema containing ``url``), as
  produced by the politeness stage — per-host budgets and the salted
  host partitioning are already applied, so one Spark task holds a
  bounded, host-diverse slice of the round's fetches.
* Per Arrow batch, a ``ThreadPoolExecutor`` with ``concurrency``
  workers drives the blocking transport (Python HTTP I/O is
  socket-blocking; a thread pool is the faithful async-pool shape for
  it — each worker parks on the socket, the GIL is released during
  I/O).  One output frame per input batch: executor memory stays
  O(batch), never O(partition).
* OUTPUT: the input columns plus ``status int`` / ``headers
  map<string,string>`` / ``html binary`` / ``warc_ts timestamp`` —
  byte-compatible with the simulated join's page payload, so
  ``split_fetched`` (F5/F6/O4) and everything downstream compose
  UNCHANGED.  Transport errors and timeouts become
  ``status = STATUS_TIMEOUT`` rows (null html, empty headers), feeding
  the blacklister's O4 path exactly like the simulated marker.

Determinism discipline: the row timestamp comes from the caller's
replayable ``now`` clock (engine-wide rule: no hidden wall time).  The
fetch RESULTS are inherently non-deterministic (the network is); this
stage is therefore outside the bit-identical replay contract by
design — the reference crawler has the same property.

The transport is INJECTABLE (``transport=`` callable) so the pool,
schema, batching, and timeout semantics are unit-testable without a
network; :func:`socks5_http_transport` builds the real stdlib
SOCKS5-CONNECT + HTTP/1.1 client for deployments (tested in-repo
against an in-process loopback SOCKS server — no external network).
There is intentionally NO default transport: constructing one requires
naming a proxy endpoint, which is the deployment flag.
"""

from __future__ import annotations

import io
import socket
from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame

from .crawler import STATUS_TIMEOUT

# transport contract: url -> (status, {header: value}, body bytes);
# raise (anything) => STATUS_TIMEOUT row
Transport = Callable[[str], tuple[int, dict[str, str], bytes]]

_FETCH_FIELDS = (
    "status int, headers map<string,string>, html binary, warc_ts timestamp"
)


def fetch_net(
    scheduled: DataFrame,
    transport: Transport,
    now: str,
    concurrency: int = 64,
) -> DataFrame:
    """Fetch every ``url`` of ``scheduled`` through ``transport`` with
    at most ``concurrency`` in-flight requests per Spark task, appending
    the page-payload columns (see module docstring).  ``now`` is the
    replayable capture timestamp (``'YYYY-MM-DD HH:MM:SS'``, stamped on
    every row of the round, matching the round-granular ``warc_ts`` of
    the simulated universe)."""
    if transport is None:  # explicit: the absence of a default IS the flag
        raise ValueError(
            "fetch_net requires an explicit transport (e.g. "
            "socks5_http_transport(host, port)); the sandbox default is "
            "the simulated crawler.fetch join"
        )
    in_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                          for f in scheduled.schema.fields)
    out_schema = f"{in_fields}, {_FETCH_FIELDS}"
    ts = pd.Timestamp(now)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(url: str) -> tuple[int, dict[str, str], bytes | None]:
            try:
                status, headers, body = transport(url)
                return int(status), dict(headers), bytes(body)
            except Exception:
                return STATUS_TIMEOUT, {}, None

        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for pdf in batches:
                if not len(pdf):
                    continue
                results = list(pool.map(one, pdf["url"]))
                out = pdf.copy()
                out["status"] = [r[0] for r in results]
                out["headers"] = [r[1] for r in results]
                out["html"] = [r[2] for r in results]
                out["warc_ts"] = ts
                yield out

    return scheduled.mapInPandas(_run, schema=out_schema)


# --------------------------------------------------------------------------
# real transport: SOCKS5 CONNECT + HTTP/1.1 GET, pure stdlib
# --------------------------------------------------------------------------

def _socks5_connect(
    proxy_host: str, proxy_port: int, host: str, port: int, timeout_s: float
) -> socket.socket:
    """RFC 1928 CONNECT through the proxy (no auth — the Tor SOCKS port
    contract, client.go:37-44), domain-name address type so .onion
    names resolve proxy-side (never locally — the anonymity property
    the reference preserves by proxying DNS)."""
    s = socket.create_connection((proxy_host, proxy_port), timeout=timeout_s)
    try:
        s.sendall(b"\x05\x01\x00")  # ver 5, one method: no-auth
        if s.recv(2) != b"\x05\x00":
            raise OSError("SOCKS5 method negotiation failed")
        name = host.encode("idna" if all(ord(c) < 128 for c in host) else "utf-8")
        req = (b"\x05\x01\x00\x03" + bytes([len(name)]) + name
               + port.to_bytes(2, "big"))
        s.sendall(req)
        resp = s.recv(4)
        if len(resp) < 4 or resp[1] != 0x00:
            raise OSError(f"SOCKS5 connect refused (rep={resp[1] if len(resp) > 1 else '?'})")
        # drain the bound address (4/16 bytes or len-prefixed name) + port
        atyp = resp[3]
        if atyp == 1:
            s.recv(4 + 2)
        elif atyp == 4:
            s.recv(16 + 2)
        else:
            s.recv(s.recv(1)[0] + 2)
        return s
    except BaseException:
        s.close()
        raise


def _read_http_response(sock: socket.socket) -> tuple[int, dict[str, str], bytes]:
    """Minimal HTTP/1.1 response parse: status line, headers,
    Content-Length or connection-close body (the reference's fasthttp
    DoTimeout equivalent for simple GETs; chunked encoding is decoded)."""
    f = sock.makefile("rb")
    try:
        line = f.readline(65536).decode("latin-1").rstrip("\r\n")
        parts = line.split(" ", 2)
        if len(parts) < 2 or not parts[0].startswith("HTTP/"):
            raise OSError(f"bad status line: {line!r}")
        status = int(parts[1])
        headers: dict[str, str] = {}
        while True:
            h = f.readline(65536).decode("latin-1").rstrip("\r\n")
            if not h:
                break
            k, _, v = h.partition(":")
            headers[k.strip()] = v.strip()
        te = headers.get("Transfer-Encoding", "").lower()
        if "chunked" in te:
            buf = io.BytesIO()
            while True:
                size = int(f.readline(65536).split(b";")[0], 16)
                if size == 0:
                    f.readline(65536)
                    break
                buf.write(f.read(size))
                f.readline(65536)  # trailing CRLF
            body = buf.getvalue()
        elif "Content-Length" in headers:
            body = f.read(int(headers["Content-Length"]))
        else:
            body = f.read()
        return status, headers, body
    finally:
        f.close()


def socks5_http_transport(
    proxy_host: str,
    proxy_port: int,
    timeout_s: float = 10.0,
    user_agent: str = "bathyscaphe-spark",
) -> Transport:
    """The deployment transport (client.go:31-62 shape): every request
    tunnels through the SOCKS5 proxy with a hard ``timeout_s`` covering
    connect+request+response, sends ``User-Agent`` (client.go:58), and
    returns (status, headers, body) — redirects are NOT followed here
    (F6 is a downstream filter on status, exactly like the simulated
    path).  http:// only: the reference crawls .onion services where
    transport encryption is the overlay's job; an https variant would
    wrap the tunnel in ssl.wrap_socket at this seam."""

    def transport(url: str) -> tuple[int, dict[str, str], bytes]:
        if not url.startswith("http://"):
            raise ValueError(f"unsupported scheme for socks transport: {url}")
        rest = url[len("http://"):]
        hostport, slash, path = rest.partition("/")
        host, _, port_s = hostport.partition(":")
        port = int(port_s) if port_s else 80
        path = slash + path if slash else "/"
        s = _socks5_connect(proxy_host, proxy_port, host, port, timeout_s)
        try:
            s.settimeout(timeout_s)
            req = (
                f"GET {path} HTTP/1.1\r\nHost: {hostport}\r\n"
                f"User-Agent: {user_agent}\r\nConnection: close\r\n\r\n"
            )
            s.sendall(req.encode("latin-1"))
            return _read_http_response(s)
        finally:
            s.close()

    return transport
