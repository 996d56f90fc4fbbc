"""WARC source — ingest Common-Crawl-style archives into the pages table.

The north-star input is "an Iceberg table of Common-Crawl-style web
pages (url, warc_ts, html:binary, ...)"; Common Crawl's native wire
format is WARC (ISO 28500): a sequence of records, each a CRLF-header
block, a ``Content-Length``-delimited payload, and a blank-line
separator, usually with ONE GZIP MEMBER PER RECORD concatenated into a
``.warc.gz``.  This module turns a directory of WARC files into the
engine's pages-universe shape with stdlib-only parsing.

Scale design
------------
* **One task per WARC file, streamed** — the driver lists paths via the
  ``binaryFile`` datasource but selects ONLY ``(path, length)`` (column
  pruning keeps the file bytes out of the scan); the kernel then opens
  each file and walks it incrementally with ``gzip``/raw buffered IO,
  so peak memory is O(one record), never O(file).  A 1 GiB archive
  costs a task ~record-sized buffers.
* **No per-row Python** — one ``mapInPandas`` stage emits Arrow batches
  of parsed records; downstream (extraction, filters, dedup) is the
  existing vectorized pipeline.
* HTTP response payloads are split head/body once; header keys are
  lowercased to match the engine-wide X7 convention
  (reference: internal/indexer/index/elastic.go:171-175).

``write_warc`` (bytes builder) is the mirror image, used for fixtures
and for exporting a resources table back to WARC.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import IO, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

WARC_SCHEMA = (
    "url string, warc_ts timestamp, record_type string, status int, "
    "headers map<string,string>, html binary"
)


# --- record-level parsing (pure functions, unit-testable) -----------------

def _read_headers(stream: IO[bytes]) -> dict[str, str] | None:
    """Read a CRLF header block (terminated by a blank line) into a dict
    with lowercased keys.  Returns None at clean EOF."""
    lines: list[bytes] = []
    while True:
        line = stream.readline()
        if not line:
            return None if not lines else {}
        if line in (_CRLF, b"\n"):
            break
        lines.append(line)
    if not lines:
        return None
    headers: dict[str, str] = {}
    for raw in lines:
        if b":" not in raw:
            continue  # tolerate the WARC/1.x version line and junk
        k, v = raw.split(b":", 1)
        headers[k.strip().lower().decode("latin-1")] = (
            v.strip().decode("latin-1")
        )
    return headers


def _split_http_payload(payload: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """HTTP response payload → (status, lowercased headers, body)."""
    sep = payload.find(_SEP)
    if sep < 0:
        return None, {}, payload
    head, body = payload[:sep], payload[sep + len(_SEP):]
    lines = head.split(_CRLF)
    status: int | None = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    headers: dict[str, str] = {}
    for raw in lines[1:]:
        if b":" not in raw:
            continue
        k, v = raw.split(b":", 1)
        headers[k.strip().lower().decode("latin-1")] = (
            v.strip().decode("latin-1")
        )
    return status, headers, body


def iter_warc_records(stream: IO[bytes]) -> Iterator[dict]:
    """Walk one (decompressed) WARC stream record by record.

    Yields dicts with keys (url, warc_ts, record_type, status, headers,
    html).  Request/metadata/info records pass through with html=None so
    callers can filter; malformed trailing garbage ends the iteration
    rather than raising (archives in the wild are truncated).
    """
    while True:
        warc_headers = _read_headers(stream)
        if warc_headers is None:
            return
        try:
            length = int(warc_headers.get("content-length", ""))
        except ValueError:
            return  # not a record boundary — stop at garbage
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated archive: drop the partial record
        # consume the record separator (two CRLFs)
        stream.readline()
        stream.readline()
        rtype = warc_headers.get("warc-type", "")
        ts = None
        raw_ts = warc_headers.get("warc-date")
        if raw_ts:
            try:
                ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ").replace(
                    tzinfo=timezone.utc
                )
            except ValueError:
                ts = None
        url = warc_headers.get("warc-target-uri")
        status: int | None = None
        http_headers: dict[str, str] = {}
        body: bytes | None = None
        if rtype == "response" and warc_headers.get(
            "content-type", ""
        ).startswith("application/http"):
            status, http_headers, body = _split_http_payload(payload)
        elif rtype in ("resource", "conversion"):
            # conversion records (WET text sidecars) carry the payload
            # directly — no HTTP envelope
            body = payload
        yield {
            "url": url,
            "warc_ts": ts,
            "record_type": rtype,
            "status": status,
            "headers": http_headers,
            "html": body,
        }


def _open_maybe_gzip(path: str) -> IO[bytes]:
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        # gzip transparently concatenates members (CC: one per record)
        return io.BufferedReader(gzip.GzipFile(fileobj=f))  # type: ignore[arg-type]
    return io.BufferedReader(f)  # type: ignore[arg-type]


# --- the Spark source ------------------------------------------------------

def read_warc(
    spark: SparkSession, path: str, responses_only: bool = True,
    batch_rows: int = 512,
) -> DataFrame:
    """Read WARC/WARC.gz file(s) (glob ok) into
    ``(url, warc_ts, record_type, status, headers, html)``.

    Paths are listed by the ``binaryFile`` datasource with the content
    column PRUNED (only path+length reach the driver plan); each task
    streams its files record-by-record — memory stays O(record).
    """
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "length")
    )
    n_files = files.count()
    files = files.repartition(max(1, n_files))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for uri in pdf["path"]:
                local = uri[5:] if uri.startswith("file:") else uri
                out: list[dict] = []
                with _open_maybe_gzip(local) as stream:
                    for rec in iter_warc_records(stream):
                        if responses_only and rec["record_type"] != "response":
                            continue
                        out.append(rec)
                        if len(out) >= batch_rows:
                            yield pd.DataFrame(out)
                            out = []
                if out:
                    yield pd.DataFrame(out)

    return files.mapInPandas(_run, schema=WARC_SCHEMA)


def warc_pages(
    spark: SparkSession, path: str, enrich: bool = False
) -> DataFrame:
    """WARC archive(s) → the pages-universe shape the crawl consumes:
    ``(url, warc_ts, html, headers, status)`` for HTTP-200 responses
    with a target URI — ready for ``pipeline.driver.crawl``'s fetch
    join or for the extraction/dedup operators.

    ``enrich=True`` adds the remaining Common-Crawl-style columns of
    the input-table shape: ``text`` (visible text, tags stripped,
    script/style dropped — one Arrow-batched UDF) and ``lang``
    (codegen'd stopword-vote heuristic, same expression as the
    ``lang_guess`` contract query)."""
    recs = read_warc(spark, path)
    out = recs.where(
        F.col("url").isNotNull() & (F.col("status") == 200)
    ).select("url", "warc_ts", "html", "headers", "status")
    if enrich:
        from ..functions.html import extract_text
        from ..functions.textstats import lang_guess_col

        out = out.withColumn("text", extract_text(F.col("html")))
        out = out.withColumn("lang", lang_guess_col(F.col("text")))
    return out


def warc_universe(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive(s) → a CRAWLABLE fetch universe (the
    ``pipeline.synth.build_pages`` column contract): all response
    records keep their status (so timeout/redirect semantics apply),
    ``host`` is derived, ``html`` cast to string for the extraction
    kernel, and text/lang enrichment included — drop-in for
    ``pipeline.driver.crawl(spark, pages=..., ...)``."""
    from ..functions.html import extract_text
    from ..functions.textstats import lang_guess_col
    from ..functions.urltools import normalize_url

    recs = read_warc(spark, path).where(F.col("url").isNotNull())
    # the universe's join key must be the engine-canonical (X2) url —
    # raw WARC target URIs ('http://h.onion/') would never match the
    # normalized frontier ('http://h.onion')
    recs = recs.withColumn("url", normalize_url(F.col("url"))).where(
        F.col("url").isNotNull()
    )
    html_str = F.col("html").cast("string")
    out = recs.select(
        "url",
        F.lower(F.parse_url(F.col("url"), F.lit("HOST"))).alias("host"),
        "warc_ts",
        html_str.alias("html"),
        "headers",
        "status",
    )
    out = out.withColumn("text", extract_text(F.col("html")))
    return out.withColumn("lang", lang_guess_col(F.col("text")))


def cdx_index(pages: DataFrame) -> DataFrame:
    """CDXJ-style index rows for a pages/resources table: the web-archive
    lookup format ``(surt_key, ts14, json)`` — SURT key + 14-digit
    timestamp give the sorted seekable key (pywb/OpenWayback layout);
    the JSON carries url/status/digest.  Sorting/bucketing the output by
    (surt, ts14) makes any domain a contiguous range at 100 TB.

    Pure column expressions; the JSON is hand-concatenated (fixed key
    order) so the line is byte-deterministic across engines.
    """
    from ..functions.fnv import fnv1_64
    from ..functions.urltools import surt_col

    surt = surt_col(F.col("url"))
    ts14 = F.date_format(F.col("warc_ts"), "yyyyMMddHHmmss")
    digest = fnv1_64(F.col("html").cast("string"))
    js = F.concat(
        F.lit('{"url": "'), F.col("url"),
        F.lit('", "status": "'), F.col("status").cast("string"),
        F.lit('", "digest": "'), digest.cast("string"),
        F.lit('"}'),
    )
    return pages.select(
        surt.alias("surt"), ts14.alias("ts14"), js.alias("cdxj")
    )


def cdx_query(
    cdx: DataFrame,
    query_url: str,
    match_type: str = "exact",
    from_ts: str | None = None,
    to_ts: str | None = None,
) -> DataFrame:
    """CDX-server lookup with pywb matchType semantics over a CDXJ index
    (the public pywb/OpenWayback query API archive users hit):

    * ``exact``  — captures of exactly this url (canonicalized),
    * ``prefix`` — every capture whose SURT key extends the query's
      (path-prefix queries: ``/images/`` and everything under it),
    * ``host``   — every capture on the query's host,
    * ``domain`` — the host AND all its subdomains (the SURT trick:
      ``com,example`` followed by ``)`` or ``,``).

    ``from_ts``/``to_ts`` are inclusive 14-digit timestamp bounds
    (string compare is correct on the fixed-width form).

    The probe key is computed from ``query_url`` by the SAME surt
    column expression the index was built with, applied to a literal —
    Catalyst constant-folds it, so the executors see a literal
    equality/StartsWith on the index's sort key: a contiguous key
    range, partition-prunable on a surt-sorted/bucketed table, never a
    scan-side recompute.  No UDFs, no collect.
    """
    from ..functions.urltools import surt_col, surt_host_col

    u = F.lit(query_url)
    if match_type == "exact":
        cond = F.col("surt") == surt_col(u)
    elif match_type == "prefix":
        cond = F.col("surt").startswith(surt_col(u))
    elif match_type == "host":
        cond = F.col("surt").startswith(F.concat(surt_host_col(u), F.lit(")")))
    elif match_type == "domain":
        h = surt_host_col(u)
        cond = F.col("surt").startswith(
            F.concat(h, F.lit(")"))
        ) | F.col("surt").startswith(F.concat(h, F.lit(",")))
    else:
        raise ValueError(f"unknown match_type: {match_type!r}")
    out = cdx.where(cond)
    if from_ts is not None:
        out = out.where(F.col("ts14") >= F.lit(from_ts))
    if to_ts is not None:
        out = out.where(F.col("ts14") <= F.lit(to_ts))
    return out


def latest_captures(pages: DataFrame) -> DataFrame:
    """Latest capture per SURT key — the web-archive "current snapshot"
    view: Common-Crawl-style collections carry many captures (revisits)
    of the same URL and a text pipeline wants exactly one, the newest
    (the CDX collapse=urlkey convention).

    One shuffle on ``surt`` + per-key ordering via ``row_number`` over
    (warc_ts DESC, url ASC) — the tie-break makes the pick total-ordered
    and engine-independent when two captures share a timestamp.  Keys
    are single URLs, so partition skew is bounded by
    captures-per-URL, not host size.  Returns
    (surt, url, warc_ts, status, n_captures).
    """
    from pyspark.sql import Window

    from ..functions.urltools import surt_col

    w = Window.partitionBy("surt").orderBy(
        F.col("warc_ts").desc(), F.col("url").asc(), F.col("status").asc()
    )
    return (
        pages.withColumn("surt", surt_col(F.col("url")))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_captures", F.count(F.lit(1)).over(Window.partitionBy("surt")))
        .where(F.col("rn") == 1)
        .select("surt", "url", "warc_ts", "status", "n_captures")
    )


def write_warc(
    df: DataFrame, out_dir: str, url_col: str = "url", ts_col: str = "warc_ts",
    status_col: str = "status", headers_col: str = "headers",
    body_col: str = "html", compress: bool = True,
) -> int:
    """Export a resources-shaped DataFrame back to WARC: one
    ``part-<partition>.warc[.gz]`` per input partition, written
    executor-side (the driver never sees record bytes).  Returns the
    number of records written.

    Rows with a null url or body are skipped (WARC response records
    require both).  Repartition the input to choose the archive count —
    at cluster scale aim for ~1 GiB per output file.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    cols = [url_col, ts_col, status_col, headers_col, body_col]

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # Stream record-at-a-time: O(record) memory in the export path
        # (matching ingest), never an O(partition) buffer — a 1 GiB
        # archive per task must not also exist as a list + one blob.
        n = 0
        tmp = os.path.join(out_dir, f".part-{pid:05d}{ext}.tmp")
        f = None
        for pdf in batches:
            for url, ts, status, headers, body in zip(
                *(pdf[c] for c in cols)
            ):
                if url is None or body is None:
                    continue
                iso = (
                    "1970-01-01T00:00:00Z"
                    if pd.isna(ts)  # arrives as NaT, not None
                    else ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                )
                if f is None:
                    f = open(tmp, "wb")
                f.write(build_warc_record(
                    n, url, iso,
                    int(status) if status is not None else 200,
                    dict(headers or {}), bytes(body), compress=compress,
                ))
                n += 1
        if f is not None:
            f.close()
            os.replace(tmp, os.path.join(out_dir, f"part-{pid:05d}{ext}"))
        yield pd.DataFrame({"n": [n]})

    counts = df.select(*cols).mapInPandas(_write, schema="n long").collect()
    return int(sum(r["n"] for r in counts))


# --- fixture / export writer ----------------------------------------------

def build_warc_bytes(
    records: list[tuple[str, str, int, dict[str, str], bytes]],
    compress: bool = True,
) -> bytes:
    """Serialize (url, iso_ts, status, http_headers, body) tuples into a
    WARC byte string — one gzip member per record when ``compress``
    (the Common Crawl layout).  Fixture/test helper; the export path
    streams per-record via :func:`build_warc_record`."""
    out = io.BytesIO()
    for i, (url, iso_ts, status, headers, body) in enumerate(records):
        out.write(build_warc_record(i, url, iso_ts, status, headers, body,
                                    compress=compress))
    return out.getvalue()


def build_warc_record(
    i: int, url: str, iso_ts: str, status: int,
    headers: dict[str, str], body: bytes, compress: bool = True,
) -> bytes:
    """One WARC response record (its own gzip member when ``compress``)."""
    http_head = (f"HTTP/1.1 {status} OK\r\n".encode() + b"".join(
        f"{k}: {v}\r\n".encode("latin-1") for k, v in headers.items()
    ) + _CRLF)
    payload = http_head + body
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n".encode()
        + f"WARC-Date: {iso_ts}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode("latin-1")
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(payload)}\r\n".encode()
        + _CRLF + payload + _SEP
    )
    return gzip.compress(rec) if compress else rec


# --- WET (extracted-text conversion records, the Common Crawl sidecar) -----

def wet_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Frame extracted text as WET ``conversion`` records — the
    text-only sidecar format Common Crawl publishes next to its WARCs
    (public ISO 28500 record layout; one ``WARC-Type: conversion``
    record per page, payload = the extracted text, no HTTP envelope).
    Downstream LLM pipelines consume WET, not WARC: shipping text this
    way is ~10× lighter than re-parsing HTML at the consumer.

    Pure whole-stage-codegen framing: the record id is the md5 of the
    url (engine-stable, deterministic — Common Crawl's uuids are not
    reproducible, ours must be), ``content_length`` is the OCTET length
    of the UTF-8 payload (multi-byte text ≠ char count), and
    ``wet_record`` is header+payload ready for the writer.  Rows with a
    null url or text are dropped (a conversion record requires both).

    Output: (url, wet_header, content_length, wet_record).
    """
    url = F.col(url_col)
    iso = F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    n_octets = F.octet_length(F.col(text_col)).cast("long")
    header = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        iso,
        F.lit("\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(url),
        F.lit(">\r\nContent-Type: text/plain\r\nContent-Length: "),
        n_octets.cast("string"),
        F.lit("\r\n\r\n"),
    )
    return (
        pages.where(url.isNotNull() & F.col(text_col).isNotNull())
        .select(
            url.alias("url"),
            header.alias("wet_header"),
            n_octets.alias("content_length"),
            F.concat(header, F.col(text_col)).alias("wet_record"),
        )
    )


def write_wet(
    df: DataFrame, out_dir: str, url_col: str = "url",
    ts_col: str = "warc_ts", text_col: str = "text", compress: bool = True,
) -> int:
    """Export extracted text as ``part-<partition>.warc.wet[.gz]``
    files: the same streaming executor-side writer discipline as
    ``write_warc`` (O(record) memory, tmp-then-rename per partition,
    one gzip member per record so consumers can split on members).
    Returns the number of conversion records written."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wet.gz" if compress else ".warc.wet"
    cols = [url_col, ts_col, text_col]

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        tmp = os.path.join(out_dir, f".part-{pid:05d}{ext}.tmp")
        f = None
        for pdf in batches:
            for url, ts, text in zip(*(pdf[c] for c in cols)):
                if url is None or text is None:
                    continue
                iso = (
                    "1970-01-01T00:00:00Z"
                    if pd.isna(ts)  # arrives as NaT, not None
                    else ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                )
                payload = text.encode("utf-8")
                rec = (
                    b"WARC/1.0\r\n"
                    b"WARC-Type: conversion\r\n"
                    + f"WARC-Target-URI: {url}\r\n".encode("latin-1")
                    + f"WARC-Date: {iso}\r\n".encode()
                    + "WARC-Record-ID: <urn:md5:{}>\r\n".format(
                        hashlib.md5(url.encode()).hexdigest()
                    ).encode()
                    + b"Content-Type: text/plain\r\n"
                    + f"Content-Length: {len(payload)}\r\n".encode()
                    + _CRLF + payload + _SEP
                )
                if f is None:
                    f = open(tmp, "wb")
                f.write(gzip.compress(rec) if compress else rec)
                n += 1
        if f is not None:
            f.close()
            os.replace(tmp, os.path.join(out_dir, f"part-{pid:05d}{ext}"))
        yield pd.DataFrame({"n": [n]})

    counts = df.select(*cols).mapInPandas(_write, schema="n long").collect()
    return int(sum(r["n"] for r in counts))


# --- WAT (metadata JSON records, the Common Crawl link-graph sidecar) -------

WAT_TITLE_RE = "<title>([^<]*)</title>"
WAT_DESC_RE = '<meta [^>]*name="description"[^>]* content="([^"]*)"'


def wat_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """Frame per-page metadata as WAT ``metadata`` records — the JSON
    sidecar Common Crawl publishes beside WARC/WET (public format:
    an ``Envelope`` with the WARC header echo plus ``HTML-Metadata``
    carrying Head.Title, Head.Metas and the outlink list).  Link-graph
    and anchor-text consumers read WAT, never the 20× heavier WARC.

    Pure whole-stage-codegen: title/description by the strict
    double-quoted-attribute contract (CANONICAL_RE discipline —
    reference parity for tolerant parsing lives in functions/html.py
    parse_doc; WAT stays shuffle-free codegen by design), outlinks via
    ``anchor_pairs_col``, and the payload via ``to_json`` over a fixed
    struct shape (field order = struct order, no whitespace —
    deterministic bytes at any parallelism).  The record id is the md5
    of the url, as in ``wet_records``; ``content_length`` counts
    payload OCTETS.

    Output: (url, payload, content_length, wat_record).
    """
    from ..functions.html import anchor_pairs_col

    url = F.col(url_col)
    html = F.col(html_col)
    iso = F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    links = F.transform(
        anchor_pairs_col(html),
        lambda a: F.struct(
            F.lit("A@/href").alias("path"), a["href"].alias("url")
        ),
    )
    payload = F.to_json(
        F.struct(
            F.struct(
                F.struct(
                    url.alias("WARC-Target-URI"),
                    iso.alias("WARC-Date"),
                    F.lit("response").alias("WARC-Type"),
                ).alias("WARC-Header-Metadata"),
                F.struct(
                    F.struct(
                        F.struct(
                            F.regexp_extract(html, WAT_TITLE_RE, 1)
                            .alias("Title"),
                            F.array(
                                F.struct(
                                    F.lit("description").alias("name"),
                                    F.regexp_extract(html, WAT_DESC_RE, 1)
                                    .alias("content"),
                                )
                            ).alias("Metas"),
                        ).alias("Head"),
                        links.alias("Links"),
                    ).alias("HTML-Metadata")
                ).alias("Payload-Metadata"),
            ).alias("Envelope")
        )
    )
    n_octets = F.octet_length(payload).cast("long")
    header = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        iso,
        F.lit("\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(url),
        F.lit(">\r\nContent-Type: application/json\r\nContent-Length: "),
        n_octets.cast("string"),
        F.lit("\r\n\r\n"),
    )
    return (
        pages.where(url.isNotNull() & html.isNotNull())
        .select(
            url.alias("url"),
            payload.alias("payload"),
            n_octets.alias("content_length"),
            F.concat(header, payload).alias("wat_record"),
        )
    )


# --- ZipNum (sharded secondary index over the CDX — pywb/OpenWayback) -------

ZIPNUM_LINES = 3000  # pywb default lines-per-gzip-block


def zipnum_index(
    cdx: DataFrame,
    lines_per_block: int = ZIPNUM_LINES,
    shard_prefix_len: int = 1,
) -> DataFrame:
    """ZipNum secondary index over CDXJ rows — the layer that makes a
    petabyte CDX seekable (pywb/OpenWayback public layout): primary
    lines pack into gzip blocks of ``lines_per_block``, and a tiny
    ``cluster.idx`` records each block's FIRST key, so a lookup binary
    searches the idx and decompresses exactly one block.

    Sharding here is the first ``shard_prefix_len`` chars of the SURT
    key — deterministic and order-preserving (every shard is a
    contiguous key range, lookups touch one shard), at the cost of
    alphabet skew; production deployments precompute balanced range
    boundaries from a key sample and pass them to the writer the same
    way (the block math below is boundary-agnostic).

    One range-shaped shuffle: rows key on (shard), order by
    (surt, ts14, cdxj) per shard — the block ordinal is a row_number
    fold, and the idx aggregates per (shard, block).  The idx is
    ~1/lines_per_block of the corpus: at 10^10 captures and the pywb
    default 3000, a 3.3M-row driver-free table.

    Output (one row per gzip block): (shard, block, first_surt,
    first_ts14, n_lines).
    """
    from pyspark.sql import Window

    shard = F.substring(F.col("surt"), 1, shard_prefix_len)
    w = Window.partitionBy("shard").orderBy("surt", "ts14", "cdxj")
    blocks = (
        cdx.withColumn("shard", shard)
        .withColumn(
            "block",
            ((F.row_number().over(w) - 1) / lines_per_block)
            .cast("long"),
        )
    )
    return (
        blocks.groupBy("shard", "block")
        .agg(
            F.min(F.struct("surt", "ts14")).alias("_first"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "shard",
            "block",
            F.col("_first")["surt"].alias("first_surt"),
            F.col("_first")["ts14"].alias("first_ts14"),
            "n_lines",
        )
    )


def write_zipnum(
    cdx: DataFrame, out_dir: str,
    lines_per_block: int = ZIPNUM_LINES, shard_prefix_len: int = 1,
) -> int:
    """Materialize the ZipNum pair: per shard a ``<shard>.cdx.gz`` of
    concatenated gzip members (one member per block — members split
    independently, the format's whole point) plus ``cluster.idx``
    lines ``<first_surt> <first_ts14>\\t<shard file>\\t<byte offset>\\t
    <byte length>\\t<block#>`` with REAL byte offsets measured as
    members are written.  One shard per task via repartition on the
    shard key (order within shard restored executor-side), O(block)
    memory.  Returns the number of primary lines written."""
    import gzip
    import os

    os.makedirs(out_dir, exist_ok=True)
    shard = F.substring(F.col("surt"), 1, shard_prefix_len)
    parts = (
        cdx.withColumn("shard", shard)
        .repartition("shard")
        .sortWithinPartitions("shard", "surt", "ts14", "cdxj")
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        files: dict[str, dict] = {}
        n = 0

        def flush(sh: str) -> None:
            st = files[sh]
            if not st["buf"]:
                return
            member = gzip.compress(
                "".join(st["buf"]).encode("utf-8"), mtime=0
            )
            st["idx"].append(
                f"{st['first']}\t{sh}.cdx.gz\t{st['off']}\t"
                f"{len(member)}\t{st['block']}\n"
            )
            st["f"].write(member)
            st["off"] += len(member)
            st["block"] += 1
            st["buf"] = []

        for pdf in batches:
            for sh, surt, ts14, cdxj in zip(
                pdf["shard"], pdf["surt"], pdf["ts14"], pdf["cdxj"]
            ):
                st = files.get(sh)
                if st is None:
                    st = files[sh] = {
                        "f": open(os.path.join(out_dir, f".{sh}.cdx.gz.tmp"), "wb"),
                        "buf": [], "off": 0, "block": 0, "idx": [],
                        "first": None,
                    }
                if not st["buf"]:
                    st["first"] = f"{surt} {ts14}"
                st["buf"].append(f"{surt} {ts14} {cdxj}\n")
                n += 1
                if len(st["buf"]) >= lines_per_block:
                    flush(sh)
        for sh, st in sorted(files.items()):
            flush(sh)
            st["f"].close()
            os.replace(
                os.path.join(out_dir, f".{sh}.cdx.gz.tmp"),
                os.path.join(out_dir, f"{sh}.cdx.gz"),
            )
            with open(os.path.join(out_dir, f"{sh}.idx"), "w") as fi:
                fi.writelines(st["idx"])
        yield pd.DataFrame({"n": [n]})

    counts = (
        parts.select("shard", "surt", "ts14", "cdxj")
        .mapInPandas(_write, schema="n long")
        .collect()
    )
    return int(sum(r["n"] for r in counts))


def mark_revisits(pages: DataFrame) -> DataFrame:
    """Classify captures as ``response`` vs ``revisit`` records — the
    web-archive storage dedup (WARC 1.1 ``revisit`` +
    identical-payload-digest profile, the convention Common Crawl and
    Heritrix apply): the FIRST capture of a payload digest per URL
    stores the body; every later capture of the same (url, digest)
    stores only a pointer to the original's (url, ts).  At recrawl
    cadence this is most of an archive's bytes.

    Relational contract: one window over (url, digest) ordered by
    (warc_ts, url) — rows rank 1 are responses; later rows carry
    ``refers_to_ts`` = the original's timestamp.  Cross-URL identical
    bodies do NOT alias (the profile's url-scoped variant — the
    deterministic choice that never needs a global digest registry at
    write time).

    One shuffle keyed on (url, digest) — bounded by captures-per-URL,
    the same skew story as ``latest_captures``.  Output: (url, warc_ts,
    digest, record_type, refers_to_ts, saved_octets).
    """
    from pyspark.sql import Window

    digest = F.xxhash64(F.col("html"))
    w = Window.partitionBy("url", "_d").orderBy("warc_ts", "url")
    tagged = (
        pages.withColumn("_d", digest)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_first_ts", F.first("warc_ts").over(w))
    )
    is_rev = F.col("_rn") > 1
    return tagged.select(
        "url",
        "warc_ts",
        F.col("_d").alias("digest"),
        F.when(is_rev, F.lit("revisit")).otherwise(F.lit("response"))
        .alias("record_type"),
        F.when(is_rev, F.col("_first_ts")).alias("refers_to_ts"),
        F.when(is_rev, F.octet_length(F.col("html").cast("string")))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("saved_octets"),
    )


def timemap(cdx: DataFrame) -> DataFrame:
    """Memento TimeMap rows (RFC 7089, the public web-archive
    ``/timemap/link/<url>`` API): per SURT key, every capture ordered
    by timestamp with its ``first memento`` / ``last memento`` flags
    and prev/next neighbor timestamps — exactly the link-format
    relations a TimeMap serializes.

    Output: (surt, ts14, n_mementos, is_first, is_last, prev_ts14,
    next_ts14).

    One window over (surt, ts14) — the index's own sort order, so on a
    surt-sorted/bucketed CDX table the partitioning is free and the
    window never re-shuffles.  Pure codegen.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("surt").orderBy("ts14")
    ws = Window.partitionBy("surt")
    n = F.count(F.lit(1)).over(ws).cast("long")
    rn = F.row_number().over(w)
    # is_last = rn == n over the SAME ascending window: one sort per
    # partition, not a second descending re-sort, and first/last stay
    # consistent under equal-ts14 ties
    return cdx.select(
        "surt",
        "ts14",
        n.alias("n_mementos"),
        (rn == 1).alias("is_first"),
        (rn == n).alias("is_last"),
        F.lag("ts14").over(w).alias("prev_ts14"),
        F.lead("ts14").over(w).alias("next_ts14"),
    )
