"""WARC source: Common-Crawl's container format -> the pages table shape.

The BASELINE.json input is an Iceberg pages table, but upstream of that table
the raw crawl lives in WARC files (concatenated `WARC/1.0` records with
headers + HTTP payload). This reader turns a directory of WARC files into
(url, warc_ts, html, text?, lang?) rows with NO external library — a
deterministic, pinned parser in the same spirit as kgner.textops.

Spark-first design: `spark.read.format("binaryFile")` gives one row per WARC
file (path, content); records are parsed inside an Arrow-batched
mapInPandas, so a 1000-file crawl segment parses with file-level parallelism.
Real crawls gzip each record (WARC/gzip member per record); this sandbox
parser handles the uncompressed form and gates gzip behind the same function
seam a production build would swap.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary"

_SEP = b"\r\n\r\n"


def parse_warc_bytes(blob: bytes) -> list[tuple[str, dt.datetime, bytes]]:
    """Parse concatenated uncompressed WARC records -> [(url, ts, payload)].

    Only `WARC-Type: response` records are emitted; the HTTP header block is
    stripped from the payload. Deterministic, tolerant of trailing garbage.
    """
    out: list[tuple[str, dt.datetime, bytes]] = []
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/1.0", pos)
        if start < 0:
            break
        hdr_end = blob.find(_SEP, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[start:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            key, _, val = line.partition(":")
            if val:
                headers[key.strip().lower()] = val.strip()
        body_start = hdr_end + len(_SEP)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            # malformed/missing length: skip this record without emitting a
            # fabricated empty page. Resync on the record-boundary byte
            # sequence (CRLFCRLF + magic) — scanning raw payload bytes could
            # emit phantom records from a payload that CONTAINS "WARC/1.0".
            nxt = blob.find(_SEP + b"WARC/1.0", body_start)
            if nxt < 0:
                break
            pos = nxt + len(_SEP)
            continue
        body = blob[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "1970-01-01T00:00:00Z")
        try:
            # WARC 1.0/1.1 dates: optional fractional seconds, Z or offset
            ts = dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
            ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
        except ValueError:
            ts = dt.datetime(1970, 1, 1)
        # strip the HTTP response header block if present
        if body.startswith(b"HTTP/"):
            http_end = body.find(_SEP)
            if http_end >= 0:
                body = body[http_end + len(_SEP) :]
        out.append((url, ts, body))
    return out


def write_warc(records: list[tuple[str, dt.datetime, bytes]]) -> bytes:
    """Inverse of parse_warc_bytes (test fixture writer)."""
    parts = []
    for url, ts, payload in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(http)}"
        ).encode()
        parts.append(hdr + _SEP + http)
    return b"\r\n\r\n".join(parts)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .warc files -> pages(url, warc_ts, html).

    File-level parallelism via binaryFile; per-file record parsing in an
    Arrow-batched UDF. At crawl scale one file is one task — Common Crawl
    segments are ~1 GB each, so a 1000-executor cluster chews a segment list
    with no skew beyond file size variance.
    """

    CHUNK = 2000  # records per yielded batch — bounds per-task memory even
    # though binaryFile delivers a whole (possibly GB) file as one input row

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def flush(urls, tss, bodies):
            return pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
                    "html": pd.Series(bodies, dtype="object"),
                }
            )

        for pdf in batches:
            urls, tss, bodies = [], [], []
            for content in pdf["content"]:
                for url, ts, body in parse_warc_bytes(bytes(content)):
                    urls.append(url)
                    tss.append(ts)
                    bodies.append(body)
                    if len(urls) >= CHUNK:
                        yield flush(urls, tss, bodies)
                        urls, tss, bodies = [], [], []
            if urls:
                yield flush(urls, tss, bodies)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .load(path)
        .select("content")
        .mapInPandas(parse, PAGES_SCHEMA)
    )
