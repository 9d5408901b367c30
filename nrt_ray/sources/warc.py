"""WARC source/sink: the actual Common Crawl wire format, from scratch.

Real crawl corpora arrive as WARC/1.0 files (ISO 28500), not Parquet:
one gzip member per record, response records carrying an HTTP response
whose body is the html.  This module implements the format directly —
writer + parser + a Ray Data reader — so the flagship pipeline can
ingest the raw crawl bytes and STILL satisfy the byte-identity
extraction contract (`sources/extract.py`): WARC → (url, warc_ts, html)
→ `extract_text(html)` → signal.

Format implemented (the subset Common Crawl response archives use):

* record = ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` + exactly
  ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``;
* response records: ``WARC-Type: response``, ``WARC-Target-URI``,
  ``WARC-Date`` (ISO-8601, microsecond fraction preserved),
  ``Content-Type: application/http; msgtype=response``; the payload is
  an HTTP/1.1 status + headers + ``\\r\\n\\r\\n`` + html body;
* non-response records (warcinfo, request, metadata) are parsed and
  skipped;
* ``.warc.gz``: one gzip member per record, members concatenated
  (the Common Crawl layout — it makes records independently seekable);
  the parser walks members with ``zlib.decompressobj(wbits=31)`` and
  ``unused_data``.

Scale shape: ``read_warc`` maps a parse task over ``read_binary_files``
blocks — one task per WARC file, streaming across files with Ray Data
backpressure (real crawls shard into ~1 GiB files precisely so that
per-file tasks parallelize).  The html column is dropped at extraction
(same as the Parquet path), so only narrow rows enter the shuffle.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

_CRLF = b"\r\n"


def _warc_date(ts_us: int) -> bytes:
    """Epoch microseconds → ISO-8601 with full microsecond fraction."""
    dt = np.datetime64(int(ts_us), "us")
    return (np.datetime_as_string(dt, unit="us") + "Z").encode()


def _parse_warc_date(s: bytes) -> int:
    """ISO-8601 (optional fraction, trailing Z) → epoch microseconds."""
    t = s.strip().decode()
    if t.endswith("Z"):
        t = t[:-1]
    return int(np.datetime64(t, "us").astype(np.int64))


def encode_record(url: str, ts_us: int, html: bytes,
                  status: bytes = b"200 OK") -> bytes:
    """One WARC/1.0 response record (uncompressed)."""
    http = (b"HTTP/1.1 " + status + _CRLF
            + b"Content-Type: text/html" + _CRLF
            + b"Content-Length: " + str(len(html)).encode() + _CRLF
            + _CRLF + html)
    headers = [
        b"WARC-Type: response",
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: " + _warc_date(ts_us),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode(),
    ]
    return (b"WARC/1.0" + _CRLF + _CRLF.join(headers) + _CRLF + _CRLF
            + http + _CRLF + _CRLF)


def write_warc(path: str, records, gzip_members: bool | None = None
               ) -> int:
    """Write ``(url, ts_us, html)`` triples as a WARC file.

    ``gzip_members`` defaults from the filename (``.gz`` → one gzip
    member per record, the Common Crawl layout).  Returns record count.
    """
    if gzip_members is None:
        gzip_members = path.endswith(".gz")
    n = 0
    with open(path, "wb") as f:
        for url, ts_us, html in records:
            raw = encode_record(url, int(ts_us), bytes(html))
            if gzip_members:
                co = zlib.compressobj(6, zlib.DEFLATED, 31)
                raw = co.compress(raw) + co.flush()
            f.write(raw)
            n += 1
    return n


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (multistream)."""
    out = []
    view = memoryview(data)
    while len(view):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(bytes(view)))
        out.append(d.flush())
        rest = d.unused_data
        if not rest or len(rest) == len(view):
            break
        view = memoryview(rest)
    return b"".join(out)


def decode_warc(data: bytes):
    """Parse WARC bytes → list of ``(url, ts_us, html)`` for response
    records.  Raises ValueError on framing violations (truncated
    payload, missing version line, absent Content-Length)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at byte {pos}")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        headers = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        if b"content-length" not in headers:
            raise ValueError("WARC record without Content-Length")
        length = int(headers[b"content-length"])
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError("truncated WARC payload")
        payload = data[body_start:body_start + length]
        pos = body_start + length
        if headers.get(b"warc-type") == b"response":
            url = headers.get(b"warc-target-uri", b"").decode()
            ts_us = _parse_warc_date(headers.get(b"warc-date", b"1970-01-01"))
            http_end = payload.find(_CRLF + _CRLF)
            html = payload[http_end + 4:] if http_end >= 0 else b""
            out.append((url, ts_us, html))
    return out


def read_warc(paths) -> ray.data.Dataset:
    """Ray Data reader: WARC file(s) → Dataset(url, warc_ts, html).

    One parse task per file block (``read_binary_files``); gzip member
    layout detected per file.  The html stays ``binary`` — callers
    extract and project it away in the next batch stage."""
    ds = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, htmls = [], [], []
        for blob in batch.column("bytes").to_pylist():
            for url, ts_us, html in decode_warc(blob):
                urls.append(url)
                tss.append(ts_us)
                htmls.append(html)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


def warc_to_flat(paths, aux: bool = False) -> ray.data.Dataset:
    """WARC → the flagship's flat signal rows: parse records, extract
    text from html (the byte-identity extractor — here it IS the
    producer of ``text``), parse the signal, drop the wide columns."""
    from nrt_ray.sources.extract import ExtractSignal, extract_text

    def to_text(batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        texts = pa.array([extract_text(h).decode("utf-8")
                          for h in htmls], pa.string())
        return pa.table({"url": batch.column("url"),
                         "warc_ts": batch.column("warc_ts"),
                         "text": texts})

    return read_warc(paths).map_batches(to_text, batch_format="pyarrow") \
        .map_batches(ExtractSignal(aux=aux), batch_format="pyarrow")
