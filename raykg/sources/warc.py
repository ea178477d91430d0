"""WARC source: Common-Crawl's native container → the pages schema.

WARC (ISO 28500, public format) is the form the north-star corpus actually
arrives in: a sequence of records, each

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...          (headers; Content-Length mandatory)
    \\r\\n
    <Content-Length payload bytes>
    \\r\\n\\r\\n                          (record separator)

``response`` records carry an HTTP response (status line + headers + body)
as payload; the page html is the HTTP body. Common Crawl ships files as
per-record gzip MEMBERS concatenated into one ``.warc.gz`` — a standard
zlib loop decodes member-at-a-time.

Scale shape: one read task per WARC file (``read_warc``); each task
streams its file's records and emits pages-schema rows
(url, warc_ts, html, text, lang). Production splits giant files by the
byte offsets in the CC index (documented; the per-file task is the unit
here). The ``text`` column is filled by the frozen extractor, matching
what an upstream producer supplies; ``lang`` falls back to the heuristic
LangId when no metadata record provides it.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime

import pyarrow as pa

from ..core.textextract import extract_text
from .pages import PAGES_SCHEMA

_CRLF = b"\r\n"


def _decompress_members(data: bytes) -> bytes:
    """Concatenated-gzip-member decode (the CC .warc.gz layout)."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def parse_warc_records(data: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record."""
    if data[:2] == b"\x1f\x8b":
        data = _decompress_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body_start = head_end + 4
        payload = data[body_start:body_start + length]
        yield headers, payload
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """HTTP response payload → body (everything after the header block)."""
    sep = payload.find(_CRLF + _CRLF)
    return payload[sep + 4:] if sep >= 0 else payload


def _parse_warc_date(s: str) -> datetime:
    # WARC-Date is ISO-8601 Zulu: 2025-01-01T00:00:00Z
    return datetime.fromisoformat(s.replace("Z", "+00:00")).replace(tzinfo=None)


def warc_to_pages(data: bytes, default_lang: str = "en") -> pa.Table:
    """One WARC/WET file's bytes → pages-schema rows.

    ``response`` records (WARC): html = HTTP body, text = frozen extractor.
    ``conversion`` records (WET, CC's pre-extracted sibling format): the
    payload IS the text — html stays empty and the text column carries the
    payload verbatim (the extractor is bypassed exactly as a WET-based
    ingestion pipeline would)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for headers, payload in parse_warc_records(data):
        rtype = headers.get("warc-type")
        if rtype not in ("response", "conversion"):
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        if rtype == "response":
            html = _http_body(payload)
            text = extract_text(html)
        else:
            html = b""
            text = payload.decode("utf-8", "replace")
        urls.append(url)
        tss.append(_parse_warc_date(headers.get("warc-date",
                                                "1970-01-01T00:00:00Z")))
        htmls.append(html)
        texts.append(text)
        langs.append(headers.get("warc-identified-content-language",
                                 default_lang).split(",")[0])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }, schema=PAGES_SCHEMA)


def read_warc(paths: list[str] | str):
    """WARC file(s) → pages Dataset: one read task per file, streaming
    record parse inside the task, pages rows out (S-source for the KG
    pipeline: ``extract_stage(read_warc([...]))``)."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [warc_to_pages(b) for b in
                  (bytes(x) for x in batch.column("bytes").to_pylist())]
        return pa.concat_tables(tables) if tables else \
            pa.table({n: [] for n in PAGES_SCHEMA.names}, schema=PAGES_SCHEMA)

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


# -- synthetic WARC writer (tests / fixtures) -------------------------------

def write_warc(path: str, rows: list[dict], compress: bool = False,
               wet: bool = False) -> str:
    """pages-shaped rows → a spec-conformant WARC file (optionally as
    per-record gzip members, the CC layout). ``wet=True`` writes
    ``conversion`` records whose payload is the text column (the WET
    sibling format)."""
    out = io.BytesIO()
    for r in rows:
        if wet:
            http = r["text"].encode("utf-8")
        else:
            body = r["html"]
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF
                    + body)
        ts = r["warc_ts"]
        iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (b"WARC/1.0\r\n"
                b"WARC-Type: " + (b"conversion" if wet else b"response") + _CRLF +
                b"WARC-Target-URI: " + r["url"].encode() + _CRLF +
                b"WARC-Date: " + iso.encode() + _CRLF +
                (b"WARC-Identified-Content-Language: " + r["lang"].encode()
                 + _CRLF if r.get("lang") else b"") +
                b"Content-Length: " + str(len(http)).encode() + _CRLF + _CRLF)
        record = head + http + _CRLF + _CRLF
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
                gz.write(record)
            out.write(buf.getvalue())
        else:
            out.write(record)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return path
