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
    ingestion pipeline would).

    Thin wrapper over the streaming converter so the record→row semantics
    live in exactly one place (``_records_to_pages``)."""
    tables = list(_records_to_pages(parse_warc_records(data), default_lang))
    return pa.concat_tables(tables) if tables else PAGES_SCHEMA.empty_table()


# -- streaming record iterator (bounded memory per task) --------------------

_READ_CHUNK = 1 << 20          # 1 MiB compressed reads
_EMIT_ROWS = 512               # rows per emitted pages block


_BAD = object()          # malformed-head sentinel


def _try_parse_record(buf: bytearray, pos: int):
    """Parse ONE complete record out of ``buf`` starting at ``pos``.

    Returns (headers, payload, next_pos); None when the buffer does not yet
    hold the whole record (caller feeds more data); (_BAD, ...) on a
    malformed record head."""
    n = len(buf)
    while buf[pos:pos + 2] == _CRLF:
        pos += 2
    if pos >= n:
        return None
    head_end = buf.find(_CRLF + _CRLF, pos)
    if head_end < 0:
        return None
    head = buf[pos:head_end].decode("utf-8", "replace")
    lines = head.split("\r\n")
    if not lines or not lines[0].startswith("WARC/"):
        return (_BAD, b"", n)
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    length = int(headers.get("content-length", "0"))
    body_start = head_end + 4
    if body_start + length > n:
        return None
    return headers, bytes(buf[body_start:body_start + length]), body_start + length


def iter_warc_records(fileobj, limit: int | None = None):
    """Stream (headers, payload) records from a WARC / .warc.gz file object,
    reading at most ``limit`` COMPRESSED bytes (None = to EOF) and holding
    only the current record + one read chunk in memory — never the file.

    Gzip members are decoded member-at-a-time with a restarting
    ``zlib.decompressobj`` (the CC .warc.gz layout concatenates one member
    per record); plain WARC bytes pass straight through."""
    remaining = limit
    first = fileobj.read(2 if remaining is None else min(2, remaining))
    if remaining is not None:
        remaining -= len(first)
    gz = first == b"\x1f\x8b"
    d = zlib.decompressobj(wbits=31) if gz else None
    buf = bytearray()

    def feed(chunk: bytes) -> None:
        nonlocal d
        if not gz:
            buf.extend(chunk)
            return
        data = chunk
        while data:
            buf.extend(d.decompress(data))
            if d.eof:                      # member boundary -> restart decoder
                data = d.unused_data
                d = zlib.decompressobj(wbits=31)
            else:
                data = b""

    feed(first)
    eof = not first
    pos = 0
    while True:
        got = _try_parse_record(buf, pos)
        if got is not None:
            headers, payload, pos = got
            if headers is _BAD:
                return
            yield headers, payload
            continue
        if pos:                            # compact consumed prefix
            del buf[:pos]
            pos = 0
        if eof:
            return
        want = _READ_CHUNK if remaining is None else min(_READ_CHUNK, remaining)
        chunk = fileobj.read(want) if want > 0 else b""
        if not chunk:
            eof = True
            continue
        if remaining is not None:
            remaining -= len(chunk)
        feed(chunk)


def _records_to_pages(records, default_lang: str = "en"):
    """Streaming analogue of ``warc_to_pages``: yields pages-schema Tables of
    ≤ _EMIT_ROWS rows so a giant input never becomes one giant block."""
    urls, tss, htmls, texts, langs = [], [], [], [], []

    def flush():
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }, schema=PAGES_SCHEMA)

    for headers, payload in records:
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
        if len(urls) >= _EMIT_ROWS:
            yield flush()
            urls, tss, htmls, texts, langs = [], [], [], [], []
    if urls:
        yield flush()


_GZ_MAGIC = b"\x1f\x8b\x08"
_VERIFY_BYTES = 512


def _find_member_start(f, offset: int, end: int | None) -> int | None:
    """Scan raw bytes from ``offset`` for the next VERIFIED gzip member
    start. The magic triple can occur INSIDE compressed data, so each
    candidate is checked by actually decompressing a little and requiring
    the output to open with ``WARC/``. Returns the absolute offset, or
    None when no member starts in [offset, end). Bounded memory: a sliding
    window of ~2 read chunks."""
    f.seek(offset)
    window = bytearray()
    win_start = offset
    scanned = 0
    eof = False
    while True:
        while not eof and len(window) < scanned + _READ_CHUNK:
            chunk = f.read(_READ_CHUNK)
            if not chunk:
                eof = True
            else:
                window.extend(chunk)
        i = window.find(_GZ_MAGIC, scanned)
        if i < 0:
            if eof:
                return None
            keep = len(_GZ_MAGIC) - 1
            drop = len(window) - keep
            if drop > 0:
                del window[:drop]
                win_start += drop
            scanned = 0
            continue
        ab = win_start + i
        if end is not None and ab >= end:
            return None
        while not eof and len(window) < i + _VERIFY_BYTES:
            chunk = f.read(_READ_CHUNK)
            if not chunk:
                eof = True
            else:
                window.extend(chunk)
        d = zlib.decompressobj(wbits=31)
        try:
            probe = d.decompress(bytes(window[i:i + _VERIFY_BYTES]), 16)
        except zlib.error:
            probe = b""
        if probe.startswith(b"WARC/"):
            return ab
        # trim past the refuted candidate: without this, data dense in
        # false \x1f\x8b\x08 triples grows the window to O(range length)
        # — the docstring's ~2-chunk bound must hold on the failure path
        # too, not just when a chunk has no candidate at all (ADVICE r4)
        del window[:i + 1]
        win_start = ab + 1
        scanned = 0


def _iter_gzip_members(f, start: int):
    """Yield (member_start_abs, decompressed_bytes) member-at-a-time from
    absolute offset ``start`` (must be a member boundary). A final member
    truncated by EOF is dropped. Memory: one member + one read chunk."""
    f.seek(start)
    raw = b""
    abs0 = start                       # absolute offset of raw[0]
    while True:
        d = zlib.decompressobj(wbits=31)
        out = bytearray()
        mstart = abs0
        while not d.eof:
            if not raw:
                raw = f.read(_READ_CHUNK)
                if not raw:
                    return             # EOF (mid-member = truncated, drop)
            out.extend(d.decompress(raw))
            consumed = len(raw) - len(d.unused_data)
            abs0 += consumed
            raw = d.unused_data
        yield mstart, bytes(out)


def _iter_gzip_records_ranged(f, offset: int, end: int | None):
    """Arbitrary byte-range split over a .warc.gz: yields every record
    whose gzip member STARTS in [offset, end) — the classic split-reader
    contract (a record belongs to the split holding its first byte; the
    reader resyncs past a mid-member ``offset`` and reads PAST ``end`` only
    to finish a record already begun), so ANY set of cut points partitions
    a file exactly, no CC index required (property-tested against the
    whole-file read). Bounded memory: one member + one record."""
    start = offset if offset == 0 else _find_member_start(f, offset, end)
    if start is None or (end is not None and start >= end):
        return
    buf = bytearray()
    pos = 0
    base = 0                   # decompressed offset of buf[0]
    range_end_decomp = None    # decompressed size of the in-range members

    def eff_start() -> int:
        # a record's true start skips inter-record CRLF padding — the
        # boundary tests must use it, or a CRLF-only tail would drag the
        # overflow member's first record into this split (double count)
        e = pos
        while buf[e:e + 2] == _CRLF:
            e += 2
        return e

    for mstart, data in _iter_gzip_members(f, start):
        if end is not None and mstart >= end:
            if range_end_decomp is None:
                range_end_decomp = base + len(buf)
            if eff_start() >= len(buf):    # nothing mid-parse: done
                return
        buf.extend(data)
        while True:
            if range_end_decomp is not None and \
                    base + eff_start() >= range_end_decomp:
                return                     # next record starts out of range
            got = _try_parse_record(buf, pos)
            if got is None:
                break
            headers, payload, npos = got
            if headers is _BAD:
                return
            yield headers, payload
            pos = npos
        if range_end_decomp is not None and eff_start() >= len(buf):
            return                         # pending record completed
        if pos:
            base += pos
            del buf[:pos]
            pos = 0


def read_warc_splits(units: list[dict]):
    """Byte-range work units → pages Dataset (VERDICT r2 #6, the scale
    path).

    Each unit is ``{"path": str, "offset": int, "length": int}``. For
    .warc.gz inputs the offsets may be ARBITRARY cut points — CC-index
    record units (every record its own member at a known offset/length)
    and index-free even splits of a huge file both decode exactly, via the
    member-resync reader above. Plain-WARC units must start on record
    boundaries (no resync marker exists in the uncompressed stream).
    ``length`` ≤ 0 / missing means "to EOF" (whole-file unit). One task per
    unit; per-task memory is O(read chunk + one record), never O(file)."""
    import ray.data as rd

    def parse(batch: pa.Table):
        empty = True
        for path, offset, length in zip(batch.column("path").to_pylist(),
                                        batch.column("offset").to_pylist(),
                                        batch.column("length").to_pylist()):
            with open(path, "rb") as f:
                gz = f.read(2) == b"\x1f\x8b"
                f.seek(0)
                if gz:
                    end = offset + length if length and length > 0 else None
                    records = _iter_gzip_records_ranged(f, offset, end)
                else:
                    if offset:
                        f.seek(offset)
                    limit = length if length and length > 0 else None
                    records = iter_warc_records(f, limit)
                for tbl in _records_to_pages(records):
                    empty = False
                    yield tbl
        if empty:
            yield pa.table({n: [] for n in PAGES_SCHEMA.names},
                           schema=PAGES_SCHEMA)

    items = pa.table({
        "path": pa.array([str(u["path"]) for u in units], pa.string()),
        "offset": pa.array([int(u.get("offset", 0)) for u in units], pa.int64()),
        "length": pa.array([int(u.get("length", 0)) for u in units], pa.int64()),
    })
    return rd.from_arrow(items).map_batches(parse, batch_format="pyarrow",
                                            batch_size=1)


def read_warc(paths: list[str] | str, split_bytes: int | None = None):
    """WARC file(s) → pages Dataset (S-source for the KG pipeline:
    ``extract_stage(read_warc([...]))``).

    Default: one streaming read task per file (whole-file units through
    the byte-range reader — same bounded-memory path). ``split_bytes``
    cuts each .warc.gz into even byte ranges for INDEX-FREE intra-file
    parallelism — the member-resync reader makes arbitrary cut points
    exact, so a single 1-GiB CC segment fans out across the cluster with
    no sidecar index. With a CC index in hand, call ``read_warc_splits``
    directly."""
    import os

    if isinstance(paths, str):
        if os.path.isdir(paths):
            # regular files only: a CC dump dir can hold subdirectories
            # and index sidecars that are not WARC payloads
            paths = [p for p in (os.path.join(paths, f)
                                 for f in sorted(os.listdir(paths)))
                     if os.path.isfile(p)]
        else:
            paths = [paths]
    units = []
    for p in paths:
        size = os.path.getsize(p)
        with open(p, "rb") as f:
            gz = f.read(2) == b"\x1f\x8b"
        if split_bytes and gz and size > split_bytes:
            units.extend({"path": p, "offset": o,
                          "length": min(split_bytes, size - o)}
                         for o in range(0, size, split_bytes))
        else:
            units.append({"path": p})
    return read_warc_splits(units)


# -- synthetic WARC writer (tests / fixtures) -------------------------------

def write_warc(path: str, rows: list[dict], compress: bool = False,
               wet: bool = False, index: list | None = None) -> str:
    """pages-shaped rows → a spec-conformant WARC file (optionally as
    per-record gzip members, the CC layout). ``wet=True`` writes
    ``conversion`` records whose payload is the text column (the WET
    sibling format). ``index`` (optional list) receives one
    ``(offset, length)`` per record — the CC-index shape that
    ``read_warc_splits`` consumes."""
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
        start = out.tell()
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
                gz.write(record)
            out.write(buf.getvalue())
        else:
            out.write(record)
        if index is not None:
            index.append((start, out.tell() - start))
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return path
