"""WARC (Web ARChive, ISO 28500) record parser, stdlib-only.

The container format of Common Crawl and most web-scrape corpora — the
single most common input of large-scale text-pipeline ingestion. A WARC
file is a concatenation of records::

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n

:func:`parse_warc` splits a (possibly multi-record) WARC byte buffer
into records with parsed headers and raw blocks; :func:`build_warc`
writes spec-valid records (used by the synthesized-corpus oracle and as
a real writer). HTTP response blocks can be further split with
:func:`split_http_response`.

Gzip-per-record WARCs (``.warc.gz`` with member-per-record, the Common
Crawl layout) are handled transparently: the buffer is de-membered with
stdlib zlib when it starts with the gzip magic.
"""

from __future__ import annotations

import zlib


def build_warc(records: list[dict]) -> bytes:
    """records = [{'type': 'response', 'uri': ..., 'id': ...,
    'date': ..., 'block': bytes, ...extra headers}] → WARC bytes."""
    out = bytearray()
    for r in records:
        block = r.get("block", b"")
        hdrs = [
            ("WARC-Type", r.get("type", "response")),
            ("WARC-Record-ID", r.get("id", "<urn:uuid:0>")),
            ("WARC-Date", r.get("date", "2026-01-01T00:00:00Z")),
            ("Content-Length", str(len(block))),
        ]
        if r.get("uri"):
            hdrs.insert(1, ("WARC-Target-URI", r["uri"]))
        for k, v in r.items():
            if k not in ("type", "uri", "id", "date", "block"):
                hdrs.append((k, str(v)))
        out += b"WARC/1.0\r\n"
        for k, v in hdrs:
            out += f"{k}: {v}\r\n".encode()
        out += b"\r\n"
        out += block
        out += b"\r\n\r\n"
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members (the .warc.gz record-per-member
    layout) → concatenated plain bytes."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        out += d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("warc: bad gzip member")
        pos += consumed
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes → [{'version', 'headers': {..}, 'block': bytes}].

    Tolerates the record-per-gzip-member layout, enforces the
    Content-Length framing and the record-terminating CRLF CRLF.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding newlines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        eol = data.index(b"\r\n", pos)
        version = data[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"warc: bad version line {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.index(b"\r\n", pos)
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.decode("ascii").strip()] = v.decode(
                "utf-8", "replace"
            ).strip()
        length = int(headers.get("Content-Length", "0"))
        block = data[pos : pos + length]
        if len(block) != length:
            raise ValueError("warc: truncated block")
        pos += length
        if data[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("warc: missing record terminator")
        pos += 4
        records.append(
            {"version": version, "headers": headers, "block": block}
        )
    if not records:
        raise ValueError("warc: no records")
    return records


def split_http_response(block: bytes) -> tuple[int, dict, bytes]:
    """An HTTP response block (WARC-Type: response payloads) →
    (status, headers, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("warc: no HTTP header terminator")
    head = block[:sep].decode("latin-1").split("\r\n")
    status_line = head[0].split(" ", 2)
    if not status_line[0].startswith("HTTP/"):
        raise ValueError("warc: not an HTTP response block")
    status = int(status_line[1])
    headers = {}
    for line in head[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, block[sep + 4 :]
