"""functions/warc.py — ISO 28500 WARC records (the Common Crawl
container)."""

import gzip

import pytest

from pg_logical_replication_spark.functions.warc import (
    build_warc,
    parse_warc,
    split_http_response,
)


def _recs():
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"\r\n<html><body>hello</body></html>"
    )
    return [
        {"type": "warcinfo", "block": b"software: plrs\r\n"},
        {"type": "response", "uri": "https://example.com/a", "block": body},
        {"type": "request", "uri": "https://example.com/a",
         "block": b"GET /a HTTP/1.1\r\nHost: example.com\r\n"},
        {"type": "metadata", "uri": "https://example.com/a",
         "block": b"fetchTimeMs: 12\r\n"},
    ]


def test_roundtrip_plain_and_gzip_members():
    raw = build_warc(_recs())
    parsed = parse_warc(raw)
    assert [r["headers"]["WARC-Type"] for r in parsed] == [
        "warcinfo", "response", "request", "metadata",
    ]
    assert parsed[1]["headers"]["WARC-Target-URI"] == "https://example.com/a"
    assert all(r["version"] == "WARC/1.0" for r in parsed)
    # Common Crawl layout: one gzip member per record
    gz = b"".join(gzip.compress(build_warc([r]), mtime=0) for r in _recs())
    assert parse_warc(gz) == parsed


def test_http_response_split():
    parsed = parse_warc(build_warc(_recs()))
    status, headers, body = split_http_response(parsed[1]["block"])
    assert status == 200
    assert headers["content-type"].startswith("text/html")
    assert body == b"<html><body>hello</body></html>"
    with pytest.raises(ValueError, match="HTTP"):
        split_http_response(b"GET / HTTP/1.1\r\n\r\n")


def test_binary_blocks_survive():
    blob = bytes(range(256)) * 3 + b"\r\n\r\nWARC/1.0\r\n"  # adversarial
    raw = build_warc([{"type": "resource", "block": blob}])
    (rec,) = parse_warc(raw)
    assert rec["block"] == blob  # Content-Length framing, not scanning


def test_framing_violations_raise():
    raw = bytearray(build_warc(_recs()[:1]))
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="truncated|terminator"):
        parse_warc(bytes(raw[:-6]))
    with pytest.raises(ValueError, match="no records"):
        parse_warc(b"\r\n\r\n")
