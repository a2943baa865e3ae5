"""WARC parsing (sources/warc.py): byte-exact fixtures, the
Common-Crawl one-gzip-member-per-record layout through the engine's
own inflater (stdlib gzip as the independent writer), HTTP response
splitting, and loud boundaries."""
import gzip

import pytest

from cam_etl_spark.sources.warc import (
    parse_http_response,
    parse_warc_records,
    split_gzip_members,
    warc_header,
    write_warc_record,
)


def _records():
    body = "<html><body>café crawl</body></html>".encode()
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
            b"charset=utf-8\r\n\r\n" + body)
    return [
        write_warc_record("warcinfo", b"software: engine-test\r\n",
                          version="WARC/1.0"),
        write_warc_record(
            "request",
            b"GET /page HTTP/1.1\r\nHost: example.org\r\n\r\n",
            {"WARC-Target-URI": "http://example.org/page"}),
        write_warc_record(
            "response", http,
            {"WARC-Target-URI": "http://example.org/page"}),
    ], body


def test_concatenated_and_gzip_member_layouts():
    recs, body = _records()
    # uncompressed concatenation
    parsed = parse_warc_records(b"".join(recs))
    assert [warc_header(r, "WARC-TYPE") for r in parsed] == \
        ["warcinfo", "request", "response"]
    assert parsed[0]["version"] == "WARC/1.0"
    # Common Crawl layout: one gzip member per record
    blob = b"".join(gzip.compress(r) for r in recs)
    members = split_gzip_members(blob)
    assert members == recs
    resp = parse_http_response(parse_warc_records(members[2])[0]
                               ["payload"])
    assert resp["status"] == 200
    assert resp["body"] == body
    assert resp["headers"]["Content-Type"].startswith("text/html")


def test_header_folding_and_case():
    rec = (b"WARC/1.1\r\nWARC-Type: metadata\r\n"
           b"X-Long: first part\r\n\t and folded\r\n"
           b"content-length: 2\r\n\r\nhi\r\n\r\n")
    (r,) = parse_warc_records(rec)
    assert r["headers"]["X-Long"] == "first part and folded"
    assert warc_header(r, "Content-Length") == "2"
    assert r["payload"] == b"hi"


def test_loud_boundaries():
    recs, _ = _records()
    good = b"".join(recs)
    with pytest.raises(ValueError, match="bad version line"):
        parse_warc_records(b"HTTP/1.1 200\r\n\r\n")
    with pytest.raises(NotImplementedError, match="WARC/0.18"):
        parse_warc_records(b"WARC/0.18\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_records(good[:-10])
    no_len = (b"WARC/1.1\r\nWARC-Type: metadata\r\n\r\nhi\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_records(no_len)
    bad_term = good[:-4] + b"XXXX"
    with pytest.raises(ValueError, match="terminator"):
        parse_warc_records(bad_term)
    with pytest.raises(ValueError, match="separator"):
        parse_http_response(b"HTTP/1.1 200 OK\r\nno blank line")
    with pytest.raises(ValueError, match="status line"):
        parse_http_response(b"garbage\r\n\r\nbody")


def test_repeated_headers_accumulate_and_conflict():
    # repeated non-length fields comma-accumulate (RFC 9110 list
    # semantics) onto the first occurrence, case-insensitively
    rec = (b"WARC/1.1\r\nWARC-Type: metadata\r\n"
           b"X-Tag: a\r\nx-tag: b\r\n"
           b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    (r,) = parse_warc_records(rec)
    assert r["headers"]["X-Tag"] == "a, b"
    # equal duplicate Content-Length is harmless and deduplicates
    rec2 = (b"WARC/1.1\r\nWARC-Type: metadata\r\n"
            b"Content-Length: 2\r\ncontent-length: 2\r\n\r\n"
            b"hi\r\n\r\n")
    (r2,) = parse_warc_records(rec2)
    assert r2["payload"] == b"hi"
    # CONFLICTING duplicate Content-Length is ambiguous -> loud
    rec3 = (b"WARC/1.1\r\nWARC-Type: metadata\r\n"
            b"Content-Length: 2\r\nContent-Length: 4\r\n\r\n"
            b"hi\r\n\r\n")
    with pytest.raises(ValueError, match="conflicting duplicate"):
        parse_warc_records(rec3)
    # same semantics inside the HTTP message parser (Set-Cookie)
    http = (b"HTTP/1.1 200 OK\r\nSet-Cookie: a=1\r\n"
            b"Set-Cookie: b=2\r\n\r\nbody")
    resp = parse_http_response(http)
    assert resp["headers"]["Set-Cookie"] == "a=1, b=2"
    with pytest.raises(ValueError, match="conflicting duplicate"):
        parse_http_response(b"HTTP/1.1 200 OK\r\n"
                            b"Content-Length: 1\r\n"
                            b"Content-Length: 9\r\n\r\nbody")
