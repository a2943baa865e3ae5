"""WARC (Web ARChive, ISO 28500 / the public WARC 1.1 specification)
record parsing from spec — the container Common Crawl ships the web
in, i.e. the raw input of most LLM pretraining pipelines.

Format (spec section 4): a record is
  ``WARC/1.1\\r\\n`` (or 1.0) + named header fields
  (``WARC-Type``, ``WARC-Record-ID``, ``Content-Length``,
  ``WARC-Target-URI``, ...) + ``\\r\\n`` + exactly Content-Length
  payload bytes + ``\\r\\n\\r\\n``. Records concatenate; the Common
  Crawl convention stores ONE GZIP MEMBER PER RECORD so a reader can
  seek to any record and inflate just it — multi-member gzip decode
  runs through the engine's own RFC-1952 inflater (multimodal/
  inflate.py), whose CRC-32/ISIZE trailers check every member.
  ``response`` records carry an HTTP/1.x message: status line +
  headers + blank line + body, split here with the status code and
  Content-Type surfaced.

At 100 TB: a WARC path DataFrame fans out per task; each task
inflates and parses ITS shard and feeds response bodies straight into
the text-analysis operators in the same Arrow pass — the
Common-Crawl-to-clean-text pipeline with no driver choke point.

Verification: the gzip layer is cross-checked against CPython's gzip
(independent reference, and the fixture WRITER); the WARC framing is
pinned against hand-built byte-exact records in tests and every
structural invariant is loud — bad version line, missing
Content-Length, short payload, missing record terminator, non-CRLF
header line."""

from __future__ import annotations

from cam_etl_spark.multimodal.inflate import gzip_decompress


def split_gzip_members(buf: bytes) -> list[bytes]:
    """Inflate a multi-member gzip stream (the Common Crawl layout:
    one member per WARC record) into the list of member payloads,
    each CRC-32/ISIZE-checked by the engine's own inflater."""
    data, meta = gzip_decompress(buf)
    out = []
    pos = 0
    for m in meta["members"]:
        out.append(data[pos: pos + m["out_size"]])
        pos += m["out_size"]
    return out


def _add_header(headers: dict[str, str], key: str, val: str) -> str:
    """Insert one header field, handling repeats explicitly instead of
    letting a dict overwrite: a repeated field accumulates onto the
    first-seen key as an RFC 9110 comma list — except Content-Length,
    where two CONFLICTING values mean the record length is ambiguous
    and the only safe move is to raise. Returns the dict key the value
    landed on (for folded-continuation bookkeeping)."""
    low = key.lower()
    for k in headers:
        if k.lower() == low:
            if low == "content-length":
                if headers[k].strip() != val.strip():
                    raise ValueError(
                        "warc: conflicting duplicate Content-Length "
                        f"({headers[k]!r} vs {val!r})"
                    )
                return k
            headers[k] += ", " + val
            return k
    headers[key] = val
    return key


def parse_warc_records(buf: bytes) -> list[dict]:
    """Parse concatenated (uncompressed) WARC records. Returns
    [{"version", "headers" (dict, original case preserved; lookup
    helpers lowercase), "payload" (bytes)}]. Repeated header fields
    comma-accumulate onto the first occurrence (conflicting duplicate
    Content-Length raises — see _add_header)."""
    records = []
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record padding some writers leave
        while pos < n and buf[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        eol = buf.index(b"\r\n", pos)
        version = buf[pos:eol].decode("ascii")
        if not version.startswith("WARC/"):
            raise ValueError(
                f"warc: bad version line {version!r} at {pos}"
            )
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise NotImplementedError(
                f"warc: version {version!r} unsupported"
            )
        pos = eol + 2
        headers: dict[str, str] = {}
        last_key: str | None = None
        while True:
            eol = buf.index(b"\r\n", pos)
            line = buf[pos:eol]
            pos = eol + 2
            if not line:
                break
            if line[:1] in (b" ", b"\t"):  # folded continuation
                if last_key is None:
                    raise ValueError("warc: continuation before any "
                                     "header")
                headers[last_key] += " " + line.strip().decode(
                    "utf-8", "replace")
                continue
            key, sep, val = line.partition(b":")
            if not sep:
                raise ValueError(
                    f"warc: malformed header line {line!r}"
                )
            last_key = _add_header(
                headers,
                key.decode("ascii").strip(),
                val.strip().decode("utf-8", "replace"),
            )
        lengths = [v for k, v in headers.items()
                   if k.lower() == "content-length"]
        if not lengths:
            raise ValueError("warc: record without Content-Length")
        length = int(lengths[0])
        payload = buf[pos: pos + length]
        if len(payload) != length:
            raise ValueError(
                f"warc: payload truncated ({len(payload)} of "
                f"{length} bytes)"
            )
        pos += length
        if buf[pos: pos + 4] != b"\r\n\r\n":
            raise ValueError("warc: missing record terminator")
        pos += 4
        records.append({"version": version, "headers": headers,
                        "payload": payload})
    return records


def warc_header(record: dict, name: str) -> str | None:
    """Case-insensitive header lookup."""
    low = name.lower()
    for k, v in record["headers"].items():
        if k.lower() == low:
            return v
    return None


def parse_http_response(payload: bytes) -> dict:
    """Split an HTTP/1.x response message (the payload of a WARC
    ``response`` record): {"status" (int), "headers" (dict), "body"
    (bytes)}. Loud on a malformed status line. Repeated header fields
    (e.g. Set-Cookie) comma-accumulate onto the first occurrence;
    conflicting duplicate Content-Length raises (_add_header)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("warc: http message without header/body "
                         "separator")
    head = payload[:sep].decode("iso-8859-1")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"warc: bad http status line {lines[0]!r}")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        key, _, val = line.partition(":")
        _add_header(headers, key.strip(), val.strip())
    return {
        "status": int(parts[1]),
        "headers": headers,
        "body": payload[sep + 4:],
    }


def write_warc_record(wtype: str, payload: bytes,
                      extra_headers: dict | None = None,
                      version: str = "WARC/1.1") -> bytes:
    """Author one spec-shaped record (the fixture/writer half)."""
    headers = {
        "WARC-Type": wtype,
        "WARC-Record-ID": f"<urn:uuid:{wtype}-{len(payload)}>",
        "Content-Length": str(len(payload)),
    }
    headers.update(extra_headers or {})
    head = (version + "\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in headers.items()) + "\r\n")
    return head.encode("utf-8") + payload + b"\r\n\r\n"
