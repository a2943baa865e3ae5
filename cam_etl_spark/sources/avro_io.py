"""Apache Avro object container files FROM SPEC (Avro 1.12
specification: "Binary Encoding" and "Object Container Files") — a
pure-python encoder/decoder for the container format and the complete
binary encoding: null / boolean / int / long / float / double / bytes
/ string, records, enums, fixed, arrays, maps, unions, named-type
references, and logical types — annotations are preserved on the
parsed schema and, with ``logical=True`` on the container API,
MATERIALIZED both directions by the spec's closed-form mappings
(to_logical / from_logical): decimal, date, time-millis/micros,
timestamp-millis/micros, local-timestamp-millis/micros, uuid;
unknown annotations fall back to the underlying type as the spec
requires.

NOTHING here is a vendored table: zigzag varints, IEEE-754 little-
endian floats, length-prefixed bytes, and the block framing are all
given in closed form by the spec. Round 12 adds the SINGLE-OBJECT
encoding (C3 01 marker + CRC-64-AVRO fingerprint of the Parsing
Canonical Form + binary body — the Kafka per-message framing),
byte-identical to the Java library's BinaryMessageEncoder. Codecs: ``null``; ``deflate`` (raw
RFC 1951 — decoded by the engine's own from-spec inflater, encoded as
always-valid STORED blocks); ``snappy`` (block + 4-byte big-endian
CRC-32 of the uncompressed bytes, per the spec — decoded by the
engine's own from-spec snappy decoder, encoded all-literal);
``zstandard`` (one RFC-8878 frame per block — decoded by the
engine's own from-spec zstd decoder, multimodal/zstd.py, round 11;
cross-checked against real zstd-jni blocks from the Java writer).

Verification is stronger than self-round-trip: the Spark distribution
ships the REAL Apache Avro Java library (avro-1.12.1.jar) on the JVM
classpath, so tests/test_avro.py cross-checks BOTH directions against
it via py4j — files this module writes are read by
org.apache.avro.file.DataFileReader, and files written by
org.apache.avro.file.DataFileWriter (including real-deflate blocks)
are decoded by this module. CPython's zlib provides a second
independent reference for the deflate codec path.

Why it's in the engine: Avro is the de-facto wire format of Kafka and
of many lake ingestion logs; a 100 TB pipeline decodes container
files inside the same Arrow mapInPandas pass that does quality
scoring — per-task, no driver involvement, no JVM round-trips.

Boundaries (loud): unknown codecs, bad magic, sync-marker mismatch,
union/enum indices out of range, negative lengths and truncated
buffers all raise ValueError naming the check. Writer scope mirrors
reader scope (the full binary encoding); int values are range-checked.

Reference parity: the reference repo (cam-etl) reads CSV/JSON/
shapefiles only (see SURVEY.md §2.1); Avro extends the engine's
source surface the same way the from-spec parquet reader/writer did
in round 8 (sources/parquet_meta.py, parquet_write.py).
"""

from __future__ import annotations

import hashlib
import json
import struct

from cam_etl_spark.multimodal.inflate import crc32, inflate

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}

INT_MIN, INT_MAX = -(2**31), 2**31 - 1
LONG_MIN, LONG_MAX = -(2**63), 2**63 - 1


# ---------------------------------------------------------------------------
# Schema parsing (JSON -> normalized dict with named-type resolution)
# ---------------------------------------------------------------------------


def parse_schema(schema_json, names: dict | None = None):
    """Normalize an Avro schema (JSON string / dict / list) into a
    dict tree: {"type": ..., ...}. Named types (record/enum/fixed) are
    registered in ``names`` (fullname -> parsed) so later references
    by name resolve; a reference is returned as the registered dict
    (shared, enabling recursive schemas)."""
    if names is None:
        names = {}
    if isinstance(schema_json, str) and schema_json.lstrip()[:1] in "[{\"":
        try:
            schema_json = json.loads(schema_json)
        except json.JSONDecodeError as ex:
            raise ValueError(f"avro: bad schema JSON: {ex}") from None
    if isinstance(schema_json, str):
        if schema_json in _PRIMITIVES:
            return {"type": schema_json}
        if schema_json in names:
            return names[schema_json]
        short = {k.rsplit(".", 1)[-1]: v for k, v in names.items()}
        if schema_json in short:
            return short[schema_json]
        raise ValueError(f"avro: unknown type name {schema_json!r}")
    if isinstance(schema_json, list):
        return {
            "type": "union",
            "branches": [parse_schema(b, names) for b in schema_json],
        }
    if not isinstance(schema_json, dict):
        raise ValueError(f"avro: bad schema node {schema_json!r}")
    t = schema_json.get("type")
    if isinstance(t, (dict, list)):
        # {"type": {...}} wrapper (legal per spec)
        return parse_schema(t, names)
    if t in _PRIMITIVES:
        out = {"type": t}
        if "logicalType" in schema_json:
            out["logicalType"] = schema_json["logicalType"]
            for k in ("precision", "scale"):
                if k in schema_json:
                    out[k] = int(schema_json[k])
        return out
    if t in ("record", "enum", "fixed"):
        name = schema_json.get("name")
        if not name:
            raise ValueError(f"avro: {t} without a name")
        ns = schema_json.get("namespace")
        fullname = f"{ns}.{name}" if ns and "." not in name else name
        out = {"type": t, "name": fullname}
        names[fullname] = out
        if t == "record":
            out["fields"] = [
                {
                    "name": f["name"],
                    "schema": parse_schema(f["type"], names),
                    **(
                        {"default": f["default"]}
                        if "default" in f
                        else {}
                    ),
                }
                for f in schema_json.get("fields", [])
            ]
        elif t == "enum":
            out["symbols"] = list(schema_json["symbols"])
        else:  # fixed
            out["size"] = int(schema_json["size"])
            if "logicalType" in schema_json:
                out["logicalType"] = schema_json["logicalType"]
                for k in ("precision", "scale"):
                    if k in schema_json:
                        out[k] = int(schema_json[k])
        return out
    if t == "array":
        return {"type": "array", "items": parse_schema(schema_json["items"], names)}
    if t == "map":
        return {"type": "map", "values": parse_schema(schema_json["values"], names)}
    raise ValueError(f"avro: unknown schema type {t!r}")


# ---------------------------------------------------------------------------
# Binary encoding primitives
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        if n < 0:
            raise ValueError("avro: negative length")
        if self.pos + n > len(self.buf):
            raise ValueError("avro: truncated buffer")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("avro: truncated varint")
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("avro: varint too long")
        return (acc >> 1) ^ -(acc & 1)  # zigzag


class _Writer:
    __slots__ = ("out",)

    def __init__(self):
        self.out = bytearray()

    def long(self, v: int):
        if not LONG_MIN <= v <= LONG_MAX:
            raise ValueError(f"avro: long out of range: {v}")
        u = (v << 1) ^ (v >> 63)  # zigzag (arithmetic shift keeps sign)
        u &= (1 << 64) - 1
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return


def decode_value(r: _Reader, s: dict):
    t = s["type"]
    if t == "null":
        return None
    if t == "boolean":
        b = r.take(1)[0]
        if b > 1:
            raise ValueError(f"avro: bad boolean byte {b}")
        return bool(b)
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.take(4))[0]
    if t == "double":
        return struct.unpack("<d", r.take(8))[0]
    if t == "bytes":
        return bytes(r.take(r.long()))
    if t == "string":
        return r.take(r.long()).decode("utf-8")
    if t == "record":
        return {f["name"]: decode_value(r, f["schema"]) for f in s["fields"]}
    if t == "enum":
        idx = r.long()
        syms = s["symbols"]
        if not 0 <= idx < len(syms):
            raise ValueError(f"avro: enum index {idx} out of range")
        return syms[idx]
    if t == "fixed":
        return bytes(r.take(s["size"]))
    if t == "union":
        idx = r.long()
        if not 0 <= idx < len(s["branches"]):
            raise ValueError(f"avro: union index {idx} out of range")
        return decode_value(r, s["branches"][idx])
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # size-prefixed block
                n = -n
                r.long()  # byte size (skippable hint)
            for _ in range(n):
                out.append(decode_value(r, s["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.take(r.long()).decode("utf-8")
                out[k] = decode_value(r, s["values"])
    raise ValueError(f"avro: cannot decode type {t!r}")


def _union_branch(s: dict, value):
    """Pick the union branch for a python value (null + one-of is the
    common shape; otherwise first type-compatible branch)."""
    for i, b in enumerate(s["branches"]):
        t = b["type"]
        if value is None and t == "null":
            return i, b
        if value is None:
            continue
        if t == "boolean" and isinstance(value, bool):
            return i, b
        if t in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
            # An int branch can only hold 32-bit values; fall through to
            # a long branch for wider ints (["int","long"] unions must
            # not pick "int" for 2^31 and fail downstream).
            if t == "int" and not INT_MIN <= value <= INT_MAX:
                continue
            return i, b
        if t in ("float", "double") and isinstance(value, float):
            return i, b
        if t == "string" and isinstance(value, str):
            return i, b
        if t in ("bytes", "fixed") and isinstance(value, (bytes, bytearray)):
            return i, b
        if t == "record" and isinstance(value, dict):
            return i, b
        if t == "map" and isinstance(value, dict):
            return i, b
        if t == "array" and isinstance(value, list):
            return i, b
        if t == "enum" and isinstance(value, str):
            return i, b
    raise ValueError(f"avro: no union branch for {type(value).__name__}")


def encode_value(w: _Writer, s: dict, value):
    t = s["type"]
    if t == "null":
        if value is not None:
            raise ValueError("avro: non-null value for null type")
        return
    if t == "boolean":
        w.out.append(1 if value else 0)
        return
    if t == "int":
        if not INT_MIN <= value <= INT_MAX:
            raise ValueError(f"avro: int out of range: {value}")
        w.long(value)
        return
    if t == "long":
        w.long(value)
        return
    if t == "float":
        w.out += struct.pack("<f", value)
        return
    if t == "double":
        w.out += struct.pack("<d", value)
        return
    if t == "bytes":
        w.long(len(value))
        w.out += value
        return
    if t == "string":
        raw = value.encode("utf-8")
        w.long(len(raw))
        w.out += raw
        return
    if t == "record":
        for f in s["fields"]:
            if f["name"] not in value:
                raise ValueError(f"avro: missing field {f['name']!r}")
            encode_value(w, f["schema"], value[f["name"]])
        return
    if t == "enum":
        try:
            w.long(s["symbols"].index(value))
        except ValueError:
            raise ValueError(f"avro: {value!r} not in enum") from None
        return
    if t == "fixed":
        if len(value) != s["size"]:
            raise ValueError("avro: fixed size mismatch")
        w.out += value
        return
    if t == "union":
        idx, b = _union_branch(s, value)
        w.long(idx)
        encode_value(w, b, value)
        return
    if t == "array":
        if value:
            w.long(len(value))
            for item in value:
                encode_value(w, s["items"], item)
        w.long(0)
        return
    if t == "map":
        if value:
            w.long(len(value))
            for k, v in value.items():
                raw = k.encode("utf-8")
                w.long(len(raw))
                w.out += raw
                encode_value(w, s["values"], v)
        w.long(0)
        return
    raise ValueError(f"avro: cannot encode type {t!r}")


# ---------------------------------------------------------------------------
# Schema resolution (the spec's "Schema Resolution" rules: reading data
# written with an OLD schema through a NEW reader schema — added fields
# take defaults, removed fields are skipped, int->long->float->double
# and string<->bytes promote, unions resolve branch-by-branch)
# ---------------------------------------------------------------------------

_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"), ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


def _schemas_match(w: dict, rd: dict) -> bool:
    tw, tr = w["type"], rd["type"]
    if tw == tr:
        if tw in ("record", "enum", "fixed"):
            return w["name"].rsplit(".", 1)[-1] == rd["name"].rsplit(
                ".", 1
            )[-1]
        return True
    return (tw, tr) in _PROMOTIONS


def _promote(value, tw: str, tr: str):
    if tw == tr:
        return value
    if tr in ("long",):
        return int(value)
    if tr in ("float", "double"):
        return float(value)
    if tr == "bytes":
        return value.encode("utf-8")
    if tr == "string":
        return value.decode("utf-8")
    raise ValueError(f"avro: cannot promote {tw} to {tr}")


def default_value(schema: dict, dv):
    """Materialize a field default (JSON-encoded per the spec; bytes
    defaults are latin-1-coded strings; union defaults type against
    the FIRST branch)."""
    t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return bool(dv)
    if t in ("int", "long"):
        return int(dv)
    if t in ("float", "double"):
        return float(dv)
    if t == "string" or t == "enum":
        return dv
    if t in ("bytes", "fixed"):
        return dv.encode("latin-1") if isinstance(dv, str) else dv
    if t == "array":
        return [default_value(schema["items"], x) for x in dv]
    if t == "map":
        return {k: default_value(schema["values"], v) for k, v in dv.items()}
    if t == "union":
        return default_value(schema["branches"][0], dv)
    if t == "record":
        out = {}
        for f in schema["fields"]:
            if f["name"] in dv:
                out[f["name"]] = default_value(f["schema"], dv[f["name"]])
            elif "default" in f:
                out[f["name"]] = default_value(f["schema"], f["default"])
            else:
                raise ValueError(
                    f"avro: record default missing field {f['name']!r}"
                )
        return out
    raise ValueError(f"avro: no default rule for {t!r}")


def decode_resolved(r: _Reader, w: dict, rd: dict):
    """Decode a value written with schema ``w`` through reader schema
    ``rd`` per the spec's resolution rules."""
    tw = w["type"]
    if tw == "union":
        idx = r.long()
        if not 0 <= idx < len(w["branches"]):
            raise ValueError(f"avro: union index {idx} out of range")
        return decode_resolved(r, w["branches"][idx], rd)
    if rd["type"] == "union":
        for branch in rd["branches"]:
            if _schemas_match(w, branch):
                return decode_resolved(r, w, branch)
        raise ValueError(
            f"avro: writer type {tw!r} matches no reader union branch"
        )
    tr = rd["type"]
    if tw == "record" and tr == "record":
        reader_by_name = {f["name"]: f for f in rd["fields"]}
        out = {}
        for f in w["fields"]:
            if f["name"] in reader_by_name:
                out[f["name"]] = decode_resolved(
                    r, f["schema"], reader_by_name[f["name"]]["schema"]
                )
            else:
                decode_value(r, f["schema"])  # skip removed field
        writer_names = {f["name"] for f in w["fields"]}
        for f in rd["fields"]:
            if f["name"] not in writer_names:
                if "default" not in f:
                    raise ValueError(
                        f"avro: new field {f['name']!r} has no default"
                    )
                out[f["name"]] = default_value(f["schema"], f["default"])
        return out
    if tw == "enum" and tr == "enum":
        idx = r.long()
        syms = w["symbols"]
        if not 0 <= idx < len(syms):
            raise ValueError(f"avro: enum index {idx} out of range")
        sym = syms[idx]
        if sym not in rd["symbols"]:
            raise ValueError(
                f"avro: writer symbol {sym!r} not in reader enum"
            )
        return sym
    if tw == "array" and tr == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                out.append(decode_resolved(r, w["items"], rd["items"]))
    if tw == "map" and tr == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.take(r.long()).decode("utf-8")
                out[k] = decode_resolved(r, w["values"], rd["values"])
    if tw == "fixed" and tr == "fixed":
        if w["size"] != rd["size"]:
            raise ValueError("avro: fixed size mismatch in resolution")
        return bytes(r.take(w["size"]))
    if not _schemas_match(w, rd):
        raise ValueError(f"avro: cannot resolve {tw!r} against {tr!r}")
    return _promote(decode_value(r, w), tw, tr)


# ---------------------------------------------------------------------------
# Codecs (container-block compression)
# ---------------------------------------------------------------------------


def deflate_stored(raw: bytes) -> bytes:
    """Valid raw-DEFLATE stream using STORED blocks only (RFC 1951
    §3.2.4) — a compliant, compression-free encoding every inflater
    must accept (the Java reference reader verifies this in tests)."""
    out = bytearray()
    pos = 0
    while True:
        chunk = raw[pos : pos + 65535]
        pos += len(chunk)
        final = pos >= len(raw)
        out.append(0x01 if final else 0x00)  # BFINAL | BTYPE=00
        out += struct.pack("<HH", len(chunk), len(chunk) ^ 0xFFFF)
        out += chunk
        if final:
            return bytes(out)


def _decompress_block(codec: str, raw: bytes) -> bytes:
    if codec == "null":
        return raw
    if codec == "deflate":
        payload, meta = inflate(raw, 0)
        if meta["end"] != len(raw):
            raise ValueError("avro: trailing bytes after deflate block")
        return payload
    if codec == "snappy":
        if len(raw) < 4:
            raise ValueError("avro: snappy block too short for CRC")
        from cam_etl_spark.sources.parquet_pages import snappy_decompress

        payload = snappy_decompress(raw[:-4])
        want = struct.unpack(">I", raw[-4:])[0]
        if crc32(payload) != want:
            raise ValueError("avro: snappy block CRC mismatch")
        return payload
    if codec == "zstandard":
        # the avro spec's zstd codec: one RFC-8878 frame per block,
        # decoded by the engine's own decoder (round 11)
        from cam_etl_spark.multimodal.zstd import zstd_decompress

        return zstd_decompress(raw)
    if codec == "bzip2":
        # spec: each block is one bzip2 stream (format-internal
        # CRCs) — decoded by the engine's own from-format decoder
        # (round 13; stdlib bz2 remains the write-side referee)
        from cam_etl_spark.multimodal.bzip2 import bz2_decompress

        return bz2_decompress(raw)
    if codec == "xz":
        # spec: each block is one xz stream — decoded by the
        # engine's own from-spec LZMA2/XZ decoder (round 13; stdlib
        # lzma remains the write-side referee)
        from cam_etl_spark.multimodal.xz import xz_decompress

        return xz_decompress(raw)
    raise ValueError(f"avro: unknown codec {codec!r}")


def _compress_block(codec: str, raw: bytes) -> bytes:
    if codec == "null":
        return raw
    if codec == "deflate":
        return deflate_stored(raw)
    if codec == "snappy":
        from cam_etl_spark.sources.parquet_write import snappy_compress_literal

        return snappy_compress_literal(raw) + struct.pack(">I", crc32(raw))
    if codec == "bzip2":
        import bz2

        return bz2.compress(raw)
    if codec == "xz":
        import lzma

        return lzma.compress(raw, format=lzma.FORMAT_XZ)
    raise ValueError(f"avro: unknown codec {codec!r}")


# ---------------------------------------------------------------------------
# Logical types (spec "Logical Types"): closed-form mappings between
# the underlying binary values and their logical Python forms —
# decimal (bytes/fixed two's-complement big-endian unscaled + scale),
# date (days since epoch), time-millis/micros, timestamp-millis/
# micros (UTC instants), local-timestamp-millis/micros (naive), uuid
# (RFC-4122 string).  Unknown logical annotations pass through as
# their underlying type, exactly as the spec requires of readers.
# ---------------------------------------------------------------------------

_EPOCH_DATE = None  # initialized lazily to keep import light


def _logical_ctx():
    global _EPOCH_DATE
    import datetime
    import decimal
    import uuid

    if _EPOCH_DATE is None:
        _EPOCH_DATE = datetime.date(1970, 1, 1)
    return datetime, decimal, uuid


def _decimal_scale(s: dict) -> int:
    return int(s.get("scale", 0))


def to_logical(schema, value):
    """Decoded underlying value -> logical Python value, recursively.
    ``schema`` is a parsed-schema dict (parse_schema output)."""
    datetime, decimal, uuid = _logical_ctx()
    s = schema
    t = s["type"]
    if t == "record":
        return {
            f["name"]: to_logical(f["schema"], value[f["name"]])
            for f in s["fields"]
        }
    if t == "array":
        return [to_logical(s["items"], v) for v in value]
    if t == "map":
        return {k: to_logical(s["values"], v) for k, v in value.items()}
    if t == "union":
        if value is None:
            return None
        non_null = [b for b in s["branches"] if b["type"] != "null"]
        if len(non_null) == 1:
            return to_logical(non_null[0], value)
        if any("logicalType" in b for b in non_null):
            raise NotImplementedError(
                "avro: logical types inside multi-branch unions are "
                "ambiguous after decode"
            )
        return value
    lt = s.get("logicalType")
    if lt is None:
        return value
    if lt == "decimal" and t in ("bytes", "fixed"):
        unscaled = int.from_bytes(value, "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-_decimal_scale(s))
    if lt == "date" and t == "int":
        return _EPOCH_DATE + datetime.timedelta(days=value)
    if lt == "time-millis" and t == "int":
        return (
            datetime.datetime.min + datetime.timedelta(milliseconds=value)
        ).time()
    if lt == "time-micros" and t == "long":
        return (
            datetime.datetime.min + datetime.timedelta(microseconds=value)
        ).time()
    if lt in ("timestamp-millis", "timestamp-micros") and t == "long":
        unit = 1000 if lt == "timestamp-millis" else 1
        base = datetime.datetime(
            1970, 1, 1, tzinfo=datetime.timezone.utc
        )
        return base + datetime.timedelta(microseconds=value * unit)
    if (
        lt in ("local-timestamp-millis", "local-timestamp-micros")
        and t == "long"
    ):
        unit = 1000 if lt == "local-timestamp-millis" else 1
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=value * unit
        )
    if lt == "uuid" and t == "string":
        return uuid.UUID(value)
    return value  # unknown annotation: underlying value, per spec


def from_logical(schema, value):
    """Logical Python value -> underlying value ready for
    encode_value, recursively. Inverse of to_logical; range and
    precision violations raise ValueError."""
    datetime, decimal, uuid = _logical_ctx()
    s = schema
    t = s["type"]
    if t == "record":
        return {
            f["name"]: from_logical(f["schema"], value[f["name"]])
            for f in s["fields"]
        }
    if t == "array":
        return [from_logical(s["items"], v) for v in value]
    if t == "map":
        return {k: from_logical(s["values"], v) for k, v in value.items()}
    if t == "union":
        if value is None:
            return None
        non_null = [b for b in s["branches"] if b["type"] != "null"]
        if len(non_null) == 1:
            return from_logical(non_null[0], value)
        if any("logicalType" in b for b in non_null):
            raise NotImplementedError(
                "avro: logical types inside multi-branch unions are "
                "ambiguous"
            )
        return value
    lt = s.get("logicalType")
    if lt is None:
        return value
    if lt == "decimal" and t in ("bytes", "fixed"):
        if not isinstance(value, decimal.Decimal):
            raise ValueError(
                f"avro: decimal logical type needs Decimal, got "
                f"{type(value).__name__}"
            )
        scale = _decimal_scale(s)
        unscaled = int(value.scaleb(scale).to_integral_exact())
        if decimal.Decimal(unscaled).scaleb(-scale) != value:
            raise ValueError(
                f"avro: {value} does not fit scale {scale} exactly"
            )
        prec = s.get("precision")
        if prec is not None and len(str(abs(unscaled))) > prec:
            raise ValueError(
                f"avro: unscaled {unscaled} exceeds precision {prec}"
            )
        n_bytes = max(1, (unscaled.bit_length() + 8) // 8)
        if t == "fixed":
            n_bytes = s["size"]
        try:
            return unscaled.to_bytes(n_bytes, "big", signed=True)
        except OverflowError:
            raise ValueError(
                f"avro: decimal {value} does not fit fixed({n_bytes})"
            ) from None
    if lt == "date" and t == "int":
        return (value - _EPOCH_DATE).days
    if lt == "time-millis" and t == "int":
        return (
            value.hour * 3600 + value.minute * 60 + value.second
        ) * 1000 + value.microsecond // 1000
    if lt == "time-micros" and t == "long":
        return (
            value.hour * 3600 + value.minute * 60 + value.second
        ) * 1_000_000 + value.microsecond
    if lt in ("timestamp-millis", "timestamp-micros") and t == "long":
        if value.tzinfo is None:
            raise ValueError(
                "avro: timestamp logical types take tz-aware datetimes "
                "(use local-timestamp-* for naive)"
            )
        base = datetime.datetime(
            1970, 1, 1, tzinfo=datetime.timezone.utc
        )
        delta = value - base
        micros = (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )
        if lt == "timestamp-millis":
            if micros % 1000:
                raise ValueError(
                    "avro: sub-millisecond instant in timestamp-millis"
                )
            return micros // 1000
        return micros
    if (
        lt in ("local-timestamp-millis", "local-timestamp-micros")
        and t == "long"
    ):
        if value.tzinfo is not None:
            raise ValueError(
                "avro: local-timestamp logical types take naive "
                "datetimes"
            )
        delta = value - datetime.datetime(1970, 1, 1)
        micros = (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )
        if lt == "local-timestamp-millis":
            if micros % 1000:
                raise ValueError(
                    "avro: sub-millisecond instant in "
                    "local-timestamp-millis"
                )
            return micros // 1000
        return micros
    if lt == "uuid" and t == "string":
        return str(value)
    return value


# ---------------------------------------------------------------------------
# Object container files
# ---------------------------------------------------------------------------


def write_container(
    schema_json,
    values,
    codec: str = "null",
    objects_per_block: int = 1000,
    sync: bytes | None = None,
    logical: bool = False,
) -> bytes:
    """Serialize ``values`` (python objects matching the schema) into
    a complete Avro object container file. Deterministic: the sync
    marker defaults to the md5 of the canonical schema text, so equal
    inputs produce byte-identical files (a distributed writer wants
    reproducible task output for retry idempotence). With
    ``logical=True`` values are given in their logical Python forms
    (Decimal/date/time/datetime/UUID — see from_logical)."""
    schema = parse_schema(schema_json)
    if logical:
        values = [from_logical(schema, v) for v in values]
    schema_text = (
        schema_json if isinstance(schema_json, str) else json.dumps(schema_json)
    )
    if sync is None:
        sync = hashlib.md5(schema_text.encode("utf-8")).digest()
    if len(sync) != 16:
        raise ValueError("avro: sync marker must be 16 bytes")
    _compress_block(codec, b"")  # validate codec name up front

    w = _Writer()
    w.out += MAGIC
    meta = {
        "avro.schema": schema_text.encode("utf-8"),
        "avro.codec": codec.encode("ascii"),
    }
    w.long(len(meta))
    for k, v in sorted(meta.items()):
        raw = k.encode("utf-8")
        w.long(len(raw))
        w.out += raw
        w.long(len(v))
        w.out += v
    w.long(0)
    w.out += sync

    values = list(values)
    for start in range(0, len(values), objects_per_block):
        block = values[start : start + objects_per_block]
        bw = _Writer()
        for v in block:
            encode_value(bw, schema, v)
        body = _compress_block(codec, bytes(bw.out))
        w.long(len(block))
        w.long(len(body))
        w.out += body
        w.out += sync
    return bytes(w.out)


def read_container(
    buf: bytes, reader_schema=None, logical: bool = False
) -> dict:
    """Parse a complete Avro object container file. Returns
    {"schema": <json text>, "codec": str, "meta": {k: bytes},
    "values": [...], "n_blocks": int}. With ``reader_schema`` the
    values are decoded through the spec's schema-resolution rules
    (the file's embedded schema is the WRITER schema). With
    ``logical=True`` annotated values materialize as their logical
    Python forms (to_logical)."""
    if buf[:4] != MAGIC:
        raise ValueError("avro: bad magic")
    r = _Reader(buf, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.take(r.long()).decode("utf-8")
            meta[k] = bytes(r.take(r.long()))
    sync = bytes(r.take(16))
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema metadata")
    schema_text = meta["avro.schema"].decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("ascii")
    schema = parse_schema(schema_text)
    rschema = (
        parse_schema(reader_schema) if reader_schema is not None else None
    )

    values = []
    n_blocks = 0
    while r.pos < len(buf):
        count = r.long()
        if count < 0:
            raise ValueError("avro: negative object count in block")
        size = r.long()
        body = _decompress_block(codec, bytes(r.take(size)))
        got_sync = bytes(r.take(16))
        if got_sync != sync:
            raise ValueError("avro: sync marker mismatch")
        br = _Reader(body)
        for _ in range(count):
            if rschema is None:
                values.append(decode_value(br, schema))
            else:
                values.append(decode_resolved(br, schema, rschema))
        if br.pos != len(body):
            raise ValueError("avro: trailing bytes in block")
        n_blocks += 1
    if logical:
        lschema = rschema if rschema is not None else schema
        values = [to_logical(lschema, v) for v in values]
    return {
        "schema": schema_text,
        "codec": codec,
        "meta": meta,
        "values": values,
        "n_blocks": n_blocks,
    }


# ---------------------------------------------------------------------------
# Single-object encoding (Avro spec "Single-object encoding"): the
# Kafka-style per-message framing — marker C3 01, 8-byte little-endian
# CRC-64-AVRO fingerprint of the schema's Parsing Canonical Form, then
# the plain binary-encoded body. Both halves are from spec and both
# are cross-checked against the REAL Avro Java library on Spark's
# classpath (org.apache.avro.SchemaNormalization.toParsingForm /
# parsingFingerprint64) in tests/test_avro.py.
# ---------------------------------------------------------------------------

_PRIMITIVE_NAMES = frozenset(
    {"null", "boolean", "int", "long", "float", "double", "bytes",
     "string"}
)


def parsing_canonical_form(schema) -> str:
    """Avro spec "Parsing Canonical Form for Schemas": fullnames,
    only the structural attributes (type/name/fields/symbols/items/
    values/size) in the spec's field order, no whitespace."""
    import json as _json

    if isinstance(schema, (bytes, str)):
        text = schema.decode() if isinstance(schema, bytes) else schema
        stripped = text.lstrip()
        if stripped[:1] in ("{", "["):
            schema = _json.loads(text)
        elif stripped.startswith('"'):
            schema = _json.loads(text)
        else:
            schema = text.strip()

    def full(name: str, ns: str | None) -> str:
        return name if "." in name or not ns else f"{ns}.{name}"

    def walk(s, ns: str | None) -> str:
        if isinstance(s, str):
            if s in _PRIMITIVE_NAMES:
                return f'"{s}"'
            return f'"{full(s, ns)}"'
        if isinstance(s, list):
            return "[" + ",".join(walk(b, ns) for b in s) + "]"
        if not isinstance(s, dict):
            raise ValueError(f"avro: bad schema node {s!r}")
        t = s["type"]
        if isinstance(t, (dict, list)):
            # {"type": <schema>} wrapper — canonicalize the inner
            return walk(t, ns)
        if t in _PRIMITIVE_NAMES:
            return f'"{t}"'
        if t == "record":
            own_ns = s.get("namespace", ns)
            fname = full(s["name"], s.get("namespace", ns))
            child_ns = fname.rsplit(".", 1)[0] if "." in fname \
                else own_ns
            fields = ",".join(
                '{"name":"%s","type":%s}' % (
                    f["name"], walk(f["type"], child_ns))
                for f in s["fields"]
            )
            return ('{"name":"%s","type":"record","fields":[%s]}'
                    % (fname, fields))
        if t == "enum":
            fname = full(s["name"], s.get("namespace", ns))
            syms = ",".join(f'"{x}"' for x in s["symbols"])
            return ('{"name":"%s","type":"enum","symbols":[%s]}'
                    % (fname, syms))
        if t == "fixed":
            fname = full(s["name"], s.get("namespace", ns))
            return ('{"name":"%s","type":"fixed","size":%d}'
                    % (fname, int(s["size"])))
        if t == "array":
            return '{"type":"array","items":%s}' % walk(s["items"], ns)
        if t == "map":
            return '{"type":"map","values":%s}' % walk(s["values"], ns)
        # a named-type reference spelled as {"type": "Some.Name"}
        return f'"{full(t, ns)}"'

    return walk(schema, None)


_CRC64_EMPTY = 0xC15D213AA4D7A795
_CRC64_TABLE: list[int] | None = None


def rabin_fingerprint64(data: bytes) -> int:
    """CRC-64-AVRO (the spec's 64-bit Rabin fingerprint; table
    generated from the spec's own pseudo-code, nothing vendored)."""
    global _CRC64_TABLE
    if _CRC64_TABLE is None:
        table = []
        for i in range(256):
            fp = i
            for _ in range(8):
                fp = (fp >> 1) ^ (_CRC64_EMPTY & -(fp & 1))
            table.append(fp)
        _CRC64_TABLE = table
    fp = _CRC64_EMPTY
    for b in data:
        fp = (fp >> 8) ^ _CRC64_TABLE[(fp ^ b) & 0xFF]
    return fp


def schema_fingerprint(schema) -> int:
    """CRC-64-AVRO of the schema's Parsing Canonical Form — the id a
    single-object message carries and a schema registry keys on."""
    return rabin_fingerprint64(
        parsing_canonical_form(schema).encode("utf-8"))


def write_single_object(value, schema) -> bytes:
    """One value as an Avro single-object message (C3 01 + LE
    fingerprint + binary body)."""
    parsed = parse_schema(schema)
    w = _Writer()
    encode_value(w, parsed, value)
    return (b"\xc3\x01"
            + schema_fingerprint(schema).to_bytes(8, "little")
            + bytes(w.out))


def read_single_object(buf: bytes, schemas):
    """Decode one single-object message. ``schemas`` is either a
    single schema (its fingerprint must match the message) or a
    {fingerprint: schema} registry dict. Returns (value,
    fingerprint). Loud: bad marker, unknown fingerprint, trailing
    bytes."""
    if len(buf) < 10 or buf[:2] != b"\xc3\x01":
        raise ValueError(
            f"avro: bad single-object marker {buf[:2].hex()}"
        )
    fp = int.from_bytes(buf[2:10], "little")
    if isinstance(schemas, dict) and "type" not in schemas:
        reg = schemas  # a {fingerprint: schema} registry
    else:
        reg = {schema_fingerprint(schemas): schemas}
    if fp not in reg:
        raise ValueError(
            f"avro: single-object fingerprint {fp:#018x} not in the "
            f"schema registry ({len(reg)} known)"
        )
    parsed = parse_schema(reg[fp])
    r = _Reader(buf[10:])
    value = decode_value(r, parsed)
    if r.pos != len(buf) - 10:
        raise ValueError(
            f"avro: {len(buf) - 10 - r.pos} trailing bytes after "
            "single-object body"
        )
    return value, fp
