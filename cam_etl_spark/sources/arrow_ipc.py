"""Arrow IPC STREAM reader (round 14) — from the public format specs
(arrow.apache.org/docs/format/Columnar.html: encapsulated message
framing, flatbuffers metadata per Message.fbs/Schema.fbs, and the
validity-bitmap/offsets/data buffer layout), with no Arrow library in
the read path. Hugging Face `datasets` caches, Feather v2 payloads,
and Flight streams all carry this format — for a training-data
engine the .arrow shard is as first-class as .jsonl.zst.

The flatbuffers layer is parsed generically from the wire format
(root offset → vtable → fields; strings/vectors/tables as forward
offsets; unions as a (type, value) field pair; structs inline in
vectors), and the Type union tags follow Schema.fbs declaration
order. Both are pinned behaviorally: pyarrow (the REAL Arrow) writes
every fixture and answers every cross-check, so a wrong vtable read
or a misnumbered union tag fails loudly in tests, never silently.

Supported types: int8/16/32/64 (signed/unsigned), float32/64, bool,
utf8, large_utf8, binary; date32/64 (mind the flatbuffers DateUnit
default = MILLISECOND), timestamps s/ms/us naive or UTC
(timestamp_ns returns raw int64 nanoseconds — Python datetime
cannot carry ns, the engine's nanosAsLong convention), decimal128,
time32/64 and duration (s/ms/us as datetime.time/timedelta;
the ns flavors raw int64 like timestamp_ns), nested
list/large_list/fixed_size_list/struct/map (FieldNodes and
buffers walked depth-first with per-level validity);
dictionary-encoded columns (resolved through their DictionaryBatch,
the HF ClassLabel shape); ZSTD body compression, inflated through
the ENGINE's own RFC-8878 decoder (multimodal/zstd.py); LZ4_FRAME
compression likewise through the engine's own lz4
(multimodal/lz4.py). Boundaries (loud): union/interval/view
types, non-UTC timestamp zones, delta dictionaries, decimal
bit-widths other than 128, and the FILE format's footer (read the
stream-framed body of a file via ``file_to_stream_messages``
instead).
"""

from __future__ import annotations

import struct

_CONT = 0xFFFFFFFF


class _FB:
    """Minimal flatbuffers table cursor over the wire format."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos  # table position
        (soff,) = struct.unpack_from("<i", buf, pos)
        self.vt = pos - soff
        (self.vt_size,) = struct.unpack_from("<H", buf, self.vt)

    def _field_off(self, idx: int) -> int:
        """Byte offset of field ``idx`` from the table position, or
        0 when the field is absent (default)."""
        at = 4 + 2 * idx
        if at + 2 > self.vt_size:
            return 0
        (fo,) = struct.unpack_from("<H", self.buf, self.vt + at)
        return fo

    def scalar(self, idx: int, fmt: str, default):
        fo = self._field_off(idx)
        if not fo:
            return default
        return struct.unpack_from(fmt, self.buf, self.pos + fo)[0]

    def _indirect(self, idx: int) -> int:
        fo = self._field_off(idx)
        if not fo:
            return 0
        at = self.pos + fo
        (rel,) = struct.unpack_from("<I", self.buf, at)
        return at + rel

    def string(self, idx: int) -> str | None:
        tgt = self._indirect(idx)
        if not tgt:
            return None
        (n,) = struct.unpack_from("<I", self.buf, tgt)
        return self.buf[tgt + 4: tgt + 4 + n].decode("utf-8")

    def table(self, idx: int) -> "_FB | None":
        tgt = self._indirect(idx)
        return _FB(self.buf, tgt) if tgt else None

    def vector(self, idx: int) -> tuple[int, int]:
        """(element count, position of element 0); (0, 0) if absent."""
        tgt = self._indirect(idx)
        if not tgt:
            return 0, 0
        (n,) = struct.unpack_from("<I", self.buf, tgt)
        return n, tgt + 4

    def vector_tables(self, idx: int) -> list["_FB"]:
        n, p = self.vector(idx)
        out = []
        for i in range(n):
            (rel,) = struct.unpack_from("<I", self.buf, p + 4 * i)
            out.append(_FB(self.buf, p + 4 * i + rel))
        return out


# Schema.fbs Type union, declaration order (tag 0 = NONE)
_TYPE_TAGS = {
    2: "int", 3: "floatingpoint", 4: "binary", 5: "utf8", 6: "bool",
    7: "decimal", 8: "date", 9: "time", 10: "timestamp",
    18: "duration",
    12: "list", 13: "struct", 16: "fixed_size_list", 17: "map",
    20: "large_utf8", 21: "large_list",
}

_NESTED = ("list", "large_list", "fixed_size_list", "struct", "map")


def _field_desc(f: _FB) -> dict:
    """Resolve one Field into a descriptor TREE:
    {"name", "type", "dict", "children", "list_size"} — nested types
    (list/large_list/fixed_size_list/struct, round 14) carry their
    child Field descriptors; everything else is a leaf. Field.fbs
    order: name(0), nullable(1), type_type(2), type(3),
    dictionary(4), children(5), custom_metadata(6). For a
    dictionary-encoded field the ``type`` field is the VALUE type;
    indices come from DictionaryEncoding.indexType."""
    tag = f.scalar(2, "<B", 0)
    dict_info = None
    enc = f.table(4)
    if enc is not None:
        idx_t = enc.table(1)
        bits = idx_t.scalar(0, "<i", 0) if idx_t else 32
        signed = bool(idx_t.scalar(1, "<B", 1)) if idx_t else True
        if bits not in (8, 16, 32, 64):
            raise NotImplementedError(
                f"arrow-ipc: dictionary index int{bits} unsupported")
        dict_info = {
            "id": enc.scalar(0, "<q", 0),
            "index_type": f"{'int' if signed else 'uint'}{bits}",
        }
    kind = _TYPE_TAGS.get(tag)
    if kind is None:
        raise NotImplementedError(
            f"arrow-ipc: type union tag {tag} unsupported "
            "(union/interval/view types stay loud)")
    t = f.table(3)
    name = f.string(0)
    desc = {"name": name if name is not None else "",
            "type": kind, "dict": dict_info, "children": [],
            "list_size": None}
    if kind in _NESTED:
        if dict_info is not None:
            raise NotImplementedError(
                "arrow-ipc: dictionary-encoded nested field")
        if kind == "fixed_size_list":
            desc["list_size"] = t.scalar(0, "<i", 0)
        desc["children"] = [_field_desc(c)
                            for c in f.vector_tables(5)]
        n_kids = len(desc["children"])
        if kind == "struct":
            if n_kids == 0:
                raise NotImplementedError(
                    "arrow-ipc: empty struct unsupported")
        elif n_kids != 1:
            raise ValueError(
                f"arrow-ipc: {kind} with {n_kids} children")
        if kind == "map":
            # Map.fbs: keysSorted(0); physically a list<entries:
            # struct<key, value>> — the single child must be a
            # 2-child struct
            entries = desc["children"][0]
            if entries["type"] != "struct" \
                    or len(entries["children"]) != 2:
                raise ValueError(
                    "arrow-ipc: map child is not a 2-field struct")
        return desc
    if kind == "int":
        bits = t.scalar(0, "<i", 0)
        signed = bool(t.scalar(1, "<B", 0))
        if bits not in (8, 16, 32, 64):
            raise NotImplementedError(
                f"arrow-ipc: int{bits} unsupported")
        desc["type"] = f"{'int' if signed else 'uint'}{bits}"
        return desc
    if kind == "floatingpoint":
        prec = t.scalar(0, "<h", 0)  # HALF=0, SINGLE=1, DOUBLE=2
        if prec == 1:
            desc["type"] = "float32"
            return desc
        if prec == 2:
            desc["type"] = "float64"
            return desc
        raise NotImplementedError("arrow-ipc: float16 unsupported")
    if kind == "decimal":
        # Decimal.fbs: precision(0), scale(1), bitWidth(2, def 128)
        bits = t.scalar(2, "<i", 128)
        if bits != 128:
            raise NotImplementedError(
                f"arrow-ipc: decimal{bits} unsupported (128 only)")
        desc["type"] = "decimal128"
        desc["scale"] = t.scalar(1, "<i", 0)
        desc["precision"] = t.scalar(0, "<i", 0)
        return desc
    if kind == "date":
        # Date.fbs: "unit: DateUnit = MILLISECOND" — the DEFAULT is
        # MILLISECOND(1), so a date64 field OMITS the unit entirely
        # (flatbuffers drops default-valued fields) while date32
        # writes DAY(0) explicitly
        unit = t.scalar(0, "<h", 1)
        desc["type"] = "date32" if unit == 0 else "date64"
        return desc
    if kind == "timestamp":
        unit = t.scalar(0, "<h", 0)  # s=0, ms=1, us=2, ns=3
        tz = t.string(1)
        if tz not in (None, "", "UTC", "+00:00", "utc"):
            raise NotImplementedError(
                f"arrow-ipc: timestamp timezone {tz!r} unsupported "
                "(naive or UTC only)")
        desc["type"] = f"timestamp_{('s', 'ms', 'us', 'ns')[unit]}"
        desc["tz_utc"] = tz not in (None, "")
        return desc
    if kind == "time":
        # Time.fbs: unit(0) default MILLISECOND(1), bitWidth(1)
        # default 32 — time32 carries s/ms in int32, time64 us/ns
        # in int64
        unit = t.scalar(0, "<h", 1)
        bits = t.scalar(1, "<i", 32)
        if (bits, unit) not in ((32, 0), (32, 1), (64, 2), (64, 3)):
            raise ValueError(
                f"arrow-ipc: time{bits} with unit {unit} invalid")
        desc["type"] = f"time{bits}_{('s', 'ms', 'us', 'ns')[unit]}"
        return desc
    if kind == "duration":
        unit = t.scalar(0, "<h", 1)  # default MILLISECOND
        desc["type"] = f"duration_{('s', 'ms', 'us', 'ns')[unit]}"
        return desc
    return desc


def _type_string(d: dict) -> str:
    if d["type"] == "map":
        entries = d["children"][0]["children"]
        return (f"map<{_type_string(entries[0])}, "
                f"{_type_string(entries[1])}>")
    if d["type"] == "decimal128":
        return f"decimal128({d['precision']}, {d['scale']})"
    if d["type"] == "list" or d["type"] == "large_list":
        return f"list<{_type_string(d['children'][0])}>"
    if d["type"] == "fixed_size_list":
        return (f"fixed_size_list<{_type_string(d['children'][0])}, "
                f"{d['list_size']}>")
    if d["type"] == "struct":
        inner = ", ".join(
            f"{c['name']}: {_type_string(c)}" for c in d["children"])
        return f"struct<{inner}>"
    return d["type"]


def _schema_fields(schema: _FB) -> list[tuple[str, str]]:
    """Schema.fbs: endianness(0), fields(1), custom_metadata(2),
    features(3)."""
    if schema.scalar(0, "<h", 0) != 0:
        raise NotImplementedError(
            "arrow-ipc: big-endian stream unsupported")
    return [_field_desc(f) for f in schema.vector_tables(1)]


def stream_messages(buf: bytes):
    """Yield (header_kind, header_table, body_bytes) per encapsulated
    message: continuation 0xFFFFFFFF, int32 metadata size, flatbuffer
    Message (version(0), header union (1,2), bodyLength(3)), then the
    8-aligned body."""
    pos = 0
    while pos < len(buf):
        if pos + 4 > len(buf):
            raise ValueError("arrow-ipc: stream truncated mid-frame")
        (word,) = struct.unpack_from("<I", buf, pos)
        if word == _CONT:
            if pos + 8 > len(buf):
                raise ValueError(
                    "arrow-ipc: stream truncated mid-frame")
            (mlen,) = struct.unpack_from("<i", buf, pos + 4)
            pos += 8
        else:
            mlen = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        if mlen == 0:
            return  # end-of-stream marker
        meta = buf[pos: pos + mlen]
        if len(meta) != mlen:
            raise ValueError("arrow-ipc: message metadata truncated")
        (root,) = struct.unpack_from("<I", meta, 0)
        msg = _FB(meta, root)
        kind = msg.scalar(1, "<B", 0)  # header union type
        header = msg.table(2)
        body_len = msg.scalar(3, "<q", 0)
        pos += mlen
        body = buf[pos: pos + body_len]
        if len(body) != body_len:
            raise ValueError("arrow-ipc: message body truncated")
        pos += body_len
        yield kind, header, body


_KIND_SCHEMA = 1
_KIND_DICT = 2
_KIND_BATCH = 3

_SCALAR_FMT = {
    "int8": "b", "int16": "h", "int32": "i", "int64": "q",
    "uint8": "B", "uint16": "H", "uint32": "I", "uint64": "Q",
    "float32": "f", "float64": "d",
}


def _bitmap_get(bm: bytes, i: int) -> bool:
    return bool(bm[i >> 3] & (1 << (i & 7)))


_TEMPORAL_FMT = {"date32": "i", "date64": "q", "timestamp_s": "q",
                 "timestamp_ms": "q", "timestamp_us": "q",
                 "timestamp_ns": "q", "time32_s": "i",
                 "time32_ms": "i", "time64_us": "q",
                 "time64_ns": "q", "duration_s": "q",
                 "duration_ms": "q", "duration_us": "q",
                 "duration_ns": "q"}


def _temporal_convert(typ: str, v: int, tz_utc: bool):
    import datetime as _dt

    if typ == "date32":
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
    if typ == "date64":
        return _dt.date(1970, 1, 1) + _dt.timedelta(
            milliseconds=v)
    if typ in ("timestamp_ns", "time64_ns", "duration_ns"):
        # Python datetime/time cannot carry nanoseconds — return the
        # RAW int64 nanoseconds, the same convention as the engine's
        # parquet TIMESTAMP(NANOS) path (nanosAsLong)
        return v
    if typ.startswith("time"):
        if typ.startswith("timestamp"):
            pass  # falls through to the timestamp path below
        else:
            scale = {"time32_s": 1_000_000, "time32_ms": 1_000,
                     "time64_us": 1}[typ]
            return (_dt.datetime(1970, 1, 1)
                    + _dt.timedelta(microseconds=v * scale)).time()
    if typ.startswith("duration"):
        scale = {"duration_s": 1_000_000, "duration_ms": 1_000,
                 "duration_us": 1}[typ]
        return _dt.timedelta(microseconds=v * scale)
    scale = {"timestamp_s": 1_000_000, "timestamp_ms": 1_000,
             "timestamp_us": 1}[typ]
    tz = _dt.timezone.utc if tz_utc else None
    epoch = _dt.datetime(1970, 1, 1, tzinfo=tz)
    return epoch + _dt.timedelta(microseconds=v * scale)


def _decode_column(typ: str, length: int, null_count: int,
                   bufs: list[bytes], desc: dict | None = None):
    """One column's values from its (already materialized)
    RecordBatch buffers: validity bitmap + (offsets +) data, per the
    columnar spec."""
    validity = None
    if null_count:
        if len(bufs[0]) == 0:
            raise ValueError(
                "arrow-ipc: null_count > 0 with empty validity")
        validity = bufs[0]
    if typ in _TEMPORAL_FMT:
        fmt = _TEMPORAL_FMT[typ]
        vals = struct.unpack_from(f"<{length}{fmt}", bufs[1], 0)
        tz_utc = bool(desc and desc.get("tz_utc"))
        return [
            None if validity is not None and not _bitmap_get(validity, i)
            else _temporal_convert(typ, v, tz_utc)
            for i, v in enumerate(vals)
        ]
    if typ == "decimal128":
        import decimal as _dec

        scale = desc["scale"] if desc else 0
        data = bufs[1]
        out = []
        for i in range(length):
            if validity is not None and not _bitmap_get(validity, i):
                out.append(None)
                continue
            raw = int.from_bytes(data[16 * i: 16 * (i + 1)],
                                 "little", signed=True)
            out.append(_dec.Decimal(raw).scaleb(-scale))
        return out
    if typ == "bool":
        data = bufs[1]
        return [
            None if validity is not None and not _bitmap_get(validity, i)
            else _bitmap_get(data, i)
            for i in range(length)
        ]
    if typ in _SCALAR_FMT:
        fmt = _SCALAR_FMT[typ]
        vals = struct.unpack_from(f"<{length}{fmt}", bufs[1], 0)
        if validity is None:
            return list(vals)
        return [v if _bitmap_get(validity, i) else None
                for i, v in enumerate(vals)]
    if typ in ("utf8", "binary", "large_utf8"):
        wide = typ == "large_utf8"
        data = bufs[2]
        n_off = length + 1
        offs = struct.unpack_from(
            f"<{n_off}{'q' if wide else 'i'}", bufs[1], 0)
        out = []
        for i in range(length):
            if validity is not None and not _bitmap_get(validity, i):
                out.append(None)
                continue
            raw = data[offs[i]: offs[i + 1]]
            out.append(raw if typ == "binary"
                       else raw.decode("utf-8"))
        return out
    raise NotImplementedError(f"arrow-ipc: type {typ!r} unsupported")


def _batch_parts(header: _FB, body: bytes):
    """(length, nodes, materialized buffer list) of one RecordBatch
    table — RecordBatch.fbs: length(0), nodes(1), buffers(2),
    compression(3). BodyCompression(codec(0), method(1)): ZSTD and
    LZ4_FRAME buffers decompress through the ENGINE's own decoders
    (multimodal/zstd.py, multimodal/lz4.py); each buffer is an
    int64 uncompressed-length prefix + frame, -1 marks a raw
    buffer."""
    codec = None
    comp = header.table(3)
    if comp is not None:
        c = comp.scalar(0, "<b", 0)  # LZ4_FRAME=0, ZSTD=1
        if c == 1:
            codec = "zstd"
        elif c == 0:
            codec = "lz4"
        else:
            raise ValueError(
                f"arrow-ipc: unknown body compression codec {c}")
        if comp.scalar(1, "<b", 0) != 0:
            raise NotImplementedError(
                "arrow-ipc: non-BUFFER compression method")
    length = header.scalar(0, "<q", 0)
    n_nodes, p_nodes = header.vector(1)
    n_bufs, p_bufs = header.vector(2)
    nodes = [struct.unpack_from("<qq", header.buf, p_nodes + 16 * i)
             for i in range(n_nodes)]
    mat: list[bytes] = []
    for i in range(n_bufs):
        off, blen = struct.unpack_from("<qq", header.buf,
                                       p_bufs + 16 * i)
        raw = body[off: off + blen]
        if len(raw) != blen:
            raise ValueError("arrow-ipc: buffer overruns the body")
        if codec is None or blen == 0:
            mat.append(raw)
            continue
        (unc_len,) = struct.unpack_from("<q", raw, 0)
        if unc_len == -1:  # stored raw past the prefix
            mat.append(raw[8:])
            continue
        if codec == "zstd":
            from cam_etl_spark.multimodal.zstd import zstd_decompress

            out = zstd_decompress(raw[8:])
        else:
            from cam_etl_spark.multimodal.lz4 import (
                lz4_frame_decompress,
            )

            out = lz4_frame_decompress(raw[8:])
        if len(out) != unc_len:
            raise ValueError(
                f"arrow-ipc: {codec} buffer decompressed to "
                f"{len(out)} bytes, prefix declared {unc_len}")
        mat.append(out)
    return length, nodes, mat


def _read_field(desc: dict, nodes, bufs, ni: int, bi: int,
                dicts: dict):
    """Decode one field (recursively for nested types), consuming
    FieldNodes and buffers depth-first exactly as the columnar spec
    lays them out. Returns (values, next_node_idx, next_buf_idx)."""
    length, nulls = nodes[ni]
    ni += 1
    phys = desc["dict"]["index_type"] if desc["dict"] else desc["type"]
    if phys in _NESTED:
        validity = None
        vbuf = bufs[bi]
        bi += 1
        if nulls:
            if len(vbuf) == 0:
                raise ValueError(
                    "arrow-ipc: null_count > 0 with empty validity")
            validity = vbuf
        if phys == "map":
            # physically list<struct<key, value>>: validity +
            # int32 offsets, then the entries struct
            obuf = bufs[bi]
            bi += 1
            offs = struct.unpack_from(f"<{length + 1}i", obuf, 0)
            entries, ni, bi = _read_field(desc["children"][0],
                                          nodes, bufs, ni, bi,
                                          dicts)
            kname = desc["children"][0]["children"][0]["name"]
            vname = desc["children"][0]["children"][1]["name"]
            vals = [
                None if validity is not None
                and not _bitmap_get(validity, i)
                else [(e[kname], e[vname])
                      for e in entries[offs[i]: offs[i + 1]]]
                for i in range(length)
            ]
        elif phys in ("list", "large_list"):
            wide = phys == "large_list"
            obuf = bufs[bi]
            bi += 1
            offs = struct.unpack_from(
                f"<{length + 1}{'q' if wide else 'i'}", obuf, 0)
            child, ni, bi = _read_field(desc["children"][0], nodes,
                                        bufs, ni, bi, dicts)
            vals = [
                None if validity is not None
                and not _bitmap_get(validity, i)
                else child[offs[i]: offs[i + 1]]
                for i in range(length)
            ]
        elif phys == "fixed_size_list":
            k = desc["list_size"]
            child, ni, bi = _read_field(desc["children"][0], nodes,
                                        bufs, ni, bi, dicts)
            vals = [
                None if validity is not None
                and not _bitmap_get(validity, i)
                else child[i * k: (i + 1) * k]
                for i in range(length)
            ]
        else:  # struct
            kids = []
            for c in desc["children"]:
                v, ni, bi = _read_field(c, nodes, bufs, ni, bi,
                                        dicts)
                kids.append((c["name"], v))
            vals = [
                None if validity is not None
                and not _bitmap_get(validity, i)
                else {n: v[i] for n, v in kids}
                for i in range(length)
            ]
        return vals, ni, bi
    need = 3 if phys in ("utf8", "binary", "large_utf8") else 2
    vals = _decode_column(phys, length, nulls, bufs[bi: bi + need],
                          desc if not desc["dict"] else None)
    bi += need
    if desc["dict"]:
        did = desc["dict"]["id"]
        if did not in dicts:
            raise ValueError(
                f"arrow-ipc: record batch references dictionary "
                f"{did} before its DictionaryBatch")
        dvals = dicts[did]
        vals = [None if v is None else dvals[v] for v in vals]
    return vals, ni, bi


def _decode_batch_columns(fields, header: _FB, body: bytes,
                          dicts: dict):
    """All top-level columns of one RecordBatch, dictionary indices
    mapped through their resolved dictionaries, nested fields walked
    depth-first."""
    length, nodes, mat = _batch_parts(header, body)
    cols = []
    ni = bi = 0
    for desc in fields:
        if ni >= len(nodes):
            raise ValueError("arrow-ipc: ran out of field nodes")
        if nodes[ni][0] != length:
            raise ValueError(
                f"arrow-ipc: field {desc['name']!r} node length "
                f"{nodes[ni][0]} != batch length {length}")
        vals, ni, bi = _read_field(desc, nodes, mat, ni, bi, dicts)
        cols.append(vals)
    if ni != len(nodes) or bi != len(mat):
        raise ValueError(
            f"arrow-ipc: consumed {ni}/{len(nodes)} nodes and "
            f"{bi}/{len(mat)} buffers — layout mismatch")
    return length, cols


def read_stream(buf: bytes) -> tuple[list[tuple[str, str]],
                                     list[list]]:
    """Decode a whole IPC stream: ([(name, type)], rows). Row-major
    output so the caller feeds pandas/Spark directly.
    Dictionary-encoded columns come back as their VALUE type (the
    indices are resolved through the DictionaryBatch messages);
    delta dictionaries stay loud."""
    fields = None
    dicts: dict[int, list] = {}
    rows: list[list] = []
    for kind, header, body in stream_messages(buf):
        if kind == _KIND_SCHEMA:
            if fields is not None:
                raise ValueError("arrow-ipc: duplicate schema message")
            fields = _schema_fields(header)
            continue
        if fields is None:
            raise ValueError(
                "arrow-ipc: record batch before schema")
        if kind == _KIND_DICT:
            # DictionaryBatch.fbs: id(0), data(1: RecordBatch),
            # isDelta(2). The payload batch has ONE column of the
            # dictionary's value type.
            if header.scalar(2, "<B", 0):
                raise NotImplementedError(
                    "arrow-ipc: delta dictionary unsupported")
            did = header.scalar(0, "<q", 0)
            owners = [d for d in fields
                      if d["dict"] and d["dict"]["id"] == did]
            if not owners:
                raise ValueError(
                    f"arrow-ipc: DictionaryBatch id {did} matches "
                    "no schema field")
            vdesc = dict(owners[0], dict=None)
            data = header.table(1)
            _n, cols = _decode_batch_columns([vdesc], data, body, {})
            dicts[did] = cols[0]
            continue
        if kind != _KIND_BATCH:
            raise NotImplementedError(
                f"arrow-ipc: message header kind {kind} unsupported")
        length, cols = _decode_batch_columns(fields, header, body,
                                             dicts)
        rows.extend([c[i] for c in cols] for i in range(length))
    if fields is None:
        raise ValueError("arrow-ipc: no schema message in stream")
    return [(d["name"], _type_string(d)) for d in fields], rows


def file_to_stream_messages(buf: bytes) -> bytes:
    """The Arrow FILE format (Feather v2) is 'ARROW1' magic + the
    same stream-framed messages + a footer; slice out the stream
    portion so read_stream handles both containers."""
    if buf[:6] != b"ARROW1" or buf[-6:] != b"ARROW1":
        raise ValueError("arrow-ipc: not an Arrow file (magic)")
    # footer: ...| footer flatbuffer | int32 footer size | magic
    (fsize,) = struct.unpack_from("<i", buf, len(buf) - 10)
    start = 8  # magic + padding to 8
    end = len(buf) - 10 - fsize
    return buf[start:end]
