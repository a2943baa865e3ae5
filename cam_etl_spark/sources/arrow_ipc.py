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
utf8, large_utf8, binary. Boundaries (loud): dictionary batches,
body compression (LZ4_FRAME/ZSTD), nested types (list/struct/map),
and the FILE format's footer (read the stream-framed body of a file
via ``file_to_stream_messages`` instead).
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
    20: "large_utf8",
}


def _field_type(f: _FB) -> str:
    """Resolve one Field's logical type name. Field.fbs order:
    name(0), nullable(1), type_type(2), type(3), dictionary(4),
    children(5), custom_metadata(6)."""
    tag = f.scalar(2, "<B", 0)
    if f.table(4) is not None:
        raise NotImplementedError(
            "arrow-ipc: dictionary-encoded field unsupported")
    kind = _TYPE_TAGS.get(tag)
    if kind is None:
        raise NotImplementedError(
            f"arrow-ipc: type union tag {tag} unsupported "
            "(scalars/strings only; nested types stay loud)")
    t = f.table(3)
    if kind == "int":
        bits = t.scalar(0, "<i", 0)
        signed = bool(t.scalar(1, "<B", 0))
        if bits not in (8, 16, 32, 64):
            raise NotImplementedError(
                f"arrow-ipc: int{bits} unsupported")
        return f"{'int' if signed else 'uint'}{bits}"
    if kind == "floatingpoint":
        prec = t.scalar(0, "<h", 0)  # HALF=0, SINGLE=1, DOUBLE=2
        if prec == 1:
            return "float32"
        if prec == 2:
            return "float64"
        raise NotImplementedError("arrow-ipc: float16 unsupported")
    return kind


def _schema_fields(schema: _FB) -> list[tuple[str, str]]:
    """Schema.fbs: endianness(0), fields(1), custom_metadata(2),
    features(3)."""
    if schema.scalar(0, "<h", 0) != 0:
        raise NotImplementedError(
            "arrow-ipc: big-endian stream unsupported")
    out = []
    for f in schema.vector_tables(1):
        name = f.string(0)
        out.append((name if name is not None else "", _field_type(f)))
    return out


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


def _decode_column(body: bytes, typ: str, length: int,
                   null_count: int, bufs: list[tuple[int, int]]):
    """One column's values from its RecordBatch buffers: validity
    bitmap + (offsets +) data, per the columnar spec."""
    validity = None
    off0, len0 = bufs[0]
    if null_count:
        if len0 == 0:
            raise ValueError(
                "arrow-ipc: null_count > 0 with empty validity")
        validity = body[off0: off0 + len0]
    if typ == "bool":
        off1, len1 = bufs[1]
        data = body[off1: off1 + len1]
        return [
            None if validity is not None and not _bitmap_get(validity, i)
            else _bitmap_get(data, i)
            for i in range(length)
        ]
    if typ in _SCALAR_FMT:
        fmt = _SCALAR_FMT[typ]
        off1, _len1 = bufs[1]
        vals = struct.unpack_from(f"<{length}{fmt}", body, off1)
        if validity is None:
            return list(vals)
        return [v if _bitmap_get(validity, i) else None
                for i, v in enumerate(vals)]
    if typ in ("utf8", "binary", "large_utf8"):
        wide = typ == "large_utf8"
        off1, _l1 = bufs[1]
        off2, _l2 = bufs[2]
        n_off = length + 1
        offs = struct.unpack_from(
            f"<{n_off}{'q' if wide else 'i'}", body, off1)
        out = []
        for i in range(length):
            if validity is not None and not _bitmap_get(validity, i):
                out.append(None)
                continue
            raw = body[off2 + offs[i]: off2 + offs[i + 1]]
            out.append(raw if typ == "binary"
                       else raw.decode("utf-8"))
        return out
    raise NotImplementedError(f"arrow-ipc: type {typ!r} unsupported")


def read_stream(buf: bytes) -> tuple[list[tuple[str, str]],
                                     list[list]]:
    """Decode a whole IPC stream: ([(name, type)], rows). Row-major
    output so the caller feeds pandas/Spark directly."""
    fields: list[tuple[str, str]] | None = None
    rows: list[list] = []
    for kind, header, body in stream_messages(buf):
        if kind == _KIND_SCHEMA:
            if fields is not None:
                raise ValueError("arrow-ipc: duplicate schema message")
            fields = _schema_fields(header)
            continue
        if kind == _KIND_DICT:
            raise NotImplementedError(
                "arrow-ipc: dictionary batch unsupported")
        if kind != _KIND_BATCH:
            raise NotImplementedError(
                f"arrow-ipc: message header kind {kind} unsupported")
        if fields is None:
            raise ValueError(
                "arrow-ipc: record batch before schema")
        # RecordBatch.fbs: length(0), nodes(1), buffers(2),
        # compression(3)
        if header.table(3) is not None:
            raise NotImplementedError(
                "arrow-ipc: compressed body unsupported "
                "(LZ4_FRAME/ZSTD)")
        length = header.scalar(0, "<q", 0)
        n_nodes, p_nodes = header.vector(1)
        n_bufs, p_bufs = header.vector(2)
        if n_nodes != len(fields):
            raise ValueError(
                f"arrow-ipc: {n_nodes} field nodes for "
                f"{len(fields)} schema fields")
        nodes = [struct.unpack_from("<qq", header.buf,
                                    p_nodes + 16 * i)
                 for i in range(n_nodes)]
        bufs = [struct.unpack_from("<qq", header.buf,
                                   p_bufs + 16 * i)
                for i in range(n_bufs)]
        cols = []
        bi = 0
        for (name, typ), (nlen, nulls) in zip(fields, nodes):
            need = 3 if typ in ("utf8", "binary", "large_utf8") else 2
            if nlen != length:
                raise NotImplementedError(
                    f"arrow-ipc: field {name!r} node length {nlen} "
                    f"!= batch length {length} (nested layout?)")
            cols.append(_decode_column(
                body, typ, length, nulls, bufs[bi: bi + need]))
            bi += need
        if bi != n_bufs:
            raise ValueError(
                f"arrow-ipc: consumed {bi} of {n_bufs} buffers — "
                "layout mismatch")
        rows.extend([c[i] for c in cols] for i in range(length))
    if fields is None:
        raise ValueError("arrow-ipc: no schema message in stream")
    return fields, rows


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
