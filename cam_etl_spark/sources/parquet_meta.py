"""Parquet footer / metadata reader from spec — a generic Thrift
compact-protocol parser (the THRIFT-COMPACT encoding is fully
derivable: varints, zigzag, nibble field headers) applied to the
parquet-format FileMetaData structures (apache/parquet-format
README + parquet.thrift, public).

Why it's in the engine: table maintenance over a 100 TB lake is
footer work, not data work — row-group pruning statistics, compressed
sizes, encoding audits, small-file detection all come from the last
few KB of each file. Listing millions of footers is a distributed
mapInPandas over the file inventory; this module is the per-file
kernel, and the catalog entry cross-checks every parsed field against
DuckDB's independent parquet reader (`parquet_metadata()` /
`parquet_file_metadata()`), the same verification class as the
zlib-checked inflater.

Layout (parquet-format): the file ends with `<4-byte LE footer len>
"PAR1"`; the footer is a thrift-compact FileMetaData. Field ids used
here (parquet.thrift): FileMetaData{1:version, 2:schema(list),
3:num_rows, 4:row_groups(list), 6:created_by};
SchemaElement{1:type, 3:repetition_type, 4:name, 5:num_children};
RowGroup{1:columns(list), 2:total_byte_size, 3:num_rows};
ColumnChunk{2:file_offset, 3:meta_data};
ColumnMetaData{1:type, 2:encodings, 3:path_in_schema, 4:codec,
5:num_values, 6:total_uncompressed_size, 7:total_compressed_size,
9:data_page_offset, 11:dictionary_page_offset}.

Boundaries: encrypted footers (magic "PARE") raise
NotImplementedError; any structural violation raises ValueError.
"""

from __future__ import annotations

# thrift compact type nibbles
_T_STOP = 0
_T_TRUE = 1
_T_FALSE = 2
_T_BYTE = 3
_T_I16 = 4
_T_I32 = 5
_T_I64 = 6
_T_DOUBLE = 7
_T_BINARY = 8
_T_LIST = 9
_T_SET = 10
_T_MAP = 11
_T_STRUCT = 12

PHYSICAL_TYPES = [
    "BOOLEAN", "INT32", "INT64", "INT96", "FLOAT", "DOUBLE",
    "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY",
]
CODECS = [
    "UNCOMPRESSED", "SNAPPY", "GZIP", "LZO", "BROTLI", "LZ4", "ZSTD",
    "LZ4_RAW",
]
ENCODINGS = {
    0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE", 4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED", 6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY", 8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT",
}


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("thrift: truncated")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("thrift: truncated binary")
        v = self.buf[self.pos : self.pos + n]
        self.pos += n
        return v

    def varint(self) -> int:
        shift = out = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ValueError("thrift: varint overrun")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)


def _read_value(r: _Reader, ttype: int):
    if ttype == _T_TRUE:
        return True
    if ttype == _T_FALSE:
        return False
    if ttype == _T_BYTE:
        return r.byte()
    if ttype in (_T_I16, _T_I32, _T_I64):
        return r.zigzag()
    if ttype == _T_DOUBLE:
        import struct as _s

        return _s.unpack("<d", r.take(8))[0]
    if ttype == _T_BINARY:
        return r.take(r.varint())
    if ttype in (_T_LIST, _T_SET):
        head = r.byte()
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = r.varint()
        return [
            (True if r.byte() == 1 else False)
            if etype in (_T_TRUE, _T_FALSE)
            else _read_value(r, etype)
            for _ in range(size)
        ]
    if ttype == _T_MAP:
        size = r.varint()
        if size == 0:
            return {}
        head = r.byte()
        kt, vt = head >> 4, head & 0x0F
        return {
            _read_value(r, kt): _read_value(r, vt) for _ in range(size)
        }
    if ttype == _T_STRUCT:
        return _read_struct(r)
    raise ValueError(f"thrift: unknown type {ttype}")


def _read_struct(r: _Reader) -> dict:
    """Generic compact-protocol struct -> {field_id: value}."""
    out: dict = {}
    last_fid = 0
    while True:
        b = r.byte()
        if b == _T_STOP:
            return out
        delta = b >> 4
        ttype = b & 0x0F
        fid = last_fid + delta if delta else r.zigzag()
        out[fid] = _read_value(r, ttype)
        last_fid = fid


def parse_footer(data: bytes) -> dict:
    """Parse a whole parquet file's footer bytes (pass the full file or
    its tail; only the trailing footer is read)."""
    if len(data) < 12:
        raise ValueError("parquet: file shorter than footer framing")
    magic = data[-4:]
    if magic == b"PARE":
        raise NotImplementedError("parquet: encrypted footer")
    if magic != b"PAR1":
        raise ValueError("parquet: bad trailing magic")
    flen = int.from_bytes(data[-8:-4], "little")
    if flen + 8 > len(data):
        raise ValueError("parquet: footer length exceeds file")
    meta = _read_struct(_Reader(data[-8 - flen : -8]))
    schema = [
        {
            "type": PHYSICAL_TYPES[s[1]] if 1 in s else None,
            "repetition": s.get(3),
            "name": s[4].decode("utf-8"),
            "num_children": s.get(5, 0),
        }
        for s in meta[2]
    ]
    row_groups = []
    for rg in meta[4]:
        cols = []
        for cc in rg[1]:
            md = cc[3]
            cols.append(
                {
                    "path": ".".join(
                        p.decode("utf-8") for p in md[3]
                    ),
                    "type": PHYSICAL_TYPES[md[1]],
                    "encodings": sorted(
                        ENCODINGS.get(e, f"ENC{e}") for e in md[2]
                    ),
                    "codec": CODECS[md[4]],
                    "num_values": md[5],
                    "total_uncompressed_size": md[6],
                    "total_compressed_size": md[7],
                    "data_page_offset": md[9],
                    "dictionary_page_offset": md.get(11),
                    # ColumnMetaData 14/15: split-block bloom filter
                    # location (absent when the writer emitted none)
                    "bloom_filter_offset": md.get(14),
                    "bloom_filter_length": md.get(15),
                    # ColumnMetaData 12: Statistics — raw PLAIN bytes
                    # of min_value/max_value (fields 6/5; writers may
                    # truncate byte-array bounds down/up — still valid
                    # bounds), decoded on use by _decode_bound
                    "stat_min_raw": (md.get(12) or {}).get(6),
                    "stat_max_raw": (md.get(12) or {}).get(5),
                    # ColumnChunk 4-7: the PAGE INDEX (OffsetIndex /
                    # ColumnIndex) locations
                    "offset_index_offset": cc.get(4),
                    "offset_index_length": cc.get(5),
                    "column_index_offset": cc.get(6),
                    "column_index_length": cc.get(7),
                }
            )
        row_groups.append(
            {
                "columns": cols,
                "total_byte_size": rg[2],
                "num_rows": rg[3],
            }
        )
    return {
        "version": meta[1],
        "num_rows": meta[3],
        "created_by": meta.get(6, b"").decode("utf-8", "replace"),
        "schema": schema,
        "row_groups": row_groups,
        # FileMetaData 5: key_value_metadata — the extension point
        # standards like GeoParquet hang their file-level JSON off of
        # (KeyValue{1: key, 2: value}); values kept as raw bytes
        "key_value_metadata": {
            kv[1].decode("utf-8"): kv.get(2)
            for kv in meta.get(5, [])
        },
    }


def leaf_levels(schema: list[dict]) -> dict[str, tuple[int, int]]:
    """Walk the flattened SchemaElement list (root first, children in
    depth-first order with num_children counts) and return
    {leaf_path: (max_definition_level, max_repetition_level)} — an
    optional ancestor (repetition 1) adds a definition level, a
    repeated ancestor (repetition 2) adds one of each."""
    out: dict[str, tuple[int, int]] = {}
    pos = 1  # schema[0] is the root

    def walk(path: list[str], d: int, r: int) -> None:
        nonlocal pos
        el = schema[pos]
        pos += 1
        rep = el["repetition"]
        if rep == 1:
            d += 1
        elif rep == 2:
            d += 1
            r += 1
        name = [*path, el["name"]]
        if el["num_children"]:
            for _ in range(el["num_children"]):
                walk(name, d, r)
        else:
            out[".".join(name)] = (d, r)

    for _ in range(schema[0]["num_children"]):
        walk([], 0, 0)
    return out


# ---------------------------------------------------------------------------
# Split-block bloom filters (parquet-format BloomFilter.md): per
# column chunk, a BloomFilterHeader (thrift compact) followed by the
# bitset — blocks of 256 bits (8 x 32-bit LE words). A value hashes
# with xxHash64 (seed 0) over its PLAIN encoding (byte arrays: the
# raw bytes, no length prefix); the high 32 bits pick the block, the
# low 32 bits generate one bit per word via the 8 published salts.
# At 100 TB this is the point-lookup file/row-group skip: a footer +
# a few-KB bitset decide membership before any data page is read,
# with NO false negatives by construction.
# ---------------------------------------------------------------------------

#: the 8 salt constants from the spec's block_insert/block_check.
_SBBF_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)


def read_bloom_filter(data: bytes, offset: int) -> dict:
    """Parse the BloomFilterHeader + bitset at ``offset``. Returns
    {"num_bytes", "bitset"}. The spec defines exactly one algorithm
    (BLOCK), one hash (XXHASH) and one compression (UNCOMPRESSED) —
    anything else in the unions is loud."""
    r = _Reader(data)
    r.pos = offset
    head = _read_struct(r)
    num_bytes = head.get(1)
    if not isinstance(num_bytes, int) or num_bytes <= 0:
        raise ValueError("parquet: bloom header numBytes missing")
    if num_bytes % 32:
        raise ValueError(
            f"parquet: bloom bitset {num_bytes} bytes is not a "
            "multiple of the 32-byte block"
        )
    for fid, name in ((2, "algorithm"), (3, "hash"),
                      (4, "compression")):
        union = head.get(fid)
        if not isinstance(union, dict) or list(union) != [1]:
            raise NotImplementedError(
                f"parquet: bloom {name} union field "
                f"{sorted(union) if isinstance(union, dict) else union} "
                "unsupported (spec defines only BLOCK/XXHASH/"
                "UNCOMPRESSED)"
            )
    bitset = data[r.pos:r.pos + num_bytes]
    if len(bitset) != num_bytes:
        raise ValueError("parquet: bloom bitset truncated")
    return {"num_bytes": num_bytes, "bitset": bitset}


def bloom_hash(value, physical_type: str) -> int:
    """xxHash64(seed 0) over the value's PLAIN encoding."""
    import struct as _s

    from cam_etl_spark.multimodal.zstd import xxh64

    if physical_type == "INT32":
        raw = _s.pack("<i", value)
    elif physical_type == "INT64":
        raw = _s.pack("<q", value)
    elif physical_type == "FLOAT":
        raw = _s.pack("<f", value)
    elif physical_type == "DOUBLE":
        raw = _s.pack("<d", value)
    elif physical_type in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        raw = value.encode("utf-8") if isinstance(value, str) else bytes(value)
    else:
        raise NotImplementedError(
            f"parquet: bloom hashing for {physical_type} unsupported"
        )
    return xxh64(raw, 0)


def bloom_might_contain(bitset: bytes, h: int) -> bool:
    """block_check: block = upper32(h) * n_blocks >> 32; bit i of
    word i = (lower32(h) * salt_i) >> 27."""
    n_blocks = len(bitset) // 32
    block = ((h >> 32) * n_blocks) >> 32
    lo = h & 0xFFFFFFFF
    base = block * 32
    for i in range(8):
        bit = ((lo * _SBBF_SALT[i]) & 0xFFFFFFFF) >> 27
        word = int.from_bytes(bitset[base + 4 * i: base + 4 * i + 4],
                              "little")
        if not (word >> bit) & 1:
            return False
    return True


def bloom_prune(data: bytes, column: str, values: list) -> dict:
    """Per-value verdict for one parquet file: False = PROVABLY
    absent, True = possibly present. The verdict is PER ROW GROUP
    and then OR-ed: a row group with a bloom answers via the bloom;
    a bloom-less row group falls back to its footer min/max stats
    (value outside [min, max] -> provably absent there) and only
    counts possibly-present when it has neither bloom nor stats —
    so mixed-writer files keep the skip power of whichever row
    groups DO carry a bloom. Never a false negative (stats bounds
    may be writer-truncated down/up, which only widens the range).
    Returns {value: bool}."""
    foot = parse_footer(data)
    rgs = []
    ptype = None
    for rg in foot["row_groups"]:
        col = next((c for c in rg["columns"] if c["path"] == column),
                   None)
        if col is None:
            raise ValueError(
                f"parquet: no column {column!r} in footer"
            )
        ptype = col["type"]
        if col["bloom_filter_offset"] is not None:
            rgs.append(("bloom", read_bloom_filter(
                data, col["bloom_filter_offset"])))
        elif col["stat_min_raw"] is not None and \
                col["stat_max_raw"] is not None:
            rgs.append(("stats",
                        (_decode_bound(col["stat_min_raw"], ptype),
                         _decode_bound(col["stat_max_raw"], ptype))))
        else:
            rgs.append(("unknown", None))

    def _rg_possible(kind, info, v, h):
        if kind == "bloom":
            return bloom_might_contain(info["bitset"], h)
        if kind == "stats":
            lo, hi = info
            cv = v
            if isinstance(v, str) and isinstance(lo, bytes):
                cv = v.encode("utf-8")
            elif ptype == "FLOAT":
                # bounds are float32; compare the probe under the
                # same lossy narrowing the bloom path's '<f' pack
                # applies, else a float64 probe of a stored float32
                # can falsely prove absence
                import struct as _s

                cv = _s.unpack("<f", _s.pack("<f", v))[0]
            return lo <= cv <= hi
        return True

    out = {}
    for v in values:
        h = bloom_hash(v, ptype)
        out[v] = any(_rg_possible(k, info, v, h) for k, info in rgs)
    return out


# ---------------------------------------------------------------------------
# Page index (parquet-format PageIndex.md): per column chunk, an
# OffsetIndex (page locations + first row indexes) and a ColumnIndex
# (per-page min/max/null stats) stored BEFORE the footer — the
# page-level analogue of row-group pruning. At 100 TB a selective
# range predicate on a sorted column reads a handful of pages per
# file instead of whole column chunks, decided entirely from
# kilobytes of index.
# ---------------------------------------------------------------------------


def _decode_bound(raw: bytes, physical_type: str):
    """ColumnIndex min/max values are PLAIN-encoded (byte arrays may
    be truncated by the writer — still valid bounds)."""
    import struct as _s

    if physical_type == "INT32":
        return _s.unpack("<i", raw)[0]
    if physical_type == "INT64":
        return _s.unpack("<q", raw)[0]
    if physical_type == "FLOAT":
        return _s.unpack("<f", raw)[0]
    if physical_type == "DOUBLE":
        return _s.unpack("<d", raw)[0]
    if physical_type in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        return raw
    raise NotImplementedError(
        f"parquet: page-index bounds for {physical_type} unsupported"
    )


def read_page_index(data: bytes, col: dict) -> dict:
    """Parse one column chunk's OffsetIndex + ColumnIndex (both must
    be present — Spark's parquet-mr writes them by default). Returns
    {"page_locations": [(offset, size, first_row)], "null_pages",
    "mins", "maxs", "boundary_order", "null_counts"} with bounds
    decoded per the chunk's physical type."""
    if col["offset_index_offset"] is None or \
            col["column_index_offset"] is None:
        raise ValueError(
            f"parquet: column {col['path']!r} has no page index"
        )
    r = _Reader(data)
    r.pos = col["offset_index_offset"]
    oi = _read_struct(r)
    pages = [(p[1], p[2], p[3]) for p in oi[1]]
    r = _Reader(data)
    r.pos = col["column_index_offset"]
    ci = _read_struct(r)
    t = col["type"]
    return {
        "page_locations": pages,
        "null_pages": ci[1],
        "mins": [None if np_ else _decode_bound(raw, t)
                 for np_, raw in zip(ci[1], ci[2])],
        "maxs": [None if np_ else _decode_bound(raw, t)
                 for np_, raw in zip(ci[1], ci[3])],
        "boundary_order": ci.get(4, 0),
        "null_counts": ci.get(5),
    }


def prune_pages(index: dict, lo, hi, n_rows: int) -> list[tuple]:
    """Pages of one column chunk that MAY hold values in [lo, hi]
    (inclusive; None = unbounded). Returns [(page_idx, first_row,
    last_row_exclusive)] — the row ranges a page-index-aware scan
    reads; null-only pages and pages provably outside the range are
    skipped. ``n_rows`` is the row-group row count (bounds the last
    page)."""
    keep = []
    pages = index["page_locations"]
    for i, (_off, _size, first_row) in enumerate(pages):
        end_row = pages[i + 1][2] if i + 1 < len(pages) else n_rows
        if index["null_pages"][i]:
            continue
        mn, mx = index["mins"][i], index["maxs"][i]
        if lo is not None and mx < lo:
            continue
        if hi is not None and mn > hi:
            continue
        keep.append((i, first_row, end_row))
    return keep
