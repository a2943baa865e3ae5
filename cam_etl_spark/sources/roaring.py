"""Portable Roaring bitmap codec, from the published interchange
format (RoaringFormatSpec, github.com/RoaringBitmap/RoaringFormatSpec)
— the serialization shared by the Java/C/Go Roaring implementations
and referenced by Delta Lake's deletion-vector format.

32-bit bitmap layout (all integers little-endian):

- Without run containers: cookie ``12346`` (SERIAL_COOKIE_NO_RUNCONTAINER,
  4 bytes), container count (4 bytes), descriptive header, offset
  header (always present for this cookie), containers.
- With run containers: cookie ``12347`` (SERIAL_COOKIE) in the low 16
  bits with ``container_count - 1`` in the high 16 bits, then a
  run-flag bitset of ``ceil(n/8)`` bytes (bit i set = container i is a
  run container), descriptive header, offset header ONLY when
  ``container_count >= 4`` (NO_OFFSET_THRESHOLD), containers.
- Descriptive header: per container, uint16 key (high 16 bits of the
  values) and uint16 ``cardinality - 1``.
- Offset header: uint32 byte offset of each container from the start
  of the bitmap stream.
- Array container (cardinality <= 4096, not run-encoded): sorted
  uint16 low-bit values. Bitmap container: 8192 bytes, 2^16 bits,
  value v sets bit ``v % 64`` of word ``v // 64``. Run container:
  uint16 run count then (uint16 start, uint16 length-1) pairs.

The serializer picks per-container encodings by the reference
implementations' size rule (run when strictly smaller than both
alternatives, else array below 4096 cardinality, else bitmap), so
round-trips cover all three; the decoder accepts any legal stream and
is LOUD on truncation, bad cookies, and out-of-order containers.

On top of the 32-bit format, ``serialize_bitmap_array`` /
``deserialize_bitmap_array`` implement the 64-bit RoaringBitmapArray
framing used by Delta Lake deletion vectors (PROTOCOL.md "Deletion
Vector Format", storageType/inline framing in delta_log.py): int32
magic ``1681511377``, int64 bitmap count, then the 32-bit portable
bitmaps for high-32-bit keys 0..max in order, empties included. No
Java implementation exists in this container to pin byte
compatibility; the 32-bit layer is pinned by byte-level fixtures
derived from the format spec, and the array framing is validated by
round-trip plus the descriptor-level cardinality/size checks.

Reference parity: the reference repo (cam-etl) has no lake layer;
SURVEY.md §2.1 source-surface extension.
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
ARRAY_MAX = 4096

BITMAP_ARRAY_MAGIC = 1681511377


def _split_containers(values: list[int]) -> list[tuple[int, list[int]]]:
    """Sorted distinct uint32 values -> [(key, sorted low uint16s)]."""
    out: list[tuple[int, list[int]]] = []
    cur_key, cur = None, None
    for v in values:
        if not 0 <= v < 1 << 32:
            raise ValueError(f"roaring: value {v} outside uint32")
        k, lo = v >> 16, v & 0xFFFF
        if k != cur_key:
            cur = []
            out.append((k, cur))
            cur_key = k
        cur.append(lo)
    return out


def _runs(lows: list[int]) -> list[tuple[int, int]]:
    """Sorted uint16s -> [(start, run_length - 1)]."""
    runs = []
    start = prev = lows[0]
    for v in lows[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start))
        start = prev = v
    runs.append((start, prev - start))
    return runs


def serialize_roaring32(values: list[int]) -> bytes:
    """Serialize sorted distinct uint32 values to the portable
    format. Values must be strictly increasing."""
    for a, b in zip(values, values[1:]):
        if b <= a:
            raise ValueError("roaring: values must be strictly increasing")
    containers = _split_containers(values)
    n = len(containers)

    encoded: list[tuple[bool, bytes]] = []  # (is_run, payload)
    for _key, lows in containers:
        card = len(lows)
        runs = _runs(lows)
        run_size = 2 + 4 * len(runs)
        array_size = 2 * card
        bitmap_size = 8192
        plain_size = array_size if card <= ARRAY_MAX else bitmap_size
        if run_size < plain_size:
            payload = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, ln) for s, ln in runs
            )
            encoded.append((True, payload))
        elif card <= ARRAY_MAX:
            encoded.append(
                (False, struct.pack(f"<{card}H", *lows))
            )
        else:
            words = [0] * 1024
            for v in lows:
                words[v >> 6] |= 1 << (v & 63)
            encoded.append((False, struct.pack("<1024Q", *words)))

    has_run = any(r for r, _ in encoded)
    out = bytearray()
    if has_run:
        out += struct.pack(
            "<I", SERIAL_COOKIE | ((n - 1) << 16)
        )
        flags = bytearray((n + 7) // 8)
        for i, (r, _p) in enumerate(encoded):
            if r:
                flags[i >> 3] |= 1 << (i & 7)
        out += flags
    else:
        out += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, n)
    for (key, lows), _e in zip(containers, encoded):
        out += struct.pack("<HH", key, len(lows) - 1)
    with_offsets = not has_run or n >= NO_OFFSET_THRESHOLD
    if with_offsets:
        pos = len(out) + 4 * n
        for _r, payload in encoded:
            out += struct.pack("<I", pos)
            pos += len(payload)
    for _r, payload in encoded:
        out += payload
    return bytes(out)


def deserialize_roaring32(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Decode one portable 32-bit bitmap starting at ``pos``.
    Returns (sorted values, next position)."""

    def need(n):
        if pos + n > len(buf):
            raise ValueError("roaring: truncated stream")

    need(4)
    (cookie,) = struct.unpack_from("<I", buf, pos)
    if cookie & 0xFFFF == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        flag_bytes = (n + 7) // 8
        need(flag_bytes)
        flags = buf[pos : pos + flag_bytes]
        pos += flag_bytes
        is_run = [bool(flags[i >> 3] & (1 << (i & 7))) for i in range(n)]
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        need(8)
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        is_run = [False] * n
        has_offsets = True
    else:
        raise ValueError(f"roaring: bad cookie {cookie & 0xFFFF}")

    need(4 * n)
    keys, cards = [], []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos + 4 * i)
        keys.append(k)
        cards.append(c + 1)
    pos += 4 * n
    if any(b <= a for a, b in zip(keys, keys[1:])):
        raise ValueError("roaring: container keys out of order")
    if has_offsets:
        need(4 * n)
        pos += 4 * n  # offsets enable seeking; sequential decode here

    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        if is_run[i]:
            need(2)
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            need(4 * n_runs)
            got = 0
            for _ in range(n_runs):
                s, ln = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + s, base + s + ln + 1))
                got += ln + 1
            if got != cards[i]:
                raise ValueError(
                    "roaring: run cardinality disagrees with header"
                )
        elif cards[i] <= ARRAY_MAX:
            need(2 * cards[i])
            lows = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in lows)
        else:
            need(8192)
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            got = 0
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
                    got += 1
            if got != cards[i]:
                raise ValueError(
                    "roaring: bitmap cardinality disagrees with header"
                )
    return values, pos


def serialize_bitmap_array(values: list[int]) -> bytes:
    """Delta RoaringBitmapArray "portable" framing over sorted
    distinct uint64 row indexes: magic, int64 count of 32-bit
    bitmaps (high-key 0..max, empties included), then each bitmap."""
    for a, b in zip(values, values[1:]):
        if b <= a:
            raise ValueError("roaring: values must be strictly increasing")
    if values and values[-1] >= 1 << 64:
        raise ValueError("roaring: value outside uint64")
    groups: dict[int, list[int]] = {}
    for v in values:
        groups.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(groups) + 1) if groups else 0
    out = bytearray(struct.pack("<iq", BITMAP_ARRAY_MAGIC, n))
    for k in range(n):
        out += serialize_roaring32(groups.get(k, []))
    return bytes(out)


def deserialize_bitmap_array(buf: bytes) -> list[int]:
    """Inverse of serialize_bitmap_array; LOUD on magic/length."""
    if len(buf) < 12:
        raise ValueError("roaring: truncated bitmap array header")
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != BITMAP_ARRAY_MAGIC:
        raise ValueError(f"roaring: bad bitmap-array magic {magic}")
    pos = 12
    values: list[int] = []
    for k in range(n):
        vals, pos = deserialize_roaring32(buf, pos)
        values.extend((k << 32) | v for v in vals)
    if pos != len(buf):
        raise ValueError("roaring: trailing bytes after bitmap array")
    return values
