"""Portable Roaring bitmap codec (sources/roaring.py): byte-level
fixtures hand-derived from the published RoaringFormatSpec, all three
container types both directions, the Delta RoaringBitmapArray
framing, and loud boundaries."""

import struct

import pytest

from cam_etl_spark.sources import roaring as R


def test_array_container_exact_bytes():
    # [1,2,3]: cookie 12346, 1 container, key 0 card-1 2, offset 16,
    # then the three uint16 values — bytes per the format spec
    buf = R.serialize_roaring32([1, 2, 3])
    assert buf == (
        struct.pack("<II", 12346, 1)
        + struct.pack("<HH", 0, 2)
        + struct.pack("<I", 16)
        + struct.pack("<3H", 1, 2, 3)
    )
    vals, pos = R.deserialize_roaring32(buf)
    assert vals == [1, 2, 3] and pos == len(buf)


def test_run_container_exact_bytes():
    # 0..99 is one run: cookie 12347 | (0 << 16), run-flag byte 0x01,
    # descriptive header, NO offsets (< 4 containers), run payload
    vals = list(range(100))
    buf = R.serialize_roaring32(vals)
    assert buf == (
        struct.pack("<I", 12347)
        + b"\x01"
        + struct.pack("<HH", 0, 99)
        + struct.pack("<H", 1)
        + struct.pack("<HH", 0, 99)
    )
    got, _ = R.deserialize_roaring32(buf)
    assert got == vals


def test_bitmap_container_roundtrip():
    vals = list(range(0, 20000, 2))  # card 10000 > 4096, runs larger
    buf = R.serialize_roaring32(vals)
    # bitmap container: 8192-byte payload
    assert len(buf) == 8 + 4 + 4 + 8192
    got, _ = R.deserialize_roaring32(buf)
    assert got == vals


def test_multi_container_and_offsets_with_runs():
    # 5 containers (>= NO_OFFSET_THRESHOLD) incl. runs -> offset header
    vals = []
    for k in range(5):
        base = k << 16
        if k % 2:
            vals.extend(base + v for v in range(50))  # run
        else:
            vals.extend(base + v for v in range(0, 300, 3))  # array
    buf = R.serialize_roaring32(vals)
    got, pos = R.deserialize_roaring32(buf)
    assert got == vals and pos == len(buf)


def test_empty_bitmap():
    buf = R.serialize_roaring32([])
    assert buf == struct.pack("<II", 12346, 0)
    assert R.deserialize_roaring32(buf) == ([], 8)


def test_boundaries_loud():
    with pytest.raises(ValueError, match="strictly increasing"):
        R.serialize_roaring32([2, 1])
    with pytest.raises(ValueError, match="uint32"):
        R.serialize_roaring32([1 << 32])
    with pytest.raises(ValueError, match="bad cookie"):
        R.deserialize_roaring32(b"\x00\x00\x00\x00")
    buf = R.serialize_roaring32([1, 2, 3])
    with pytest.raises(ValueError, match="truncated"):
        R.deserialize_roaring32(buf[:-2])
    # out-of-order container keys
    bad = (
        struct.pack("<II", 12346, 2)
        + struct.pack("<HH", 1, 0)
        + struct.pack("<HH", 0, 0)
        + struct.pack("<II", 24, 26)
        + struct.pack("<H", 5)
        + struct.pack("<H", 5)
    )
    with pytest.raises(ValueError, match="out of order"):
        R.deserialize_roaring32(bad)


def test_bitmap_array_framing():
    # values spanning three high-32 keys, key 1 empty
    vals = [0, 5, 4096, (2 << 32) + 7, (2 << 32) + 8]
    buf = R.serialize_bitmap_array(vals)
    magic, n = struct.unpack_from("<iq", buf, 0)
    assert magic == R.BITMAP_ARRAY_MAGIC and n == 3
    assert R.deserialize_bitmap_array(buf) == vals
    assert R.deserialize_bitmap_array(R.serialize_bitmap_array([])) == []
    with pytest.raises(ValueError, match="magic"):
        R.deserialize_bitmap_array(struct.pack("<iq", 99, 0))
    with pytest.raises(ValueError, match="trailing"):
        R.deserialize_bitmap_array(buf + b"\x00")


def test_dense_roundtrip_hypothesis_style():
    import random

    rng = random.Random(42)
    for _ in range(25):
        n = rng.randrange(0, 3000)
        vals = sorted(
            rng.sample(range(1 << 20), min(n, 1 << 20))
        )
        buf = R.serialize_roaring32(vals)
        got, pos = R.deserialize_roaring32(buf)
        assert got == vals and pos == len(buf)
