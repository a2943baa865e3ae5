"""DEFLATE/zlib/gzip inflater verified against CPython's zlib — an
INDEPENDENT reference implementation, not a self-round-trip."""

import gzip
import io
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cam_etl_spark.multimodal import inflate as I


@settings(max_examples=120, deadline=None)
@given(
    st.binary(min_size=0, max_size=4000),
    st.sampled_from([0, 1, 6, 9, "fixed"]),
)
def test_zlib_container_all_block_types(raw, level):
    if level == "fixed":
        co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_FIXED)
        z = co.compress(raw) + co.flush()
    else:
        z = zlib.compress(raw, level)
    out, meta = I.zlib_decompress(z)
    assert out == raw
    if level == 0:
        assert meta["blocks"]["fixed"] == 0 and meta["blocks"]["dynamic"] == 0
    if level == "fixed":
        assert meta["blocks"]["dynamic"] == 0


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=2000), st.integers(1, 5))
def test_repetitive_text_dynamic_blocks(text, reps):
    raw = (text * reps).encode("utf-8")
    out, _ = I.zlib_decompress(zlib.compress(raw, 9))
    assert out == raw
    co = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw deflate, no container
    out2, _ = I.inflate(co.compress(raw) + co.flush())
    assert out2 == raw


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2000))
def test_gzip_container(raw):
    buf = io.BytesIO()
    with gzip.GzipFile(
        filename="f.txt", mode="wb", fileobj=buf, mtime=99
    ) as g:
        g.write(raw)
    out, meta = I.gzip_decompress(buf.getvalue())
    assert out == raw
    m = meta["members"][0]
    assert m["mtime"] == 99 and m["name"] == "f.txt"


def test_gzip_multimember_and_fields():
    buf = io.BytesIO()
    with gzip.GzipFile(filename="a", mode="wb", fileobj=buf, mtime=1) as g:
        g.write(b"first")
    one = buf.getvalue()
    out, meta = I.gzip_decompress(one + one)
    assert out == b"firstfirst" and len(meta["members"]) == 2


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=5000))
def test_checksums_match_zlib(data):
    assert I.crc32(data) == zlib.crc32(data)
    assert I.adler32(data) == zlib.adler32(data)


def test_boundaries():
    z = zlib.compress(b"hello hello hello hello", 9)
    bad = bytearray(z)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="Adler-32"):
        I.zlib_decompress(bytes(bad))
    with pytest.raises(ValueError):
        I.zlib_decompress(z[:-6])
    with pytest.raises(ValueError, match="trailing garbage"):
        I.zlib_decompress(z + b"\x00")
    with pytest.raises(ValueError, match="FCHECK"):
        I.zlib_decompress(b"\x78\x00" + z[2:])
    co = zlib.compressobj(9, zlib.DEFLATED, 15, 8, 0, b"shareddict")
    zd = co.compress(b"shareddict data") + co.flush()
    with pytest.raises(NotImplementedError, match="FDICT"):
        I.zlib_decompress(zd)
    # reserved BTYPE 3: bfinal=1, btype=11 -> byte 0b00000111
    with pytest.raises(ValueError, match="BTYPE"):
        I.inflate(b"\x07\x00")
    # stored LEN/NLEN mismatch
    with pytest.raises(ValueError, match="LEN/NLEN"):
        I.inflate(b"\x01\x05\x00\x00\x00")
    # gzip bad magic / CRC
    buf = io.BytesIO()
    with gzip.GzipFile(mode="wb", fileobj=buf) as g:
        g.write(b"payload payload")
    gz = bytearray(buf.getvalue())
    with pytest.raises(ValueError, match="magic"):
        I.gzip_decompress(b"\x1f\x8c" + bytes(gz[2:]))
    gz[-6] ^= 0x01  # CRC32 byte
    with pytest.raises(ValueError, match="CRC-32"):
        I.gzip_decompress(bytes(gz))
