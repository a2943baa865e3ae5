"""Archive sources (sources/archives.py) vs the stdlib reference
implementations: real tarfile-written shards in all three formats
(ustar / PAX / GNU, incl. long names), real zipfile-written archives
(stored + deflate), loud boundaries, and the WebDataset grouping
convention."""
import io
import tarfile
import zipfile

import pytest

from cam_etl_spark.sources.archives import (
    tar_extract,
    tar_members,
    webdataset_samples,
    zip_central_directory,
    zip_extract,
)


def _make_tar(fmt, long_names: bool) -> tuple[bytes, dict]:
    bio = io.BytesIO()
    tf = tarfile.open(fileobj=bio, mode="w", format=fmt)
    payloads = {}
    for i in range(6):
        name = (("deep/" + "x" * 120 + f"/{i:04d}.txt")
                if long_names and i == 5 else f"dir/{i:04d}.txt")
        data = (f"payload {i} " * (i + 1)).encode()
        payloads[name] = data
        ti = tarfile.TarInfo(name)
        ti.size = len(data)
        ti.mtime = 1_700_000_000 + i
        tf.addfile(ti, io.BytesIO(data))
    tf.close()
    return bio.getvalue(), payloads


@pytest.mark.parametrize("fmt,long_names", [
    (tarfile.USTAR_FORMAT, False),
    (tarfile.PAX_FORMAT, True),
    (tarfile.GNU_FORMAT, True),
])
def test_tar_members_vs_stdlib(fmt, long_names):
    buf, payloads = _make_tar(fmt, long_names)
    ms = tar_members(buf)
    assert {m["name"]: tar_extract(buf, m) for m in ms} == payloads
    # member table agrees with the stdlib reader
    ref = tarfile.open(fileobj=io.BytesIO(buf))
    assert [(m["name"], m["size"], m["mtime"]) for m in ms] == \
        [(t.name, t.size, t.mtime) for t in ref.getmembers()]


def test_tar_loud_boundaries():
    buf, _ = _make_tar(tarfile.USTAR_FORMAT, False)
    bad = bytearray(buf)
    bad[0] ^= 0xFF  # corrupt the first header byte
    with pytest.raises(ValueError, match="checksum"):
        tar_members(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        tar_members(buf[: 512 + 4])
    bad2 = bytearray(buf)
    bad2[257:263] = b"foobar"
    # checksum catches the magic corruption first — either way loud
    with pytest.raises(ValueError):
        tar_members(bytes(bad2))


def test_zip_vs_stdlib_and_loud():
    bio = io.BytesIO()
    zf = zipfile.ZipFile(bio, "w")
    zf.writestr("a.txt", b"stored small",
                compress_type=zipfile.ZIP_STORED)
    zf.writestr("b/c.json", b'{"k": 1} ' * 500,
                compress_type=zipfile.ZIP_DEFLATED)
    zf.writestr("d.bin", bytes(range(256)) * 20,
                compress_type=zipfile.ZIP_DEFLATED)
    zf.close()
    buf = bio.getvalue()
    es = zip_central_directory(buf)
    ref = zipfile.ZipFile(io.BytesIO(buf))
    assert {e["name"]: zip_extract(buf, e) for e in es} == \
        {n: ref.read(n) for n in ref.namelist()}
    assert [(e["name"], e["crc32"]) for e in es] == \
        [(i.filename, i.CRC) for i in ref.infolist()]

    with pytest.raises(ValueError, match="end-of-central"):
        zip_central_directory(b"not a zip at all")
    # CRC tamper: flip a payload byte of the stored member
    e0 = next(e for e in es if e["method"] == "stored")
    lo = buf.index(b"stored small")
    bad = buf[:lo] + b"Xtored small" + buf[lo + 12:]
    with pytest.raises(ValueError, match="CRC-32"):
        zip_extract(bad, e0)


def test_webdataset_grouping():
    ms = [{"name": f"shard/{i:04d}.{ext}", "size": 1, "offset": 0,
           "mtime": 0, "typeflag": "0"}
          for i in range(3) for ext in ("jpg", "txt", "seg.json")]
    ms.append({"name": "shard/extraneous", "size": 1, "offset": 0,
               "mtime": 0, "typeflag": "0"})  # no dot: skipped
    ws = webdataset_samples(ms)
    assert sorted(ws) == ["0000", "0001", "0002"]
    assert sorted(ws["0001"]) == ["jpg", "seg.json", "txt"]


def test_zip64_entry_sentinels_are_loud():
    import struct as _struct

    bio = io.BytesIO()
    zf = zipfile.ZipFile(bio, "w")
    zf.writestr("big.bin", b"x" * 100,
                compress_type=zipfile.ZIP_STORED)
    zf.close()
    buf = bytearray(bio.getvalue())
    eocd = buf.rindex(b"PK\x05\x06")
    n_total, cd_size, cd_off = _struct.unpack_from(
        "<HII", buf, eocd + 10)
    # entry-level zip64 sentinel: csize = 0xFFFFFFFF while the EOCD
    # itself still fits in 32 bits
    bad = bytearray(buf)
    _struct.pack_into("<I", bad, cd_off + 20, 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="zip64 entry"):
        zip_central_directory(bytes(bad))
    # 0x0001 extended-information extra field present in the central
    # directory (sizes in range, but the field signals zip64 intent)
    cd = bytes(buf[cd_off:cd_off + cd_size])
    nlen, elen = _struct.unpack_from("<HH", cd, 28)
    assert elen == 0
    extra = _struct.pack("<HH", 0x0001, 8) + b"\x00" * 8
    cd2 = bytearray(cd[:46 + nlen] + extra + cd[46 + nlen:])
    _struct.pack_into("<H", cd2, 30, len(extra))
    eocd_rec = bytearray(buf[eocd:])
    _struct.pack_into("<I", eocd_rec, 12, cd_size + len(extra))
    bad2 = bytes(buf[:cd_off]) + bytes(cd2) + bytes(eocd_rec)
    with pytest.raises(NotImplementedError, match="0x0001"):
        zip_central_directory(bad2)
