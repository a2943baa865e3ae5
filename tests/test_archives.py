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


def test_zip64_streamed_members_vs_real_zipfile():
    """force_zip64 streamed members carry zip64 extras in the LOCAL
    headers plus data descriptors — the CD-driven reader must be
    indifferent to both (zipfile only saturates the CENTRAL
    directory past 4 GiB, covered by the surgical test below)."""
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as zf:
        for i in range(5):
            with zf.open(f"doc{i}.txt", "w", force_zip64=True) as fh:
                fh.write((f"payload {i} " * 200).encode())
        zf.writestr("plain.txt", "no zip64 here")
    buf = bio.getvalue()
    entries = zip_central_directory(buf)
    assert [e["name"] for e in entries] == [
        f"doc{i}.txt" for i in range(5)] + ["plain.txt"]
    with zipfile.ZipFile(io.BytesIO(buf)) as zf:
        for e in entries:
            assert zip_extract(buf, e) == zf.read(e["name"])


def test_zip64_saturated_cd_entry_vs_real_zipfile():
    """Round 14 (was a loud boundary): a CENTRAL-directory entry
    with 0xFFFFFFFF csize/usize/offset sentinels and the real 64-bit
    values in the 0x0001 extra field — the shape zipfile itself only
    writes past 4 GiB, so the fixture saturates a real archive's CD
    entry surgically (APPNOTE-conformant: values in
    usize/csize/offset order). The referee is stdlib zipfile reading
    the MODIFIED archive — it resolves the same extra field."""
    import struct as _struct

    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("doc0.txt", b"payload zero " * 150)
        zf.writestr("doc1.txt", b"payload one " * 150)
    buf = bytearray(bio.getvalue())
    eocd = buf.rindex(b"PK\x05\x06")
    _n, cds, cdo = _struct.unpack_from("<HII", buf, eocd + 10)
    cd = bytes(buf[cdo: cdo + cds])
    (_flags, _method, _mt, _md, _crc, csize, usize, nlen, _elen,
     _clen) = _struct.unpack_from("<HHHHIIIHHH", cd, 8)
    (local_off,) = _struct.unpack_from("<I", cd, 42)
    extra = _struct.pack("<HHQQQ", 0x0001, 24, usize, csize,
                         local_off)
    e0 = bytearray(cd[: 46 + nlen])
    _struct.pack_into("<I", e0, 20, 0xFFFFFFFF)  # csize
    _struct.pack_into("<I", e0, 24, 0xFFFFFFFF)  # usize
    _struct.pack_into("<I", e0, 42, 0xFFFFFFFF)  # local offset
    _struct.pack_into("<H", e0, 30, len(extra))
    new_cd = bytes(e0) + extra + cd[46 + nlen:]
    new = bytearray(buf[:cdo]) + new_cd + bytearray(buf[eocd:])
    new_eocd = len(new) - (len(buf) - eocd)
    _struct.pack_into("<I", new, new_eocd + 12, len(new_cd))
    new = bytes(new)
    with zipfile.ZipFile(io.BytesIO(new)) as ref:
        entries = zip_central_directory(new)
        assert [e["name"] for e in entries] == ["doc0.txt",
                                                "doc1.txt"]
        for e in entries:
            assert zip_extract(new, e) == ref.read(e["name"])


def test_zip64_eocd_record_vs_real_zipfile():
    """Round 14: >65535 members saturates the classic EOCD count, so
    the reader must follow the zip64 EOCD locator to the zip64 EOCD
    record for the real count/size/offset."""
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_STORED) as zf:
        for i in range(65600):
            zf.writestr(f"f{i}", "x")
    buf = bio.getvalue()
    entries = zip_central_directory(buf)
    assert len(entries) == 65600
    assert entries[-1]["name"] == "f65599"
    assert zip_extract(buf, entries[-1]) == b"x"


def test_zip64_sentinel_without_extra_field_is_loud():
    import struct as _struct

    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        zf.writestr("big.bin", b"x" * 100,
                    compress_type=zipfile.ZIP_STORED)
    buf = bytearray(bio.getvalue())
    eocd = buf.rindex(b"PK\x05\x06")
    _n_total, _cd_size, cd_off = _struct.unpack_from(
        "<HII", buf, eocd + 10)
    # csize = 0xFFFFFFFF with NO 0x0001 extra field: corrupt, loud
    _struct.pack_into("<I", buf, cd_off + 20, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="no .*0x0001"):
        zip_central_directory(bytes(buf))
