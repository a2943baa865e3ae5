"""Archive member scan from spec — TAR (POSIX ustar + the PAX and
GNU-longname extensions) and ZIP (End-of-Central-Directory walk +
local headers), pure from-first-principles parsers.

Why it's in the engine: sharded archives are the de-facto layout of
multimodal training corpora (the WebDataset convention: a tar shard
per ~10k samples, members grouped by basename stem with
extension-typed fields like 0001.jpg / 0001.txt / 0001.json), and
crawl deliveries ship as zip. At 100 TB the shard list is a DataFrame
of file paths; each task parses ITS shard's member table from a few
KB of headers and extracts only the members a query needs — no
driver-side unpacking, no temp-dir explosion. The extracted payloads
feed the existing decoders (jpeg/flac/text) in the same Arrow pass.

Format facts used (all public):
  TAR — 512-byte header blocks: name[100] mode[8] uid[8] gid[8]
  size[12, octal or base-256] mtime[12] chksum[8] typeflag
  linkname[100] magic[6]="ustar" + prefix[155]; header checksum =
  unsigned byte sum with the chksum field read as spaces; data padded
  to 512; two zero blocks end the archive. PAX 'x' records
  ("<len> key=value\\n") override path/size; GNU 'L' carries a long
  name for the NEXT member.
  ZIP — EOCD (PK\\x05\\x06) -> central directory (PK\\x01\\x02 entries
  carrying method/sizes/CRC-32/local-header offset) -> local headers
  (PK\\x03\\x04); methods: 0 stored, 8 deflate (decoded by the
  engine's own RFC-1951 inflater); every member CRC-32 checked.

Verification: the stdlib tarfile/zipfile modules are independent
reference implementations; tests write REAL archives with them
(ustar and PAX formats, stored and deflated members) and the catalog
entries cross-check member tables and payloads byte-for-byte inside
the tasks before any rollup.

Zip64 is supported (round 14): EOCD sentinels follow the zip64
locator to the zip64 EOCD record, and per-entry 0xFFFFFFFF sentinels
resolve through the 0x0001 extended-information extra field —
pinned against stdlib zipfile's force_zip64 output.

Boundaries (loud): encrypted zip entries, multi-disk archives,
unsupported compression methods, sparse/contiguous tar types, bad
checksums/CRCs, and truncated archives all raise.
"""

from __future__ import annotations

import struct

from cam_etl_spark.multimodal.inflate import inflate

_TAR_BLOCK = 512


def _octal(field: bytes) -> int:
    """Numeric tar field: NUL/space-terminated octal, or GNU base-256
    (high bit of byte 0 set) for sizes beyond 8 GiB."""
    if field and field[0] & 0x80:
        return int.from_bytes(bytes([field[0] & 0x7F]) + field[1:],
                              "big")
    s = field.split(b"\x00")[0].strip()
    return int(s or b"0", 8)


def tar_members(buf: bytes) -> list[dict]:
    """Member table of one tar archive: [{"name", "size", "offset"
    (of the data), "mtime", "typeflag"}] for regular files; directory
    entries are listed with size 0. Headers are checksum-validated;
    PAX path/size overrides and GNU long names apply to the next
    member."""
    out = []
    pos = 0
    pending_name: str | None = None
    pax: dict = {}
    while pos + _TAR_BLOCK <= len(buf):
        hdr = buf[pos: pos + _TAR_BLOCK]
        if hdr == b"\x00" * _TAR_BLOCK:
            break  # end-of-archive marker
        stored = _octal(hdr[148:156])
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != summed:
            raise ValueError(
                f"tar: header checksum {stored} != {summed} at "
                f"offset {pos}"
            )
        magic = hdr[257:263]
        if magic not in (b"ustar\x00", b"ustar "):
            raise ValueError(f"tar: bad magic {magic!r} at {pos}")
        size = _octal(hdr[124:136])
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        data_start = pos + _TAR_BLOCK
        data = buf[data_start: data_start + size]
        if len(data) != size:
            raise ValueError(f"tar: member data truncated at {pos}")
        if typeflag == "L":  # GNU long name for the NEXT member
            pending_name = data.rstrip(b"\x00").decode("utf-8")
        elif typeflag == "x":  # PAX extended header for the NEXT one
            p = 0
            while p < len(data):
                sp = data.index(b" ", p)
                ln = int(data[p:sp])
                rec = data[p + (sp - p) + 1: p + ln - 1]
                key, _, val = rec.partition(b"=")
                pax[key.decode()] = val.decode("utf-8")
                p += ln
        elif typeflag in ("0", "5"):
            name = hdr[:100].split(b"\x00")[0].decode("utf-8")
            prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8")
            if prefix:
                name = prefix + "/" + name
            if pending_name is not None:
                name = pending_name
            if "path" in pax:
                name = pax["path"]
            if "size" in pax:
                size = int(pax["size"])
                if data_start + size > len(buf):
                    raise ValueError(
                        f"tar: PAX size override {size} overruns the "
                        f"archive at {pos}"
                    )
            out.append({
                "name": name,
                "size": size if typeflag == "0" else 0,
                "offset": data_start,
                "mtime": _octal(hdr[136:148]),
                "typeflag": typeflag,
            })
            pending_name = None
            pax = {}
        elif typeflag in ("1", "2"):  # hard/sym links: no data
            pending_name = None
            pax = {}
        else:
            raise NotImplementedError(
                f"tar: typeflag {typeflag!r} unsupported (sparse/"
                "contiguous members stay loud)"
            )
        pos = data_start + ((size + _TAR_BLOCK - 1)
                            // _TAR_BLOCK) * _TAR_BLOCK
    return out


def tar_extract(buf: bytes, member: dict) -> bytes:
    """Payload bytes of one tar_members() entry."""
    data = buf[member["offset"]: member["offset"] + member["size"]]
    if len(data) != member["size"]:
        raise ValueError(f"tar: member {member['name']!r} truncated")
    return data


_EOCD_SIG = b"PK\x05\x06"
_CDH_SIG = b"PK\x01\x02"
_LFH_SIG = b"PK\x03\x04"


_Z64_EOCD_SIG = b"PK\x06\x06"
_Z64_LOC_SIG = b"PK\x06\x07"


def zip_central_directory(buf: bytes) -> list[dict]:
    """Entry table from the central directory: [{"name", "method"
    ("stored"/"deflate"), "csize", "usize", "crc32",
    "local_offset"}]. Zip64 is supported (round 14): 0xFFFF/
    0xFFFFFFFF sentinels in the EOCD defer to the Zip64 EOCD record
    (via its locator), and per-entry sentinels defer to the 0x0001
    extended-information extra field, whose 64-bit values appear in
    usize/csize/offset order ONLY for the fields that saturated
    (APPNOTE 4.5.3). Loud: encrypted entries, unknown methods,
    multi-disk archives."""
    tail = buf[-(0xFFFF + 22):] if len(buf) > 0xFFFF + 22 else buf
    i = tail.rfind(_EOCD_SIG)
    if i < 0:
        raise ValueError("zip: no end-of-central-directory record")
    eocd_abs = len(buf) - len(tail) + i
    eocd = tail[i:]
    n_total, cd_size, cd_off = struct.unpack_from("<HII", eocd, 10)
    if n_total == 0xFFFF or 0xFFFFFFFF in (cd_size, cd_off):
        # zip64: the locator sits immediately before the EOCD
        loc = buf[eocd_abs - 20: eocd_abs]
        if loc[:4] != _Z64_LOC_SIG:
            raise ValueError(
                "zip: EOCD has zip64 sentinels but no zip64 "
                "end-of-central-directory locator precedes it")
        _disk, z64_off, n_disks = struct.unpack_from("<IQI", loc, 4)
        if n_disks > 1:
            raise NotImplementedError(
                f"zip: multi-disk archive ({n_disks} disks) "
                "unsupported")
        rec = buf[z64_off: z64_off + 56]
        if rec[:4] != _Z64_EOCD_SIG:
            raise ValueError(
                "zip: zip64 EOCD record signature missing at the "
                "locator's offset")
        n_total, cd_size, cd_off = struct.unpack_from("<QQQ", rec, 32)
    cd = buf[cd_off: cd_off + cd_size]
    out = []
    p = 0
    for _ in range(n_total):
        if cd[p: p + 4] != _CDH_SIG:
            raise ValueError(f"zip: bad central-directory signature "
                             f"at {cd_off + p}")
        (flags, method, _mt, _md, crc, csize, usize, nlen, elen,
         clen) = struct.unpack_from("<HHHHIIIHHH", cd, p + 8)
        local_off = struct.unpack_from("<I", cd, p + 42)[0]
        if flags & 0x1:
            raise NotImplementedError("zip: encrypted entry")
        if method not in (0, 8):
            raise NotImplementedError(
                f"zip: compression method {method} unsupported "
                "(stored/deflate only)"
            )
        name = cd[p + 46: p + 46 + nlen].decode("utf-8")
        # zip64 at entry level: any saturated 32-bit field defers to
        # the 0x0001 extra field, which carries 64-bit values in
        # usize/csize/offset order for EXACTLY the saturated fields
        extra = cd[p + 46 + nlen: p + 46 + nlen + elen]
        ep = 0
        while ep + 4 <= len(extra):
            ext_id, ext_len = struct.unpack_from("<HH", extra, ep)
            if ext_id == 0x0001:
                z = extra[ep + 4: ep + 4 + ext_len]
                zp = 0
                for field in ("usize", "csize", "local_off"):
                    cur = {"usize": usize, "csize": csize,
                           "local_off": local_off}[field]
                    if cur != 0xFFFFFFFF:
                        continue
                    if zp + 8 > len(z):
                        raise ValueError(
                            f"zip: zip64 extra field of {name!r} "
                            f"too short for {field}")
                    (val,) = struct.unpack_from("<Q", z, zp)
                    zp += 8
                    if field == "usize":
                        usize = val
                    elif field == "csize":
                        csize = val
                    else:
                        local_off = val
            ep += 4 + ext_len
        if 0xFFFFFFFF in (csize, usize, local_off):
            raise ValueError(
                f"zip: entry {name!r} has zip64 sentinels but no "
                "0x0001 extended-information extra field")
        out.append({
            "name": name,
            "method": "stored" if method == 0 else "deflate",
            "csize": csize,
            "usize": usize,
            "crc32": crc,
            "local_offset": local_off,
        })
        p += 46 + nlen + elen + clen
    return out


def zip_extract(buf: bytes, entry: dict) -> bytes:
    """Decompress + CRC-check one zip_central_directory() entry
    (deflate through the engine's own RFC-1951 inflater)."""
    import zlib

    off = entry["local_offset"]
    if buf[off: off + 4] != _LFH_SIG:
        raise ValueError(
            f"zip: bad local header for {entry['name']!r}"
        )
    nlen, elen = struct.unpack_from("<HH", buf, off + 26)
    start = off + 30 + nlen + elen
    raw = buf[start: start + entry["csize"]]
    if len(raw) != entry["csize"]:
        raise ValueError(f"zip: member {entry['name']!r} truncated")
    if entry["method"] == "stored":
        data = raw
    else:
        data, _meta = inflate(raw)
    if len(data) != entry["usize"]:
        raise ValueError(
            f"zip: {entry['name']!r} inflated to {len(data)}, central "
            f"directory says {entry['usize']}"
        )
    if zlib.crc32(data) & 0xFFFFFFFF != entry["crc32"]:
        raise ValueError(f"zip: CRC-32 mismatch on {entry['name']!r}")
    return data


def webdataset_samples(members: list[dict]) -> dict[str, dict[str, dict]]:
    """Group a shard's member table by the WebDataset convention:
    sample key = member basename up to the FIRST dot, field name =
    the rest (so 0001.seg.json -> key "0001", field "seg.json").
    Returns {key: {field: member}}."""
    out: dict[str, dict[str, dict]] = {}
    for m in members:
        if m.get("typeflag", "0") != "0":
            continue
        base = m["name"].rsplit("/", 1)[-1]
        if "." not in base:
            continue
        key, _, field = base.partition(".")
        out.setdefault(key, {})[field] = m
    return out
