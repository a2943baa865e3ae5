"""bzip2 decoder (round 13) — from the public format (the bzlib
reference documentation and format descriptions): bit-packed stream
framing, per-block Huffman groups with selector MTF coding,
delta-coded code lengths, RUNA/RUNB run-length-2 + move-to-front
decode, inverse Burrows-Wheeler transform, RLE1, and both CRC layers
(per-block and combined stream). Wikipedia-style dumps and many
archival corpora ship ``.bz2`` — with this module the engine decodes
them (and Avro ``bzip2`` blocks) with NO bz2 library in the read
path.

Referee: stdlib ``bz2`` (the real libbzip2) compresses every fixture
at all nine levels in tests/test_bzip2.py — random bytes, highly
repetitive runs (RLE1 + big RUNA/RUNB runs), corpus-like text, empty
input, multi-stream concatenation (the pbzip2 layout) — and the
decoder must reproduce the exact bytes; CRC tampering, the deprecated
``randomised`` bit, truncation, and trailing garbage are loud.
"""

from __future__ import annotations

_BLOCK_MAGIC = 0x314159265359
_FOOTER_MAGIC = 0x177245385090

#: bzip2's CRC-32: polynomial 0x04C11DB7 fed MSB-first (the mirror of
#: zlib's reflected CRC), init/final 0xFFFFFFFF.
_CRC_TABLE = []
for _b in range(256):
    _c = _b << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) if _c & 0x80000000 else (_c << 1)
        _c &= 0xFFFFFFFF
    _CRC_TABLE.append(_c)


def _crc32(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[
            ((crc >> 24) ^ byte) & 0xFF]
    return crc ^ 0xFFFFFFFF


class _Bits:
    """MSB-first bit reader."""

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.buf) * 8:
            raise ValueError("bzip2: bitstream truncated")
        first, last = self.pos >> 3, (end + 7) >> 3
        word = int.from_bytes(self.buf[first:last], "big")
        word >>= (last << 3) - end
        self.pos = end
        return word & ((1 << n) - 1)


def _decode_block(bits: _Bits, block_max: int) -> tuple[bytes, int]:
    block_crc = bits.read(32)
    if bits.read(1):
        raise NotImplementedError(
            "bzip2: randomised blocks are deprecated and unsupported"
        )
    orig_ptr = bits.read(24)

    # symbol map: 16-bit coarse map, then 16 bits per used group
    used = []
    coarse = bits.read(16)
    for g in range(16):
        if coarse & (0x8000 >> g):
            fine = bits.read(16)
            for j in range(16):
                if fine & (0x8000 >> j):
                    used.append(g * 16 + j)
    if not used:
        raise ValueError("bzip2: empty symbol map")
    n_sym = len(used) + 2  # RUNA, RUNB, mtf values, EOB

    n_groups = bits.read(3)
    if not 2 <= n_groups <= 6:
        raise ValueError(f"bzip2: nGroups {n_groups} out of 2..6")
    n_selectors = bits.read(15)
    # selectors arrive MTF-coded in unary
    mtf_groups = list(range(n_groups))
    selectors = []
    for _ in range(n_selectors):
        j = 0
        while bits.read(1):
            j += 1
            if j >= n_groups:
                raise ValueError("bzip2: selector overflows groups")
        g = mtf_groups.pop(j)
        mtf_groups.insert(0, g)
        selectors.append(g)

    # per-group delta-coded lengths -> canonical decode tables
    tables = []
    for _ in range(n_groups):
        length = bits.read(5)
        lens = []
        for _s in range(n_sym):
            while bits.read(1):
                length += -1 if bits.read(1) else 1
            if not 1 <= length <= 20:
                raise ValueError(f"bzip2: code length {length}")
            lens.append(length)
        min_len, max_len = min(lens), max(lens)
        perm = [s for ln in range(min_len, max_len + 1)
                for s, l in enumerate(lens) if l == ln]
        count = [0] * (max_len + 2)
        for l in lens:
            count[l + 1] += 1
        base = [0] * (max_len + 2)
        for i in range(1, max_len + 2):
            base[i] = base[i - 1] + count[i]
        limit = [0] * (max_len + 1)
        vec = 0
        for l in range(min_len, max_len + 1):
            vec += base[l + 1] - base[l]
            limit[l] = vec - 1
            vec <<= 1
        real_base = [0] * (max_len + 1)
        for l in range(min_len + 1, max_len + 1):
            real_base[l] = ((limit[l - 1] + 1) << 1) - base[l]
        real_base[min_len] = 0 - base[min_len]
        tables.append((min_len, max_len, limit, real_base, perm))

    def read_symbol(table):
        min_len, max_len, limit, base, perm = table
        ln = min_len
        vec = bits.read(min_len)
        while vec > limit[ln]:
            ln += 1
            if ln > max_len:
                raise ValueError("bzip2: invalid Huffman code")
            vec = (vec << 1) | bits.read(1)
        return perm[vec - base[ln]]

    # MTF + RLE2 decode to the BWT string
    mtf = list(used)
    bwt = bytearray()
    eob = n_sym - 1
    run, run_bit = 0, 0
    group_pos, group_count, table = 0, 0, None
    while True:
        if group_count == 0:
            if group_pos >= len(selectors):
                raise ValueError("bzip2: ran out of selectors")
            table = tables[selectors[group_pos]]
            group_pos += 1
            group_count = 50
        group_count -= 1
        sym = read_symbol(table)
        if sym <= 1:  # RUNA / RUNB
            run += (sym + 1) << run_bit
            run_bit += 1
            # bound BEFORE materializing: ~35 RUN symbols would
            # otherwise demand a tens-of-GB allocation instead of
            # the contract's named error (bzlib bounds inside the
            # expansion the same way)
            if run > block_max - len(bwt):
                raise ValueError(
                    "bzip2: run length exceeds declared block size"
                )
            continue
        if run:
            bwt.extend(bytes([mtf[0]]) * run)
            run, run_bit = 0, 0
        if sym == eob:
            break
        v = mtf.pop(sym - 1)
        mtf.insert(0, v)
        bwt.append(v)
        if len(bwt) > block_max:
            raise ValueError("bzip2: block exceeds declared size")
    if len(bwt) > block_max:
        raise ValueError("bzip2: block exceeds declared size")
    n = len(bwt)
    if n == 0:
        # bzlib rejects nblock == 0 as BZ_DATA_ERROR — an immediate
        # EOB would otherwise crash the T-vector walk below
        raise ValueError("bzip2: empty block")
    if not 0 <= orig_ptr < n:
        raise ValueError(f"bzip2: origPtr {orig_ptr} out of block")

    # inverse BWT (the bzlib T-vector walk)
    counts = [0] * 256
    for byte in bwt:
        counts[byte] += 1
    cftab = [0] * 256
    s = 0
    for c in range(256):
        cftab[c] = s
        s += counts[c]
    tt = [0] * n
    for i, byte in enumerate(bwt):
        tt[cftab[byte]] = i
        cftab[byte] += 1
    out = bytearray(n)
    pos = tt[orig_ptr]
    for k in range(n):
        out[k] = bwt[pos]
        pos = tt[pos]

    # RLE1: any 4 equal bytes are followed by an extra-repeat count
    plain = bytearray()
    i = 0
    while i < n:
        byte = out[i]
        j = i + 1
        while j < n and j - i < 4 and out[j] == byte:
            j += 1
        run_len = j - i
        plain.extend(bytes([byte]) * run_len)
        if run_len == 4:
            if j >= n:
                raise ValueError("bzip2: RLE1 run missing count byte")
            plain.extend(bytes([byte]) * out[j])
            j += 1
        i = j
    got_crc = _crc32(bytes(plain))
    if got_crc != block_crc:
        raise ValueError(
            f"bzip2: block CRC mismatch (declared {block_crc:#010x}, "
            f"computed {got_crc:#010x})"
        )
    return bytes(plain), block_crc


def bz2_decompress(buf: bytes) -> bytes:
    """Decompress a (possibly multi-stream) .bz2 byte string with
    both CRC layers verified. Loud: bad magic, randomised blocks,
    CRC mismatches, truncation, trailing garbage."""
    out = bytearray()
    pos = 0
    if not buf:
        raise ValueError("bzip2: empty input")
    while pos < len(buf):
        head = buf[pos: pos + 4]
        if len(head) < 4:
            raise ValueError(
                f"bzip2: stream header truncated at byte {pos}"
            )
        if head[:3] != b"BZh" or not b"1"[0] <= head[3] <= b"9"[0]:
            raise ValueError(
                f"bzip2: bad stream header {head!r} at byte {pos}"
            )
        block_max = (head[3] - 0x30) * 100_000
        bits = _Bits(buf, (pos + 4) * 8)
        stream_crc = 0
        while True:
            magic = bits.read(48)
            if magic == _BLOCK_MAGIC:
                plain, block_crc = _decode_block(bits, block_max)
                out += plain
                stream_crc = (((stream_crc << 1) & 0xFFFFFFFF)
                              | (stream_crc >> 31)) ^ block_crc
            elif magic == _FOOTER_MAGIC:
                declared = bits.read(32)
                if declared != stream_crc:
                    raise ValueError(
                        "bzip2: stream CRC mismatch (declared "
                        f"{declared:#010x}, computed "
                        f"{stream_crc:#010x})"
                    )
                break
            else:
                raise ValueError(
                    f"bzip2: bad block magic {magic:#014x}"
                )
        pos = (bits.pos + 7) >> 3  # next stream starts byte-aligned
    return bytes(out)
