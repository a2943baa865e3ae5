"""MPEG-1 Layer III (MP3) STRUCTURAL codec scaffolding — ISO/IEC
11172-3 §2.4.1.7 / §2.4.2.7.

Codes-recovered (not PCM) coverage, mono and stereo:

* the 32-bit frame header (layer code 0b01, Layer III bitrate table,
  optional CRC protection over the side information per §2.4.3.1);
* the COMPLETE side information: main_data_begin(9) +
  private_bits(5 mono / 3 stereo) + scfsi(4 per channel) + per
  granule-channel part2_3_length(12), big_values(9), global_gain(8),
  scalefac_compress(4), window_switching_flag(1), then either
  [block_type(2), mixed_block_flag(1), 2x table_select(5),
  3x subblock_gain(3)] or [3x table_select(5), region0_count(4),
  region1_count(3)], then preflag(1), scalefac_scale(1),
  count1table_select(1) — 59 bits per granule-channel, 136-bit mono /
  256-bit stereo side info total;
* scalefactor decoding for all four block layouts — long (21 bands:
  11 x slen1 + 10 x slen2), start/stop (long layout), short
  (12 bands x 3 windows: 18 x slen1 + 18 x slen2), mixed (8 long
  slen1 bands + short bands 3-11: 17 x slen1 + 18 x slen2) — with
  the published slen table for scalefac_compress 0-15 and scfsi
  scalefactor reuse (granule 2 skips band groups 0-5/6-10/11-15/16-20
  whose scfsi bit is set and copies granule 1's values);
* the count1 (quadruple) region under Huffman table B — the spec's
  fixed-length table: each quadruple (v,w,x,y) of 0/1 magnitudes is
  coded as the 4-bit one's complement of v<<3|w<<2|x<<1|y, each
  nonzero magnitude followed by one sign bit (1 = negative).

NOT covered — loud documented boundaries (docs/SCALE.md), every one
rejected with NotImplementedError/ValueError, never mis-decoded:

* big_values Huffman decode (tables 0-31 + linbits): big_values must
  be 0;
* count1 Huffman table A (count1table_select must be 1);
* the bit reservoir: main_data_begin must be 0 (main data starts
  immediately after the side information of its own frame);
* joint-stereo (intensity / M-S) modes and the hybrid
  IMDCT/polyphase synthesis to PCM.

The encoder here is fixture synthesis only (same discipline as
mpegaudio.py): it takes the compressed-domain integers and packs a
spec-compliant frame so the parser can be verified round-trip and
against a digest-arithmetic oracle.

Reference parity: the reference repo (cam-etl) contains no audio
decoding at all; this extends the engine's multimodal surface
(SURVEY.md §2.8) beyond reference scope.
"""

from __future__ import annotations

from cam_etl_spark.multimodal.mpegaudio import (
    _BitReader,
    _BitWriter,
    _crc16_feed_bits,
    frame_bytes,
)

#: Layer III MPEG-1 bitrates (kbps), index 1-14 in the header.
BITRATES_L3 = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]

#: scalefac_compress 0-15 -> (slen1, slen2) scalefactor bit lengths.
SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

#: scfsi band groups over the 21 long scalefactor bands.
SCFSI_GROUPS = [(0, 6), (6, 11), (11, 16), (16, 21)]


def _sr_index(sample_rate: int) -> int:
    idx = {44100: 0b00, 48000: 0b01, 32000: 0b10}.get(sample_rate)
    if idx is None:
        raise ValueError(f"bad MPEG-1 sample rate {sample_rate}")
    return idx


def mp3_header(
    bitrate_kbps: int,
    sample_rate: int,
    nch: int,
    padding: bool = False,
    crc: bool = False,
) -> int:
    """32-bit Layer III header. Mono or plain stereo only (joint and
    dual are a documented boundary for Layer III here)."""
    try:
        br_idx = BITRATES_L3.index(bitrate_kbps) + 1
    except ValueError:
        raise ValueError(f"layer 3: bad bitrate {bitrate_kbps} kbps")
    mode_code = 0b11 if nch == 1 else 0b00
    # sync(12) ID(1)=1 layer(2)=01 protection(1) bitrate(4) fs(2)
    # padding(1) private(1) mode(2) mode_ext(2) copyright original emphasis
    return (
        (0xFFF << 20) | (1 << 19) | (0b01 << 17)
        | (0 if crc else (1 << 16))
        | (br_idx << 12) | (_sr_index(sample_rate) << 10)
        | ((1 << 9) if padding else 0) | (mode_code << 6)
    )


def scalefac_layout(block_type: int, mixed: int) -> list[tuple[str, int]]:
    """The ordered scalefactor slots of one granule-channel as
    (kind, slen_selector) pairs, kind 'long'/'short', selector 1 or 2
    (slen1/slen2). Long layout also applies to start/stop blocks."""
    if block_type != 2:
        return [("long", 1 if b < 11 else 2) for b in range(21)]
    if mixed:
        return (
            [("long", 1) for _ in range(8)]
            + [("short", 1 if b < 6 else 2) for b in range(3, 12)
               for _ in range(3)]
        )
    return [("short", 1 if b < 6 else 2) for b in range(12)
            for _ in range(3)]


def _granule_side_bits(w: _BitWriter, g: dict) -> None:
    w.write(g["part2_3_length"], 12)
    w.write(g["big_values"], 9)
    w.write(g["global_gain"], 8)
    w.write(g["scalefac_compress"], 4)
    if g["block_type"] != 0:
        w.write(1, 1)  # window_switching_flag
        w.write(g["block_type"], 2)
        w.write(g["mixed_block_flag"], 1)
        for t in g["table_select"][:2]:
            w.write(t, 5)
        for sg in g["subblock_gain"]:
            w.write(sg, 3)
    else:
        w.write(0, 1)
        for t in g["table_select"][:3]:
            w.write(t, 5)
        w.write(g["region0_count"], 4)
        w.write(g["region1_count"], 3)
    w.write(g["preflag"], 1)
    w.write(g["scalefac_scale"], 1)
    w.write(g["count1table_select"], 1)


def part2_bits(g: dict, scfsi: int, granule: int) -> int:
    slen1, slen2 = SLEN[g["scalefac_compress"]]
    slens = [slen1 if sel == 1 else slen2
             for _, sel in scalefac_layout(g["block_type"],
                                           g["mixed_block_flag"])]
    if granule == 1 and g["block_type"] != 2 and scfsi:
        for gi, (lo, hi) in enumerate(SCFSI_GROUPS):
            if (scfsi >> (3 - gi)) & 1:
                for b in range(lo, hi):
                    slens[b] = 0
    return sum(slens)


def part3_bits(quads: list[tuple[int, int, int, int]]) -> int:
    return sum(4 + sum(1 for v in q if v) for q in quads)


def encode_mp3_frame(
    granules: list[list[dict]],
    sample_rate: int = 48000,
    bitrate_kbps: int = 128,
    crc: bool = False,
) -> bytes:
    """Pack one Layer III frame. ``granules[gr][ch]`` carries the
    side-info fields plus ``scalefacs`` (ints, one per layout slot; for
    granule 1 under scfsi only the TRANSMITTED slots, i.e. reused
    groups omitted) and ``quads`` (list of signed (v,w,x,y), each in
    {-1,0,1}). part2_3_length/big_values/count1table_select are
    derived, not caller-supplied."""
    nch = len(granules[0])
    w = _BitWriter()
    w.write(0, 9)                       # main_data_begin: no reservoir
    w.write(0, 5 if nch == 1 else 3)    # private_bits
    scfsi_ch = []
    for ch in range(nch):
        scfsi = granules[0][ch].get("scfsi", 0)
        if any(granules[gr][ch]["block_type"] == 2 for gr in range(2)):
            if scfsi:
                raise ValueError("scfsi requires long layout in both "
                                 "granules")
        scfsi_ch.append(scfsi)
        w.write(scfsi, 4)
    main = _BitWriter()
    for gr in range(2):
        for ch in range(nch):
            g = granules[gr][ch]
            g["big_values"] = 0
            g["count1table_select"] = 1
            layout = scalefac_layout(g["block_type"],
                                     g["mixed_block_flag"])
            slen1, slen2 = SLEN[g["scalefac_compress"]]
            sent = _transmitted_slots(g, scfsi_ch[ch], gr)
            if len(g["scalefacs"]) != len(sent):
                raise ValueError(
                    f"granule {gr} ch {ch}: {len(g['scalefacs'])} "
                    f"scalefactors, layout transmits {len(sent)}"
                )
            for v, slot in zip(g["scalefacs"], sent):
                slen = slen1 if layout[slot][1] == 1 else slen2
                if v < 0 or v >= (1 << slen):
                    raise ValueError(f"scalefactor {v} exceeds "
                                     f"slen {slen}")
                main.write(v, slen)
            for q in g["quads"]:
                mag = 0
                for v in q:
                    if abs(v) > 1:
                        raise ValueError("count1 magnitudes are 0/1")
                    mag = (mag << 1) | (1 if v else 0)
                main.write(mag ^ 0xF, 4)  # table B: one's complement
                for v in q:
                    if v:
                        main.write(1 if v < 0 else 0, 1)
            g["part2_3_length"] = (
                part2_bits(g, scfsi_ch[ch], gr) + part3_bits(g["quads"])
            )
            _granule_side_bits(w, g)
    w.align()
    side = bytes(w.out)
    main.align()
    total = frame_bytes(3, bitrate_kbps, sample_rate)
    hdr = mp3_header(bitrate_kbps, sample_rate, nch, crc=crc)
    body = side + bytes(main.out)
    out = hdr.to_bytes(4, "big")
    if crc:
        c = 0xFFFF
        c = _crc16_feed_bits(c, hdr.to_bytes(4, "big"), 16, 16)
        c = _crc16_feed_bits(c, side, 0, len(side) * 8)
        out += c.to_bytes(2, "big")
    out += body
    if len(out) > total:
        raise ValueError(f"frame overflow: {len(out)} > {total} bytes")
    return out + b"\x00" * (total - len(out))


def _transmitted_slots(g: dict, scfsi: int, granule: int) -> list[int]:
    """Indices into the layout of the slots actually in the bitstream
    (granule 1 skips scfsi-reused long band groups)."""
    layout = scalefac_layout(g["block_type"], g["mixed_block_flag"])
    if granule == 0 or g["block_type"] == 2 or not scfsi:
        return list(range(len(layout)))
    skip = set()
    for gi, (lo, hi) in enumerate(SCFSI_GROUPS):
        if (scfsi >> (3 - gi)) & 1:
            skip.update(range(lo, hi))
    return [i for i in range(len(layout)) if i not in skip]


def parse_mp3_frame(buf: bytes) -> dict:
    """Parse header + side info + scalefactors + count1 region of one
    Layer III frame. Raises loudly at every unimplemented boundary."""
    if len(buf) < 4:
        raise ValueError("parse_mp3_frame: truncated header")
    hdr = int.from_bytes(buf[:4], "big")
    if hdr >> 20 != 0xFFF or not (hdr >> 19) & 1:
        raise ValueError("parse_mp3_frame: bad syncword / not MPEG-1")
    if (hdr >> 17) & 0b11 != 0b01:
        raise ValueError("parse_mp3_frame: not Layer III")
    protected = not ((hdr >> 16) & 1)
    br_idx = (hdr >> 12) & 0xF
    if br_idx == 0 or br_idx == 0xF:
        raise NotImplementedError(
            "mp3: free-format / forbidden bitrate index"
        )
    bitrate = BITRATES_L3[br_idx - 1]
    fs = {0b00: 44100, 0b01: 48000, 0b10: 32000}.get((hdr >> 10) & 0b11)
    if fs is None:
        raise ValueError("parse_mp3_frame: reserved sample-rate code")
    mode = (hdr >> 6) & 0b11
    if mode in (0b01, 0b10):
        raise NotImplementedError(
            "mp3: joint_stereo / dual_channel modes not implemented"
        )
    nch = 1 if mode == 0b11 else 2
    pos = 4
    if protected:
        stored = int.from_bytes(buf[4:6], "big")
        pos = 6
    side_len = 17 if nch == 1 else 32
    side = buf[pos:pos + side_len]
    if len(side) < side_len:
        raise ValueError("parse_mp3_frame: truncated side info")
    if protected:
        c = 0xFFFF
        c = _crc16_feed_bits(c, buf[:4], 16, 16)
        c = _crc16_feed_bits(c, side, 0, side_len * 8)
        if c != stored:
            raise ValueError("parse_mp3_frame: crc_check mismatch")
    r = _BitReader(buf, pos)
    main_data_begin = r.read(9)
    if main_data_begin:
        raise NotImplementedError(
            "mp3: bit reservoir (main_data_begin != 0) not implemented"
        )
    private_bits = r.read(5 if nch == 1 else 3)
    scfsi_ch = [r.read(4) for _ in range(nch)]
    granules: list[list[dict]] = [[], []]
    for gr in range(2):
        for _ch in range(nch):
            g: dict = {
                "part2_3_length": r.read(12),
                "big_values": r.read(9),
                "global_gain": r.read(8),
                "scalefac_compress": r.read(4),
            }
            if r.read(1):  # window_switching_flag
                g["block_type"] = r.read(2)
                if g["block_type"] == 0:
                    raise ValueError(
                        "parse_mp3_frame: block_type 0 with "
                        "window_switching_flag set is forbidden"
                    )
                g["mixed_block_flag"] = r.read(1)
                g["table_select"] = [r.read(5) for _ in range(2)]
                g["subblock_gain"] = [r.read(3) for _ in range(3)]
                # Implied big-values region partitioning is a Huffman-
                # decode concern; unused at this boundary (big_values=0).
                g["region0_count"] = None
                g["region1_count"] = None
            else:
                g["block_type"] = 0
                g["mixed_block_flag"] = 0
                g["table_select"] = [r.read(5) for _ in range(3)]
                g["subblock_gain"] = [0, 0, 0]
                g["region0_count"] = r.read(4)
                g["region1_count"] = r.read(3)
            g["preflag"] = r.read(1)
            g["scalefac_scale"] = r.read(1)
            g["count1table_select"] = r.read(1)
            if g["big_values"]:
                raise NotImplementedError(
                    "mp3: big_values Huffman decode (tables 0-31) "
                    "not implemented"
                )
            granules[gr].append(g)
    # main data (no reservoir: immediately follows side info)
    for gr in range(2):
        for ch in range(nch):
            g = granules[gr][ch]
            scfsi = scfsi_ch[ch]
            if scfsi and any(granules[x][ch]["block_type"] == 2
                             for x in range(2)):
                raise ValueError(
                    "parse_mp3_frame: scfsi set with short blocks"
                )
            layout = scalefac_layout(g["block_type"],
                                     g["mixed_block_flag"])
            slen1, slen2 = SLEN[g["scalefac_compress"]]
            bits_left = g["part2_3_length"]
            values: list[int] = []
            sent = set(_transmitted_slots(g, scfsi, gr))
            for i, (_kind, sel) in enumerate(layout):
                if i not in sent:
                    values.append(granules[0][ch]["scalefacs"][i])
                    continue
                slen = slen1 if sel == 1 else slen2
                if slen > bits_left:
                    raise ValueError(
                        "parse_mp3_frame: part2 overruns part2_3_length"
                    )
                values.append(r.read(slen))
                bits_left -= slen
            g["scalefacs"] = values
            if g["count1table_select"] == 0 and bits_left:
                raise NotImplementedError(
                    "mp3: count1 Huffman table A not implemented"
                )
            quads: list[tuple[int, int, int, int]] = []
            while bits_left >= 4:
                mag = r.read(4) ^ 0xF
                bits_left -= 4
                q = []
                for shift in (3, 2, 1, 0):
                    m = (mag >> shift) & 1
                    if m:
                        if bits_left < 1:
                            raise ValueError(
                                "parse_mp3_frame: count1 sign bit "
                                "overruns part2_3_length"
                            )
                        m = -1 if r.read(1) else 1
                        bits_left -= 1
                    q.append(m)
                quads.append(tuple(q))
            if bits_left:
                raise ValueError(
                    "parse_mp3_frame: dangling part2_3 bits"
                )
            g["quads"] = quads
    return {
        "layer": 3,
        "sample_rate": fs,
        "bitrate_kbps": bitrate,
        "nch": nch,
        "protected": protected,
        "main_data_begin": main_data_begin,
        "private_bits": private_bits,
        "scfsi": scfsi_ch,
        "side_bits": (136 if nch == 1 else 256),
        "granules": granules,
        "frame_bytes": frame_bytes(3, bitrate, fs),
    }
