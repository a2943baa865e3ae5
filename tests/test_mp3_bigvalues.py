"""MP3 big-values Huffman layer + count1 table A
(multimodal/mp3.py) — structural validation of the vendored tables
and encode->parse roundtrips over both block families.

The vendored tables cannot be character-compared against the printed
standard in this container; what CAN be pinned:

* every vendored Huffman table is a COMPLETE prefix code — Kraft sum
  exactly 1 and no codeword a prefix of another (a mis-transcribed
  hlen/hcod almost surely breaks one of these);
* the Table B.8 long scalefactor-band boundary lists are 23 entries,
  start 0, end 576, strictly increasing, first six widths 4;
* region partitioning math matches the spec formulas;
* encode->parse recovers every pair/quad/sign bit-exactly under all
  vendored tables, region splits, both count1 tables, and through
  the bit reservoir.
"""

import random
from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cam_etl_spark.multimodal.mp3 import (
    BIGVALUE_TABLES,
    COUNT1_TABLE_A,
    SFB_LONG,
    bigvalue_regions,
    encode_mp3_frame,
    encode_mp3_stream,
    parse_mp3_frame,
    parse_mp3_stream,
)


def _assert_complete_prefix_code(codes, name):
    """codes: list of (hlen, hcod). Kraft == 1 and prefix-free."""
    kraft = sum(Fraction(1, 2 ** hl) for hl, _ in codes)
    assert kraft == 1, f"{name}: Kraft sum {kraft} != 1"
    words = [format(hc, f"0{hl}b") for hl, hc in codes]
    assert len(set(words)) == len(words), f"{name}: duplicate codeword"
    for a in words:
        for b in words:
            if a is not b and b.startswith(a):
                raise AssertionError(f"{name}: {a} is a prefix of {b}")


def test_bigvalue_tables_complete_prefix_codes():
    for tid, (dim, codes) in BIGVALUE_TABLES.items():
        assert set(codes) == {(x, y) for x in range(dim)
                              for y in range(dim)}, tid
        _assert_complete_prefix_code(list(codes.values()),
                                     f"big-values table {tid}")


def test_count1_table_a_complete_prefix_code():
    assert set(COUNT1_TABLE_A) == set(range(16))
    _assert_complete_prefix_code(list(COUNT1_TABLE_A.values()),
                                 "count1 table A")
    # the all-zero quadruple gets the 1-bit code (it dominates real
    # count1 regions), all other codes are 4-6 bits
    assert COUNT1_TABLE_A[0] == (1, 1)
    assert all(4 <= hl <= 6 for k, (hl, _) in COUNT1_TABLE_A.items()
               if k)


def test_sfb_long_invariants():
    for rate, sfb in SFB_LONG.items():
        assert len(sfb) == 23, rate
        assert sfb[0] == 0 and sfb[-1] == 576, rate
        assert all(b > a for a, b in zip(sfb, sfb[1:])), rate
        assert [b - a for a, b in zip(sfb[:6], sfb[1:7])] == [4] * 6
        # widths never shrink going up the spectrum (lowpass layout)
        widths = [b - a for a, b in zip(sfb, sfb[1:])]
        assert all(w2 >= w1 for w1, w2 in zip(widths[:-2],
                                              widths[1:-1])), rate


def test_region_boundary_math():
    g = {"big_values": 100, "block_type": 0,
         "region0_count": 3, "region1_count": 3,
         "table_select": [1, 1, 1]}
    # 44.1 kHz: region1 starts at sfb[4]=16, region2 at sfb[8]=36
    assert bigvalue_regions(g, 44100) == [0, 16, 36, 200]
    assert bigvalue_regions(g, 48000) == [0, 16, 36, 200]
    # window-switching blocks: fixed 36-sample region0, no region2
    gs = {"big_values": 100, "block_type": 2, "region0_count": None}
    assert bigvalue_regions(gs, 44100) == [0, 36, 200, 200]
    # boundaries clamp to the big-values extent
    g2 = {"big_values": 10, "block_type": 0,
          "region0_count": 9, "region1_count": 5}
    assert bigvalue_regions(g2, 44100) == [0, 20, 20, 20]


def _granule(rng, bt, pairs, tables, quads=None, count1table=1):
    from cam_etl_spark.multimodal.mp3 import (
        SLEN,
        _transmitted_slots,
        scalefac_layout,
    )

    g = dict(
        block_type=bt,
        mixed_block_flag=0,
        scalefac_compress=rng.randrange(16),
        global_gain=rng.randrange(256),
        preflag=rng.randrange(2),
        scalefac_scale=rng.randrange(2),
        table_select=tables,
        subblock_gain=[rng.randrange(8) for _ in range(3)],
        region0_count=rng.randrange(7),
        region1_count=rng.randrange(6),
        scfsi=0,
        pairs=pairs,
        quads=quads if quads is not None else [],
        count1table_select=count1table,
    )
    layout = scalefac_layout(bt, 0)
    slen1, slen2 = SLEN[g["scalefac_compress"]]
    g["scalefacs"] = [
        rng.randrange(1 << (slen1 if layout[i][1] == 1 else slen2))
        if (slen1 if layout[i][1] == 1 else slen2) else 0
        for i in _transmitted_slots(g, 0, 0)
    ]
    return g


def _pairs_for(rng, g, sample_rate, n):
    """n signed pairs legal under g's per-region table selection."""
    g2 = dict(g, big_values=n)
    bounds = bigvalue_regions(g2, sample_rate)
    out = []
    for i in range(n):
        s = 2 * i
        region = 0 if s < bounds[1] else (1 if s < bounds[2] else 2)
        tid = g["table_select"][region]
        if tid == 0:
            out.append((0, 0))
            continue
        dim = BIGVALUE_TABLES[tid][0]
        x = rng.randrange(dim) * rng.choice([-1, 1])
        y = rng.randrange(dim) * rng.choice([-1, 1])
        out.append((x, y))
    return out


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       rate=st.sampled_from([32000, 44100, 48000]),
       bt=st.sampled_from([0, 2]),
       count1table=st.sampled_from([0, 1]))
def test_bigvalues_roundtrip(seed, rate, bt, count1table):
    """Every pair, sign, quad and side field recovers bit-exactly
    across encode -> parse for long AND short blocks, all vendored
    tables (incl. table 0 zero-regions), both count1 tables."""
    rng = random.Random(seed)
    vendored = [0] + sorted(BIGVALUE_TABLES)
    tables = [rng.choice(vendored) for _ in range(3)]
    g0 = _granule(rng, bt, [], tables, count1table=count1table)
    g0["pairs"] = _pairs_for(rng, g0, rate, rng.randrange(0, 60))
    g0["quads"] = [tuple(rng.choice([-1, 0, 1]) for _ in range(4))
                   for _ in range(rng.randrange(6))]
    g1 = _granule(rng, 0, [], [1, 2, 3], count1table=1 - count1table)
    g1["pairs"] = _pairs_for(rng, g1, rate, rng.randrange(0, 60))
    g1["quads"] = [tuple(rng.choice([-1, 0, 1]) for _ in range(4))
                   for _ in range(rng.randrange(6))]
    buf = encode_mp3_frame([[g0], [g1]], sample_rate=rate,
                           bitrate_kbps=160)
    m = parse_mp3_frame(buf)
    for gr, g in ((0, g0), (1, g1)):
        got = m["granules"][gr][0]
        assert got["pairs"] == g["pairs"], (gr, "pairs")
        assert got["quads"] == g["quads"], (gr, "quads")
        assert got["scalefacs"] == g["scalefacs"], (gr, "scalefacs")
        assert got["big_values"] == len(g["pairs"])
        assert got["count1table_select"] == g["count1table_select"]


def test_bigvalues_region_table_switching():
    """A long block whose three regions use three DIFFERENT tables:
    the decoder must switch tables at exactly the sfb-derived sample
    boundaries (region0_count=3 -> 16 samples = 8 pairs under table
    1, then up to sample 36 = pairs 8..17 under table 2, rest under
    table 3)."""
    rng = random.Random(11)
    g0 = _granule(rng, 0, [], [1, 2, 3])
    g0["region0_count"], g0["region1_count"] = 3, 3
    pairs = (
        [(1, -1)] * 8          # region 0, table 1: |v| <= 1
        + [(2, 0)] * 10        # region 1, table 2: |v| <= 2
        + [(-2, 2)] * 12       # region 2, table 3: |v| <= 2
    )
    g0["pairs"] = pairs
    g1 = _granule(rng, 0, [], [0, 0, 0])
    g1["pairs"] = [(0, 0)] * 30  # table 0: zero bits on the wire
    buf = encode_mp3_frame([[g0], [g1]], sample_rate=44100)
    m = parse_mp3_frame(buf)
    assert m["granules"][0][0]["pairs"] == pairs
    assert m["granules"][1][0]["pairs"] == [(0, 0)] * 30
    # a value exceeding its region's table maximum rejects on encode
    g0["pairs"] = [(2, 0)] + pairs[1:]  # table 1 region, |x|=2
    with pytest.raises(ValueError, match="exceeds table 1"):
        encode_mp3_frame([[g0], [g1]], sample_rate=44100)


def test_count1_stuffing_discarded_not_error():
    """Real encoders pad part2_3_length with stuffing bits; the
    spec's decode convention discards the resulting overrunning
    final count1 pseudo-codeword instead of erroring. Three shapes:
    an incomplete table-A codeword, a complete table-A codeword
    whose SIGN bits overrun, and sub-codeword table-B residue. The
    next granule-channel must stay bit-aligned in every case."""
    for stuffing, table in (
        ((0, 3), 0),       # '000' — incomplete A codeword
        ((0b0111, 4), 0),  # mag-8 A codeword, sign bit missing
        ((0, 3), 1),       # < 4 bits: below one table-B codeword
    ):
        rng = random.Random(13)
        g0 = _granule(rng, 0, [], [1, 2, 3], count1table=table)
        g0["pairs"] = _pairs_for(rng, g0, 44100, 20)
        g0["quads"] = [(1, 0, -1, 1), (0, 1, 0, 0)]
        g0["stuffing"] = stuffing
        g1 = _granule(rng, 0, [], [2, 2, 2], count1table=0)
        g1["pairs"] = _pairs_for(rng, g1, 44100, 15)
        g1["quads"] = [(-1, -1, 0, 1)]
        buf = encode_mp3_frame([[g0], [g1]], sample_rate=44100,
                               bitrate_kbps=160)
        m = parse_mp3_frame(buf)
        assert m["granules"][0][0]["quads"] == g0["quads"], stuffing
        assert m["granules"][0][0]["pairs"] == g0["pairs"], stuffing
        # the granule AFTER the stuffed one decodes bit-exactly
        assert m["granules"][1][0]["quads"] == g1["quads"], stuffing
        assert m["granules"][1][0]["pairs"] == g1["pairs"], stuffing


def test_bigvalues_through_bit_reservoir():
    """Big-values + count1-A main data laid across frames through the
    reservoir still recovers exactly (part2_3_length accounting must
    include the Huffman bits)."""
    rng = random.Random(5)
    frames = []
    for _ in range(4):
        g0 = _granule(rng, 0, [], [2, 2, 2], count1table=0)
        g0["pairs"] = _pairs_for(rng, g0, 48000, 40)
        g0["quads"] = [(1, 0, -1, 1), (0, 0, 0, 0)]
        g1 = _granule(rng, 2, [], [3, 3, 3])
        g1["pairs"] = _pairs_for(rng, g1, 48000, 30)
        frames.append([[g0], [g1]])
    buf = encode_mp3_stream(frames, sample_rate=48000,
                            bitrate_kbps=96)
    shells = parse_mp3_stream(buf)
    assert len(shells) == 4
    assert any(s["main_data_begin"] for s in shells[1:])
    for i, f in enumerate(frames):
        for gr in range(2):
            got = shells[i]["granules"][gr][0]
            assert got["pairs"] == f[gr][0]["pairs"], (i, gr)
            assert got["quads"] == f[gr][0]["quads"], (i, gr)
