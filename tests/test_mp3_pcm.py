"""MP3 subband reconstruction + PCM synthesis (multimodal/mp3.py
requantize / reorder_short / alias_reduce / imdct_* /
decode_mp3_pcm) — the decode stages after Huffman, validated by
their closed-form definitions and by the transform-domain properties
that uniquely pin them:

* requantization spot values straight from the spec formula;
* alias reduction is a product of rotations (energy-preserving);
* the windowed IMDCT + overlap-add chain achieves TDAC: a test-local
  FORWARD MDCT followed by the decoder's inverse path reconstructs a
  random time signal at a flat constant gain (wrong windows, a wrong
  transform convention, or broken overlap-add all destroy this);
* the inlined polyphase core equals synthesize_pcm's bit-for-bit.
"""

import math
import random

import numpy as np
import pytest

from cam_etl_spark.multimodal import mp3 as M
from cam_etl_spark.multimodal.mpegaudio import synthesize_pcm


def test_sfb_short_invariants():
    for rate, widths in M.SFB_SHORT_WIDTHS.items():
        assert len(widths) == 13, rate
        assert sum(widths) == 192, rate  # x3 windows = 576
        assert widths[:4] == [4, 4, 4, 4], rate


def test_imdct_windows_closed_form():
    w0 = M.imdct_window(0)
    assert len(w0) == 36
    for i in (0, 7, 35):
        assert w0[i] == pytest.approx(math.sin(math.pi / 36 * (i + 0.5)))
    # sine window TDAC identity: w[i]^2 + w[i+18]^2 == 1
    for i in range(18):
        assert w0[i] ** 2 + w0[i + 18] ** 2 == pytest.approx(1.0)
    ws = M.imdct_window(2)
    assert len(ws) == 12
    for i in range(6):
        assert ws[i] ** 2 + ws[i + 6] ** 2 == pytest.approx(1.0)
    start, stop = M.imdct_window(1), M.imdct_window(3)
    assert start[:18] == w0[:18] and start[18:24] == [1.0] * 6
    assert start[30:] == [0.0] * 6
    assert stop[:6] == [0.0] * 6 and stop[12:18] == [1.0] * 6
    assert stop[18:] == w0[18:]
    # start/stop taper with the SHORT window's quarter-slopes
    assert start[24:30] == [ws[i] for i in range(6, 12)]
    assert stop[6:12] == [ws[i] for i in range(0, 6)]


def test_requantize_spec_spot_values():
    g = {
        "block_type": 0, "mixed_block_flag": 0, "preflag": 0,
        "scalefac_scale": 0, "global_gain": 210,
        "subblock_gain": [0, 0, 0], "scalefacs": [0] * 21,
        "pairs": [(1, -1), (8, 0)], "quads": [],
    }
    xr = M.requantize(g, 44100)
    assert xr[0] == pytest.approx(1.0)
    assert xr[1] == pytest.approx(-1.0)
    assert xr[2] == pytest.approx(8 ** (4.0 / 3.0))  # = 16
    assert xr[3] == 0.0 and all(v == 0.0 for v in xr[4:])
    # global_gain steps are 2^(1/4)
    g["global_gain"] = 214
    assert M.requantize(g, 44100)[0] == pytest.approx(2.0)
    # scalefactor divides by 2^(mult * sf): sf=2 in band 0, mult=0.5
    g["global_gain"] = 210
    g["scalefacs"] = [2] + [0] * 20
    assert M.requantize(g, 44100)[0] == pytest.approx(0.5)
    g["scalefac_scale"] = 1  # mult = 1.0
    assert M.requantize(g, 44100)[0] == pytest.approx(0.25)
    # preflag adds pretab: band 17 has pretab 3
    g["scalefacs"] = [0] * 21
    g["preflag"] = 1
    band17 = M.SFB_LONG[44100][17]
    g["pairs"] = [(0, 0)] * (band17 // 2) + [(1, 0)]
    xr = M.requantize(g, 44100)
    assert xr[band17] == pytest.approx(2.0 ** (-1.0 * M.PRETAB[17]))


def test_alias_reduce_is_energy_preserving_rotation():
    rng = random.Random(3)
    xr = [rng.uniform(-2, 2) for _ in range(576)]
    out = M.alias_reduce(xr)
    assert sum(v * v for v in out) == pytest.approx(
        sum(v * v for v in xr)
    )
    assert out != xr  # it really mixed across boundaries
    # lines far from any subband boundary are untouched
    assert out[9] == xr[9] and out[18 * 7 + 9] == xr[18 * 7 + 9]


def test_reorder_short_is_the_spec_permutation():
    rate = 48000
    xr = [float(i) for i in range(576)]
    out = M.reorder_short(xr, rate)
    assert sorted(out) == sorted(xr)  # a permutation
    # band 0 (width 4): windows interleave line-major
    # in: [w0: 0..3][w1: 4..7][w2: 8..11] -> out[3*l + w] = in[w*4 + l]
    assert out[:12] == [0.0, 4.0, 8.0, 1.0, 5.0, 9.0,
                        2.0, 6.0, 10.0, 3.0, 7.0, 11.0]


def _forward_mdct(x, w, n):
    """Test-local forward MDCT matching the decoder's inverse
    convention: X_k = sum_i x_i w_i cos(pi/(2n)(2i+1+n/2)(2k+1))."""
    half = n // 2
    return [
        sum(
            x[i] * w[i]
            * math.cos(math.pi / (2 * n) * (2 * i + 1 + half)
                       * (2 * k + 1))
            for i in range(n)
        )
        for k in range(half)
    ]


def test_imdct_overlap_add_tdac_reconstruction():
    """Forward MDCT -> windowed IMDCT -> overlap-add reconstructs a
    random signal at ONE flat gain (= n/4 = 9 for this convention —
    measured exactly, stdev ~2e-13): time-domain alias cancellation.
    Any window error, transform convention slip, or overlap-add bug
    destroys flatness."""
    rng = random.Random(7)
    w = M.imdct_window(0)
    n_blocks = 8
    hop = 18
    x = [rng.uniform(-1, 1) for _ in range(hop * (n_blocks + 1))]
    recon = [0.0] * len(x)
    for b in range(n_blocks):
        seg = x[b * hop:b * hop + 36]
        X = _forward_mdct(seg, w, 36)
        z = M._imdct(X, 36)
        for i in range(36):
            recon[b * hop + i] += z[i] * w[i]
    # interior samples (fully overlapped) must equal 9 * x exactly
    core = slice(hop, hop * n_blocks)
    ratios = [r / v for r, v in zip(recon[core], x[core])
              if abs(v) > 1e-6]
    assert all(r == pytest.approx(9.0, rel=1e-9) for r in ratios)


def test_decode_pcm_matches_synthesize_pcm_core():
    """For a single frame, decode_mp3_pcm's inlined filterbank must
    equal mpegaudio.synthesize_pcm bit-for-bit over the same subband
    samples."""
    rng = random.Random(5)

    def granule(bt, tables):
        g = {
            "block_type": bt, "mixed_block_flag": 0,
            "scalefac_compress": 0, "global_gain": 180,
            "preflag": 0, "scalefac_scale": 0,
            "table_select": tables,
            "subblock_gain": [0, 0, 0], "scfsi": 0,
            "region0_count": 4, "region1_count": 4,
            "scalefacs": [0] * (21 if bt != 2 else 36),
            "count1table_select": 1,
            "pairs": [
                (rng.choice([-2, -1, 0, 1, 2]),
                 rng.choice([-2, -1, 0, 1, 2]))
                for _ in range(40)
            ],
            "quads": [(1, 0, -1, 0)],
        }
        return g

    g0 = granule(0, [2, 3, 2])
    g1 = granule(0, [3, 2, 3])
    buf = M.encode_mp3_frame([[g0], [g1]], sample_rate=44100,
                             bitrate_kbps=160)
    shell = M.parse_mp3_frame(buf)
    pcm = M.decode_mp3_pcm([shell])
    assert pcm.shape == (1152,)
    assert float(np.abs(pcm).max()) > 0.0

    # replicate through synthesize_pcm: same subband blocks, one frame
    tail = None
    blocks = []
    for gr in range(2):
        samples, tail = M.granule_to_subband_samples(
            shell["granules"][gr][0], 44100, tail
        )
        blocks.extend(samples)
    frame = {
        "layer": 2, "channels": 1, "active": list(range(32)),
        "values": [[blocks[t][sb] for t in range(36)]
                   for sb in range(32)],
    }
    ref = synthesize_pcm([frame])
    assert np.array_equal(pcm, ref)


def test_decode_pcm_stream_with_short_blocks_and_reservoir():
    """Multi-frame decode through the bit reservoir with long AND
    short granules: deterministic, continuous (no frame-boundary
    state reset: decoding frames separately differs from decoding the
    stream, which proves the V register and overlap tails carry
    across)."""
    rng = random.Random(11)

    def granule(bt):
        return {
            "block_type": bt, "mixed_block_flag": 0,
            "scalefac_compress": 0, "global_gain": 170,
            "preflag": 0, "scalefac_scale": 0,
            "table_select": [1, 2, 3] if bt != 2 else [2, 3, 0],
            "subblock_gain": [0, 1, 0] if bt == 2 else [0, 0, 0],
            "scfsi": 0,
            "region0_count": 4, "region1_count": 4,
            "scalefacs": [0] * (21 if bt != 2 else 36),
            "count1table_select": 0,
            "pairs": [
                (rng.choice([-1, 0, 1]), rng.choice([-1, 0, 1]))
                for _ in range(30)
            ],
            "quads": [],
        }

    frames = [
        [[granule(0)], [granule(1)]],
        [[granule(2)], [granule(3)]],
        [[granule(0)], [granule(0)]],
    ]
    buf = M.encode_mp3_stream(frames, sample_rate=44100,
                              bitrate_kbps=96)
    shells = M.parse_mp3_stream(buf)
    pcm = M.decode_mp3_pcm(shells)
    assert pcm.shape == (3 * 1152,)
    pcm2 = M.decode_mp3_pcm(M.parse_mp3_stream(buf))
    assert np.array_equal(pcm, pcm2)  # deterministic
    # state continuity: frame 2 decoded in isolation differs
    solo = M.decode_mp3_pcm([shells[2]])
    assert not np.array_equal(pcm[2 * 1152:], solo)


def test_decode_pcm_ms_stereo_linearity():
    """M-S joint stereo (§2.4.3.4.9.3): the (M±S)/sqrt(2) butterfly
    is applied to requantized spectra, and everything downstream
    (reorder, alias reduction, IMDCT, overlap-add, frequency
    inversion, polyphase synthesis) is LINEAR — so the decoded left
    channel must equal (mid_pcm + side_pcm)/sqrt(2) of the two MONO
    decodes of the same granule data. That identity pins the
    butterfly's placement, sign convention and scaling at once."""
    rng = random.Random(21)

    def granule(bt, gain):
        return {
            "block_type": bt, "mixed_block_flag": 0,
            "scalefac_compress": 0, "global_gain": gain,
            "preflag": 0, "scalefac_scale": 0,
            "table_select": [5, 9, 11] if bt != 2 else [7, 12, 0],
            "subblock_gain": [0, 1, 0] if bt == 2 else [0, 0, 0],
            "scfsi": 0,
            "region0_count": 4, "region1_count": 4,
            "scalefacs": [0] * (21 if bt != 2 else 36),
            "count1table_select": 0,
            "pairs": [
                (rng.choice([-3, -2, -1, 0, 1, 2, 3]),
                 rng.choice([-3, -2, -1, 0, 1, 2, 3]))
                for _ in range(30)
            ],
            "quads": [(0, 1, 0, -1)],
        }

    frames = [
        [[granule(0, 180), granule(0, 176)],
         [granule(1, 170), granule(1, 168)]],
        [[granule(2, 175), granule(2, 172)],
         [granule(0, 174), granule(0, 171)]],
    ]
    buf = M.encode_mp3_stream(frames, sample_rate=44100,
                              bitrate_kbps=192, ms=True)
    shells = M.parse_mp3_stream(buf)
    assert shells[0]["nch"] == 2
    assert shells[0]["mode"] == 0b01
    assert shells[0]["mode_ext"] == 0b10
    left = M.decode_mp3_pcm(shells, channel=0)
    right = M.decode_mp3_pcm(shells, channel=1)

    def mono(ch):
        fr = [[[f[gr][ch]] for gr in range(2)] for f in frames]
        b = M.encode_mp3_stream(fr, sample_rate=44100,
                                bitrate_kbps=96)
        return M.decode_mp3_pcm(M.parse_mp3_stream(b))

    mid, side = mono(0), mono(1)
    s2 = math.sqrt(2.0)
    assert np.allclose(left, (mid + side) / s2, rtol=1e-9, atol=1e-12)
    assert np.allclose(right, (mid - side) / s2, rtol=1e-9, atol=1e-12)
    assert not np.allclose(left, right)  # side energy is real


def test_ms_stereo_boundaries_loud():
    """M-S with differing block structure between channels rejects
    (the butterfly would not commute with reorder); any
    intensity-stereo mode_extension stays a loud parse boundary."""
    rng = random.Random(22)

    def granule(bt):
        return {
            "block_type": bt, "mixed_block_flag": 0,
            "scalefac_compress": 0, "global_gain": 170,
            "preflag": 0, "scalefac_scale": 0,
            "table_select": [1, 2, 3] if bt != 2 else [2, 3, 0],
            "subblock_gain": [0, 0, 0], "scfsi": 0,
            "region0_count": 4, "region1_count": 4,
            "scalefacs": [0] * (21 if bt != 2 else 36),
            "count1table_select": 1,
            "pairs": [(rng.choice([-1, 0, 1]), rng.choice([-1, 0, 1]))
                      for _ in range(20)],
            "quads": [],
        }

    frames = [[[granule(0), granule(2)], [granule(0), granule(0)]]]
    buf = M.encode_mp3_stream(frames, sample_rate=44100,
                              bitrate_kbps=192, ms=True)
    shells = M.parse_mp3_stream(buf)
    with pytest.raises(ValueError, match="differing block structure"):
        M.decode_mp3_pcm(shells, channel=0)

    # mode_extension 0b11 on the same DIFFERING-structure granules:
    # short-block intensity (round 11) indexes both pre-reorder
    # spectra by the right channel's band/window layout, so the
    # structure mismatch is just as fatal there
    bad = bytearray(buf)
    assert (bad[3] >> 4) & 0b11 == 0b10
    bad[3] |= 0x30
    with pytest.raises(ValueError, match="differing block structure"):
        M.decode_mp3_pcm(M.parse_mp3_stream(bytes(bad)), channel=0)


def test_mixed_block_decomposition_identity():
    """MIXED blocks (block_type 2, mixed_block_flag 1): lines 0-35
    are LONG (long bands 0-7, long window on subbands 0-1, alias
    only at the one long seam), lines 36+ are SHORT (bands 3-11).
    The whole post-requantize chain is linear, so a mixed granule
    whose long part lives in subband 0 (lines 0-17) must decode to
    EXACTLY long-granule(sb0 lines) + short-granule(lines 36+) —
    any scalefactor-slot mis-mapping, wrong reorder skip, extra
    alias boundary or wrong window breaks the identity."""
    rng = random.Random(31)
    long_sfs = [rng.randrange(4) for _ in range(8)]
    short_sfs = {(sfb, w): rng.randrange(4)
                 for sfb in range(3, 12) for w in range(3)}
    lines_low = [rng.choice([-2, -1, 0, 1, 2]) for _ in range(18)]
    n_hi = 80
    lines_hi = [rng.choice([-2, -1, 0, 1, 2]) for _ in range(n_hi)]

    def pairs_from(lines576):
        return [(lines576[2 * i], lines576[2 * i + 1])
                for i in range(288)]

    full = [0] * 576
    full[:18] = lines_low
    full[36 : 36 + n_hi] = lines_hi

    g_mixed = {
        "block_type": 2, "mixed_block_flag": 1,
        "global_gain": 178, "preflag": 0, "scalefac_scale": 1,
        "subblock_gain": [0, 1, 2],
        "scalefacs": long_sfs + [short_sfs[(sfb, w)]
                                 for sfb in range(3, 12)
                                 for w in range(3)],
        "pairs": pairs_from(full), "quads": [],
    }
    low_only = [0] * 576
    low_only[:18] = lines_low
    g_long = {
        "block_type": 0, "mixed_block_flag": 0,
        "global_gain": 178, "preflag": 0, "scalefac_scale": 1,
        "subblock_gain": [0, 0, 0],
        "scalefacs": long_sfs + [0] * 13,
        "pairs": pairs_from(low_only), "quads": [],
    }
    hi_only = [0] * 576
    hi_only[36 : 36 + n_hi] = lines_hi
    g_short = {
        "block_type": 2, "mixed_block_flag": 0,
        "global_gain": 178, "preflag": 0, "scalefac_scale": 1,
        "subblock_gain": [0, 1, 2],
        "scalefacs": (
            [0] * 9
            + [short_sfs[(sfb, w)] for sfb in range(3, 12)
               for w in range(3)]
        ),
        "pairs": pairs_from(hi_only), "quads": [],
    }
    sm, _ = M.granule_to_subband_samples(g_mixed, 44100, None)
    sl, _ = M.granule_to_subband_samples(g_long, 44100, None)
    ss, _ = M.granule_to_subband_samples(g_short, 44100, None)
    got = np.array(sm)
    want = np.array(sl) + np.array(ss)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-15)
    assert float(np.abs(got).max()) > 0.0
    # the long window really is in force on subbands 0-1: a pure
    # short decode of the SAME low lines differs
    g_short_low = dict(g_short, pairs=pairs_from(low_only),
                       scalefacs=[0] * 36)
    sdiff, _ = M.granule_to_subband_samples(g_short_low, 44100, None)
    assert not np.allclose(np.array(sl), np.array(sdiff))


def test_mixed_block_frame_roundtrip_and_pcm():
    """A mixed-block granule survives encode -> parse (35-slot
    scalefactor layout, window-switching side info) and decodes to
    PCM end-to-end."""
    rng = random.Random(33)
    g0 = {
        "block_type": 2, "mixed_block_flag": 1,
        "scalefac_compress": 5, "global_gain": 175,
        "preflag": 0, "scalefac_scale": 0,
        "table_select": [2, 3],
        "subblock_gain": [0, 1, 0], "scfsi": 0,
        "scalefacs": [rng.randrange(2) for _ in range(35)],
        "count1table_select": 1,
        "pairs": [(rng.choice([-2, -1, 0, 1, 2]),
                   rng.choice([-2, -1, 0, 1, 2]))
                  for _ in range(50)],
        "quads": [],
    }
    g1 = {
        "block_type": 0, "mixed_block_flag": 0,
        "scalefac_compress": 0, "global_gain": 170,
        "preflag": 0, "scalefac_scale": 0,
        "table_select": [1, 2, 3],
        "subblock_gain": [0, 0, 0], "scfsi": 0,
        "region0_count": 4, "region1_count": 4,
        "scalefacs": [0] * 21,
        "count1table_select": 1,
        "pairs": [], "quads": [],
    }
    buf = M.encode_mp3_frame([[g0], [g1]], sample_rate=44100,
                             bitrate_kbps=160)
    shell = M.parse_mp3_frame(buf)
    got = shell["granules"][0][0]
    assert got["mixed_block_flag"] == 1
    assert got["block_type"] == 2
    assert got["pairs"] == g0["pairs"]
    assert got["scalefacs"] == g0["scalefacs"]
    pcm = M.decode_mp3_pcm([shell])
    assert pcm.shape == (1152,)
    assert float(np.abs(pcm).max()) > 0.0


def _joint_granules(rng, n_right_pairs, right_scalefacs=None,
                    gain=(178, 174)):
    """A (left, right) granule pair for joint-stereo tests: left has
    content across the spectrum, right only in its first
    n_right_pairs lines — the zero part above defines the intensity
    bound."""
    def g(ch, np_pairs, sfs):
        return {
            "block_type": 0, "mixed_block_flag": 0,
            "scalefac_compress": 13, "global_gain": gain[ch],
            "preflag": 0, "scalefac_scale": 0,
            "table_select": [5, 9, 11],
            "subblock_gain": [0, 0, 0], "scfsi": 0,
            "region0_count": 4, "region1_count": 4,
            "scalefacs": sfs,
            "count1table_select": 1,
            "pairs": [(rng.choice([-2, -1, 0, 1, 2]),
                       rng.choice([-2, -1, 0, 1, 2]))
                      for _ in range(np_pairs)],
            "quads": [],
        }
    left = g(0, 120, [rng.randrange(3) for _ in range(21)])
    right = g(1, n_right_pairs,
              right_scalefacs
              or [rng.randrange(3) for _ in range(21)])
    return left, right


def test_intensity_stereo_sum_identity():
    """Long-block intensity stereo (mode_extension 0b01): in every
    intensity band L = m*ratio/(1+ratio) and R = m/(1+ratio), so
    L + R == m there — and below the bound L,R are the plain
    channels. By linearity of everything after requantization,
    PCM_L + PCM_R must equal mono(left granules) + mono(right
    granules) EXACTLY, for any mix of is_pos values (incl. 6 = all
    left and 7 = intensity off, where the right channel is zero
    anyway)."""
    rng = random.Random(41)
    is_positions = [rng.choice([0, 1, 2, 3, 4, 5, 6, 7])
                    for _ in range(21)]
    frames = []
    for _ in range(2):
        l0, r0 = _joint_granules(rng, 40, is_positions)
        l1, r1 = _joint_granules(rng, 25, is_positions)
        frames.append([[l0, r0], [l1, r1]])
    buf = M.encode_mp3_stream(frames, sample_rate=44100,
                              bitrate_kbps=256, ms=False)
    # patch in the intensity mode_extension via the encoder flag
    buf2 = M.encode_mp3_stream(
        [[[dict(g) for g in gr] for gr in f] for f in frames],
        sample_rate=44100, bitrate_kbps=256)
    # rebuild with intensity flag
    from cam_etl_spark.multimodal.mp3 import encode_mp3_frame
    bufs = [
        encode_mp3_frame([[f[gr][ch] for ch in range(2)]
                          for gr in range(2)],
                         sample_rate=44100, bitrate_kbps=256,
                         ms=False)
        for f in frames
    ]
    del buf, buf2, bufs  # the stream path below is what we assert on
    shells = []
    for f in frames:
        fb = M.encode_mp3_frame(f, sample_rate=44100,
                                bitrate_kbps=256)
        fb = bytearray(fb)
        fb[3] = (fb[3] & 0x0F) | (0b01 << 6) | (0b01 << 4)
        shells.append(M.parse_mp3_frame(bytes(fb)))
    assert shells[0]["mode"] == 0b01
    assert shells[0]["mode_ext"] == 0b01
    left = M.decode_mp3_pcm(shells, channel=0)
    right = M.decode_mp3_pcm(shells, channel=1)

    def mono(ch):
        out = []
        for f in frames:
            fb = M.encode_mp3_frame([[f[0][ch]], [f[1][ch]]],
                                    sample_rate=44100,
                                    bitrate_kbps=160)
            out.append(M.parse_mp3_frame(fb))
        return M.decode_mp3_pcm(out)

    assert np.allclose(left + right, mono(0) + mono(1),
                       rtol=1e-9, atol=1e-12)
    assert float(np.abs(right).max()) > 0.0


def test_intensity_single_band_ratio_pins():
    """All left content confined to ONE intensity band: is_pos 3
    means ratio tan(pi/4) = 1, so L == R == m/2 exactly; is_pos 6
    means all-left (R == 0); is_pos 7 turns intensity off (L == m,
    R == 0 since the right channel is zero there)."""
    rng = random.Random(43)
    for is_pos, want in ((3, "half"), (6, "left"), (7, "off")):
        # band 15 at 44.1 kHz spans lines 134-161; put pairs there
        lines = [0] * 576
        for i in range(134, 162):
            lines[i] = rng.choice([-2, -1, 1, 2])
        pairs = [(lines[2 * i], lines[2 * i + 1]) for i in range(81)]
        left = {
            "block_type": 0, "mixed_block_flag": 0,
            "scalefac_compress": 13, "global_gain": 180,
            "preflag": 0, "scalefac_scale": 0,
            "table_select": [3, 3, 3], "subblock_gain": [0, 0, 0],
            "scfsi": 0, "region0_count": 4, "region1_count": 4,
            "scalefacs": [0] * 21, "count1table_select": 1,
            "pairs": pairs, "quads": [],
        }
        sfs = [0] * 21
        sfs[15] = is_pos
        right = dict(left, pairs=[], scalefacs=sfs)
        empty = dict(left, pairs=[], scalefacs=[0] * 21)
        fb = bytearray(M.encode_mp3_frame(
            [[left, right], [dict(empty), dict(empty)]],
            sample_rate=44100, bitrate_kbps=256))
        fb[3] = (fb[3] & 0x0F) | (0b01 << 6) | (0b01 << 4)
        shell = M.parse_mp3_frame(bytes(fb))
        pl = M.decode_mp3_pcm([shell], channel=0)
        pr = M.decode_mp3_pcm([shell], channel=1)
        mono_b = M.encode_mp3_frame([[left], [dict(empty)]],
                                    sample_rate=44100,
                                    bitrate_kbps=160)
        pm = M.decode_mp3_pcm([M.parse_mp3_frame(mono_b)])
        if want == "half":
            assert np.allclose(pl, pm / 2, rtol=1e-12, atol=1e-15)
            assert np.allclose(pr, pm / 2, rtol=1e-12, atol=1e-15)
        elif want == "left":
            assert np.allclose(pl, pm, rtol=1e-12, atol=1e-15)
            assert np.allclose(pr, 0, atol=1e-15)
        else:
            assert np.allclose(pl, pm, rtol=1e-12, atol=1e-15)
            assert np.allclose(pr, 0, atol=1e-15)
        assert float(np.abs(pm).max()) > 0.0


def test_intensity_boundaries_loud():
    """Short-block intensity DECODES since round 11 (per-window
    borders); intensity combined with M-S decodes (mode_extension
    0b11: M-S below the bound, intensity above)."""
    rng = random.Random(47)
    l, r = _joint_granules(rng, 30)
    short = dict(l, block_type=2, mixed_block_flag=0,
                 table_select=[2, 3], subblock_gain=[0, 1, 0],
                 scalefacs=[0] * 36)
    short.pop("region0_count"), short.pop("region1_count")
    short["region0_count"] = None
    short["region1_count"] = None
    fb = bytearray(M.encode_mp3_frame(
        [[short, dict(short)], [dict(short), dict(short)]],
        sample_rate=44100, bitrate_kbps=256))
    fb[3] = (fb[3] & 0x0F) | (0b01 << 6) | (0b01 << 4)
    pl, pr = M.decode_mp3_pcm([M.parse_mp3_frame(bytes(fb))],
                              channel=None)
    # is_pos 0 in every slot: ratio tan(0) = 0, all content goes
    # RIGHT in the intensity bands; both channels carry the same
    # 240 nonzero lines, so the stereo part is identical L/R
    assert float(np.abs(pl).max()) > 0.0
    assert float(np.abs(pr).max()) > 0.0
    # ms + intensity decodes and the sum identity generalizes:
    # L + R = sqrt2*m below the bound, m above it — just assert it
    # runs and produces sound on both channels
    l0, r0 = _joint_granules(rng, 30)
    fb = bytearray(M.encode_mp3_frame(
        [[l0, r0], [dict(l0), dict(r0)]],
        sample_rate=44100, bitrate_kbps=256, ms=True))
    fb[3] = (fb[3] & 0x0F) | (0b01 << 6) | (0b11 << 4)
    shell = M.parse_mp3_frame(bytes(fb))
    assert shell["mode_ext"] == 0b11
    pl = M.decode_mp3_pcm([shell], channel=0)
    pr = M.decode_mp3_pcm([shell], channel=1)
    assert float(np.abs(pl).max()) > 0.0
    assert float(np.abs(pr).max()) > 0.0


def test_intensity_edge_cases_from_review():
    """Round-11 review fixes: (a) a right channel with data through
    the LAST scalefactor band has NO intensity region — the plain
    channels must round-trip untouched (the old code force-intensity-
    processed band 21); (b) intensity positions 8-15 (expressible in
    the 4-bit field, spec-illegal) reject loudly instead of feeding
    tan() past pi/2."""
    rng = random.Random(53)
    # (a) right channel active to the end: rzero = 576 > sfb[21]
    full_pairs = [(rng.choice([-1, 1]), rng.choice([-1, 0, 1]))
                  for _ in range(288)]
    left = {
        "block_type": 0, "mixed_block_flag": 0,
        "scalefac_compress": 13, "global_gain": 176,
        "preflag": 0, "scalefac_scale": 0,
        "table_select": [3, 3, 3], "subblock_gain": [0, 0, 0],
        "scfsi": 0, "region0_count": 4, "region1_count": 4,
        "scalefacs": [0] * 21, "count1table_select": 1,
        "pairs": list(full_pairs), "quads": [],
    }
    right = dict(left, pairs=[(y, x) for x, y in full_pairs],
                 global_gain=172)
    empty = dict(left, pairs=[])
    fb = bytearray(M.encode_mp3_frame(
        [[left, right], [dict(empty), dict(empty)]],
        sample_rate=44100, bitrate_kbps=320, intensity=True))
    shell = M.parse_mp3_frame(bytes(fb))
    assert shell["mode_ext"] == 0b01
    pl, pr = M.decode_mp3_pcm([shell], channel=None)
    # no intensity region -> both channels decode as themselves
    mono_l = M.decode_mp3_pcm([M.parse_mp3_frame(M.encode_mp3_frame(
        [[left], [dict(empty)]], sample_rate=44100,
        bitrate_kbps=256))])
    mono_r = M.decode_mp3_pcm([M.parse_mp3_frame(M.encode_mp3_frame(
        [[right], [dict(empty)]], sample_rate=44100,
        bitrate_kbps=256))])
    assert np.allclose(pl, mono_l, rtol=1e-12, atol=1e-15)
    assert np.allclose(pr, mono_r, rtol=1e-12, atol=1e-15)
    assert not np.allclose(pl, pr)

    # (b) is_pos 9 in an intensity band -> loud, not tan(3pi/4)
    # (band 8 is a slen1 slot; scalefac_compress 14 -> slen1=4 bits)
    r2 = dict(left, pairs=[(1, -1)] * 5, scalefac_compress=14,
              scalefacs=[0] * 8 + [9] + [0] * 12)
    fb = bytearray(M.encode_mp3_frame(
        [[dict(left), r2], [dict(empty), dict(empty)]],
        sample_rate=44100, bitrate_kbps=320, intensity=True))
    with pytest.raises(ValueError, match="intensity position 9"):
        M.decode_mp3_pcm([M.parse_mp3_frame(bytes(fb))],
                         channel=None)

    # channel=None on mono is a usage error
    with pytest.raises(ValueError, match="2-channel"):
        M.decode_mp3_pcm([M.parse_mp3_frame(M.encode_mp3_frame(
            [[dict(empty)], [dict(empty)]], sample_rate=44100,
            bitrate_kbps=160))], channel=None)


def _short_granule(rng, np_pairs, scalefacs, gain=176, mixed=0,
                   subblock_gain=(0, 0, 0)):
    """A SHORT (or mixed) granule for per-window intensity tests."""
    return {
        "block_type": 2, "mixed_block_flag": mixed,
        "scalefac_compress": 13, "global_gain": gain,
        "preflag": 0, "scalefac_scale": 0,
        "table_select": [5, 9], "subblock_gain": list(subblock_gain),
        "scfsi": 0, "region0_count": None, "region1_count": None,
        "scalefacs": list(scalefacs), "count1table_select": 1,
        "pairs": [(rng.choice([-2, -1, 0, 1, 2]),
                   rng.choice([-2, -1, 0, 1, 2]))
                  for _ in range(np_pairs)],
        "quads": [],
    }


def _intensity_shell(frames, ms=False):
    """Encode one frame and patch mode_extension to 0b01 (or 0b11)."""
    fb = bytearray(M.encode_mp3_frame(frames, sample_rate=44100,
                                      bitrate_kbps=320, ms=ms))
    fb[3] = (fb[3] & 0x0F) | (0b01 << 6) | ((0b11 if ms else 0b01) << 4)
    return M.parse_mp3_frame(bytes(fb))


def test_intensity_short_sum_identity():
    """SHORT-block intensity (round 11): per-window borders over the
    right channel's decoded values; in every intensity band
    L + R == m (coefficients sum to 1; is_pos 6 gives m + 0; is_pos 7
    falls back with s == 0 above the border), and below the borders
    L + R == m + s — so PCM_L + PCM_R == mono(left) + mono(right)
    EXACTLY for any is_pos mix.  Any mis-placed window border, wrong
    scalefactor slot, or wrong pre-reorder indexing breaks this only
    if it also breaks the split ratios — the relational catalog
    oracle pins the per-line values; here we pin the linearity and
    the nonzero right channel."""
    rng = random.Random(61)
    is_positions = [rng.choice([0, 1, 2, 3, 4, 5, 6, 7])
                    for _ in range(36)]
    l0 = _short_granule(rng, 96, [rng.randrange(3) for _ in range(36)],
                        gain=180, subblock_gain=(0, 1, 0))
    r0 = _short_granule(rng, 22, is_positions, gain=174)
    l1 = _short_granule(rng, 80, [rng.randrange(3) for _ in range(36)],
                        gain=178)
    r1 = _short_granule(rng, 15, is_positions, gain=172,
                        subblock_gain=(1, 0, 0))
    shell = _intensity_shell([[l0, r0], [l1, r1]])
    assert shell["mode_ext"] == 0b01
    left, right = M.decode_mp3_pcm([shell], channel=None)

    def mono(g0, g1):
        fb = M.encode_mp3_frame([[g0], [g1]], sample_rate=44100,
                                bitrate_kbps=256)
        return M.decode_mp3_pcm([M.parse_mp3_frame(fb)])

    assert np.allclose(left + right, mono(l0, l1) + mono(r0, r1),
                       rtol=1e-9, atol=1e-12)
    assert float(np.abs(right).max()) > 0.0
    assert not np.allclose(left, right)


def test_intensity_short_per_window_borders():
    """The border is determined PER WINDOW: right-channel content
    confined to window 1 of band 5 leaves bands <= 5 of window 1
    stereo while windows 0 and 2 are intensity from band 0 up.
    Checked at the spectral level against _joint_spectra, line by
    line, with distinct is_pos per (band, window) slot."""
    rng = random.Random(67)
    widths = M.SFB_SHORT_WIDTHS[44100]
    starts = [0]
    for wd in widths:
        starts.append(starts[-1] + 3 * wd)
    # right: nonzero ONLY in window 1 of band 5 (lines 74..79)
    lo51 = starts[5] + 1 * widths[5]
    rvals = [0] * 576
    for k in range(widths[5]):
        rvals[lo51 + k] = rng.choice([-1, 1])
    rpairs = [(rvals[2 * i], rvals[2 * i + 1])
              for i in range((lo51 + widths[5] + 1) // 2)]
    is_positions = [(3 * b + w) % 8 for b in range(12)
                    for w in range(3)]
    # slot layout is band-major window-minor: slot 3*b + w
    l = _short_granule(rng, 150, [0] * 36, gain=180)
    r = _short_granule(rng, 0, is_positions, gain=174)
    r["pairs"] = rpairs
    shell = _intensity_shell([[l, r], [dict(l, pairs=[]),
                                       dict(r, pairs=[])]])
    g0, g1 = shell["granules"][0]
    assert g1["pairs"] == rpairs
    m = M.requantize(g0, 44100)
    s = M.requantize(g1, 44100)
    left, right = M._joint_spectra(shell, 0)
    for b in range(13):
        for w in range(3):
            lo = starts[b] + w * widths[b]
            ip = is_positions[3 * min(b, 11) + w]
            for k in range(widths[b]):
                i = lo + k
                if w == 1 and b <= 5:
                    # stereo part of window 1 (border band = 5)
                    assert left[i] == m[i], (b, w, k)
                    assert right[i] == s[i], (b, w, k)
                elif ip == 7:
                    assert left[i] == m[i], (b, w, k)
                    assert right[i] == s[i], (b, w, k)
                elif ip == 6:
                    assert left[i] == m[i], (b, w, k)
                    assert right[i] == 0.0, (b, w, k)
                else:
                    ratio = math.tan(ip * math.pi / 12)
                    assert left[i] == m[i] * (ratio / (1 + ratio)), \
                        (b, w, k)
                    assert right[i] == m[i] * (1 / (1 + ratio)), \
                        (b, w, k)


def test_intensity_mixed_long_part_gating():
    """MIXED-block intensity: the long region (lines 0-35) joins the
    intensity part ONLY when the right channel's short part is
    entirely zero in all three windows — then the border is scanned
    inside the long bands; otherwise the long region stays stereo."""
    rng = random.Random(71)
    # mixed layout: 8 long slots + 9 short bands x 3 windows = 35
    is_long = [(b * 5 + 3) % 8 for b in range(8)]
    is_short = [(3 * b + w + 1) % 8 for b in range(3, 12)
                for w in range(3)]
    sfs_r = is_long + is_short
    l = _short_granule(rng, 120, [1] * 35, gain=180, mixed=1)
    # right: content only in long lines 0..19 (10 pairs) -> short
    # part all zero; last_nz <= 19 -> long border at band 5
    # (SFB_LONG[44100][5] = 20 >= last_nz+1)
    r = _short_granule(rng, 0, sfs_r, gain=174, mixed=1)
    r["pairs"] = [(rng.choice([-1, 1]), rng.choice([-1, 1]))
                  for _ in range(10)]
    shell = _intensity_shell([[l, r], [dict(l, pairs=[]),
                                       dict(r, pairs=[])]])
    g0, g1 = shell["granules"][0]
    assert g1["mixed_block_flag"] == 1
    m = M.requantize(g0, 44100)
    s = M.requantize(g1, 44100)
    left, right = M._joint_spectra(shell, 0)
    sfbL = M.SFB_LONG[44100]
    last_nz = max(i for i, v in enumerate(M._values_576(g1)) if v)
    assert last_nz == 19
    # long bands below the border: stereo
    for i in range(20):
        assert left[i] == m[i]
        assert right[i] == s[i]
    # long bands 5-7 (lines 20-35): intensity with the LONG slots
    for b in range(5, 8):
        ip = is_long[b]
        for i in range(sfbL[b], sfbL[b + 1]):
            if ip == 7:
                assert left[i] == m[i] and right[i] == s[i], (b, i)
            elif ip == 6:
                assert left[i] == m[i] and right[i] == 0.0, (b, i)
            else:
                ratio = math.tan(ip * math.pi / 12)
                assert left[i] == m[i] * (ratio / (1 + ratio)), (b, i)
    # ALL short bands of ALL windows are intensity (border = band 2)
    widths = M.SFB_SHORT_WIDTHS[44100]
    starts = [0]
    for wd in widths:
        starts.append(starts[-1] + 3 * wd)
    for b in range(3, 13):
        for w in range(3):
            ip = is_short[3 * (min(b, 11) - 3) + w]
            lo = starts[b] + w * widths[b]
            for k in range(widths[b]):
                i = lo + k
                if ip == 7:
                    assert left[i] == m[i] and right[i] == s[i]
                elif ip == 6:
                    assert left[i] == m[i] and right[i] == 0.0
                else:
                    ratio = math.tan(ip * math.pi / 12)
                    assert right[i] == m[i] * (1 / (1 + ratio)), \
                        (b, w, k)

    # with short content PRESENT the long region stays STEREO
    r2 = dict(r, pairs=[(rng.choice([-1, 1]), rng.choice([-1, 1]))
                        for _ in range(40)])
    shell2 = _intensity_shell([[dict(l), r2], [dict(l, pairs=[]),
                                               dict(r2, pairs=[])]])
    m2 = M.requantize(shell2["granules"][0][0], 44100)
    s2 = M.requantize(shell2["granules"][0][1], 44100)
    left2, right2 = M._joint_spectra(shell2, 0)
    for i in range(36):
        assert left2[i] == m2[i], i
        assert right2[i] == s2[i], i


def test_intensity_short_with_ms_below_border():
    """mode_extension 0b11 on SHORT blocks: M-S butterfly below each
    window's border, intensity above; is_pos 7 bands above the
    border fall back to M-S (not L/R)."""
    rng = random.Random(73)
    is_positions = [7] * 36  # every band "intensity off"
    l = _short_granule(rng, 60, [0] * 36, gain=178)
    r = _short_granule(rng, 20, is_positions, gain=176)
    shell = _intensity_shell([[l, r], [dict(l, pairs=[]),
                                       dict(r, pairs=[])]], ms=True)
    assert shell["mode_ext"] == 0b11
    g0, g1 = shell["granules"][0]
    m = M.requantize(g0, 44100)
    s = M.requantize(g1, 44100)
    left, right = M._joint_spectra(shell, 0)
    s2 = math.sqrt(2.0)
    # all-7 positions: the WHOLE spectrum is the M-S butterfly
    for i in range(576):
        assert left[i] == (m[i] + s[i]) / s2, i
        assert right[i] == (m[i] - s[i]) / s2, i
