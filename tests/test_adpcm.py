"""IMA ADPCM (multimodal/adpcm.py) vs CPython's audioop — the
independent C implementation of the same Intel/DVI algorithm: the
step table is re-EXTRACTED from audioop behaviorally, and the nibble
kernel and encoder are pinned byte-for-byte across random streams and
states. The WAV block framing (audioop has no container layer) gets
roundtrip + loud-boundary coverage."""

import random
import struct
import warnings

import pytest

from cam_etl_spark.multimodal.adpcm import (
    STEP_TABLE,
    ima_adpcm_decode,
    ima_adpcm_encode,
    pack_nibbles_low_first,
    unpack_nibbles_low_first,
    wav_ima_build,
    wav_ima_decode,
)

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import audioop


def _u16(b, i):
    return int.from_bytes(b[2 * i: 2 * i + 2], "little", signed=True)


def test_step_table_extracted_from_audioop():
    """decode(d=4) − decode(d=0) at index i recovers step_i exactly
    (vpdiff differs by precisely one step; pred −16384 keeps both
    probes clamp-free). A mistyped table entry cannot match."""
    def probe(idx):
        a, _ = audioop.adpcm2lin(bytes([0x40]), 2, (-16384, idx))
        b, _ = audioop.adpcm2lin(bytes([0x00]), 2, (-16384, idx))
        return _u16(a, 0) - _u16(b, 0)

    assert [probe(i) for i in range(89)] == STEP_TABLE


def test_decode_kernel_vs_audioop_random_streams():
    rng = random.Random(13)
    for trial in range(40):
        n = rng.randrange(2, 200, 2)
        data = bytes(rng.randrange(256) for _ in range(n // 2))
        state = (rng.randrange(-32768, 32768), rng.randrange(89))
        ref, ref_state = audioop.adpcm2lin(data, 2, state)
        # audioop packs the FIRST sample of each byte in the HIGH
        # nibble
        nibbles = [x for b in data for x in (b >> 4, b & 0xF)]
        ours, our_state = ima_adpcm_decode(nibbles, *state)
        assert ours == [_u16(ref, i) for i in range(n)], trial
        assert our_state == ref_state, trial


def test_encode_kernel_vs_audioop_random_streams():
    rng = random.Random(31)
    for trial in range(40):
        n = rng.randrange(2, 200, 2)
        samples = [rng.randrange(-32768, 32768) for _ in range(n)]
        pcm = b"".join(struct.pack("<h", s) for s in samples)
        state = (rng.randrange(-32768, 32768), rng.randrange(89))
        ref, ref_state = audioop.lin2adpcm(pcm, 2, state)
        nibs, our_state = ima_adpcm_encode(samples, *state)
        assert bytes(
            (nibs[i] << 4) | nibs[i + 1] for i in range(0, n, 2)
        ) == ref, trial
        assert our_state == ref_state, trial


def test_wav_block_roundtrip_and_fact_truncation():
    rng = random.Random(7)
    nibs = [rng.randrange(16) for _ in range(120)]
    buf = wav_ima_build(-1234, 17, nibs, sample_rate=16000)
    out = wav_ima_decode(buf)
    assert out["sample_rate"] == 16000
    expect, _ = ima_adpcm_decode(nibs, -1234, 17)
    assert out["samples"] == [-1234] + expect
    # nibble packing is low-first (the WAV layout, NOT audioop's)
    assert unpack_nibbles_low_first(
        pack_nibbles_low_first(nibs)) == nibs
    # fact truncation trims the trailing partial block
    i = buf.index(b"fact") + 8
    short = buf[:i] + struct.pack("<I", 100) + buf[i + 4:]
    assert len(wav_ima_decode(short)["samples"]) == 100


def test_loud_boundaries():
    with pytest.raises(ValueError, match="nibble 16"):
        ima_adpcm_decode([16], 0, 0)
    with pytest.raises(ValueError, match="step index"):
        ima_adpcm_decode([0], 0, 89)
    with pytest.raises(ValueError, match="odd nibble"):
        pack_nibbles_low_first([1, 2, 3])
    buf = wav_ima_build(0, 0, [1, 2, 3, 4])
    with pytest.raises(ValueError, match="RIFF"):
        wav_ima_decode(b"nope" + buf[4:])
    # foreign format tag stays loud
    i = buf.index(b"fmt ") + 8
    pcm_tag = buf[:i] + struct.pack("<H", 0x0001) + buf[i + 2:]
    with pytest.raises(NotImplementedError, match="format tag"):
        wav_ima_decode(pcm_tag)
    multi = buf[:i + 2] + struct.pack("<H", 3) + buf[i + 4:]
    with pytest.raises(NotImplementedError, match="channel"):
        wav_ima_decode(multi)
    # fact overdeclaring is a lie, not a truncation
    j = buf.index(b"fact") + 8
    over = buf[:j] + struct.pack("<I", 999) + buf[j + 4:]
    with pytest.raises(ValueError, match="fact declares"):
        wav_ima_decode(over)


def test_wav_stereo_interleave_roundtrip():
    """Stereo: 4-byte words alternate channels; each channel's state
    threads across its own words — equivalent to decoding each
    channel's full nibble stream with the (audioop-pinned) kernel."""
    rng = random.Random(99)
    left = [rng.randrange(16) for _ in range(64)]
    right = [rng.randrange(16) for _ in range(64)]
    buf = wav_ima_build([100, -200], [5, 40], [left, right],
                        sample_rate=22050)
    out = wav_ima_decode(buf)
    assert out["channels"] == 2
    el, _ = ima_adpcm_decode(left, 100, 5)
    er, _ = ima_adpcm_decode(right, -200, 40)
    assert out["samples"][0] == [100] + el
    assert out["samples"][1] == [-200] + er
    with pytest.raises(ValueError, match="multiples of 8"):
        wav_ima_build([0, 0], [0, 0], [[1] * 12, [2] * 12])


def test_zero_block_align_is_named(tmp_path=None):
    buf = bytearray(wav_ima_build(0, 0, [1, 2, 3, 4]))
    i = bytes(buf).index(b"fmt ") + 8
    struct.pack_into("<H", buf, i + 12, 0)  # blockAlign = 0
    with pytest.raises(ValueError, match="blockAlign"):
        wav_ima_decode(bytes(buf))
