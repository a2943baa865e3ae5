"""XZ/LZMA decoder (multimodal/xz.py) vs the REAL liblzma (stdlib
lzma writes every fixture): presets 0-9(+extreme) over shapes chosen
to exercise every decode path (random bytes, long zero runs = rep
matches, tiny alphabets, text, empty), the full legal (lc, lp, pb)
filter grid (every literal-context shape), both containers (.xz and
legacy .lzma/alone), all four integrity-check types, multi-stream
concatenation with padding — plus loud boundaries for tampering,
truncation, and unsupported filters."""

import lzma as _lzma
import random

import pytest

from cam_etl_spark.multimodal.xz import (
    lzma2_decompress,
    lzma_alone_decompress,
    xz_decompress,
)


def _cases():
    rng = random.Random(5)
    return [
        b"",
        b"x",
        b"abc" * 10,
        bytes(rng.randrange(256) for _ in range(80_000)),
        ("the quick brown fox jumps " * 8000).encode(),
        bytes(rng.choice(b"ab") for _ in range(120_000)),
        bytes(200_000),  # zeros: long rep-match chains
    ]


@pytest.mark.parametrize("preset", [0, 1, 6, 9])
def test_xz_and_alone_vs_real_liblzma(preset):
    for i, data in enumerate(_cases()):
        blob = _lzma.compress(data, format=_lzma.FORMAT_XZ,
                              preset=preset)
        assert xz_decompress(blob) == data, ("xz", preset, i)
        blob = _lzma.compress(data, format=_lzma.FORMAT_ALONE,
                              preset=preset)
        assert lzma_alone_decompress(blob) == data, \
            ("alone", preset, i)


def test_full_literal_context_grid():
    """liblzma requires lc+lp <= 4; every legal (lc, lp, pb) shape
    exercises a different literal-context layout."""
    data = ("mixed Content with CASE and 1234 numbers " * 2000) \
        .encode()
    for lc in (0, 1, 3, 4):
        for lp in (0, 1, 2):
            if lc + lp > 4:
                continue
            for pb in (0, 2):
                filt = [{"id": _lzma.FILTER_LZMA2,
                         "dict_size": 1 << 20,
                         "lc": lc, "lp": lp, "pb": pb}]
                blob = _lzma.compress(data, format=_lzma.FORMAT_XZ,
                                      filters=filt)
                assert xz_decompress(blob) == data, (lc, lp, pb)


def test_all_check_types_and_multistream():
    data = _cases()[3]
    for check in (_lzma.CHECK_NONE, _lzma.CHECK_CRC32,
                  _lzma.CHECK_CRC64, _lzma.CHECK_SHA256):
        blob = _lzma.compress(data, format=_lzma.FORMAT_XZ,
                              check=check)
        assert xz_decompress(blob) == data, check
    ms = (_lzma.compress(b"first|", preset=1) + b"\x00" * 4
          + _lzma.compress(b"second", preset=9))
    assert xz_decompress(ms) == b"first|second"


def test_loud_boundaries():
    good = _lzma.compress(b"payload bytes", preset=1)
    with pytest.raises(ValueError, match="magic"):
        xz_decompress(b"XXXXXX" + good[6:])
    # cutting the tail lands in the footer region — named either way
    with pytest.raises(ValueError, match="truncated|footer|CRC"):
        xz_decompress(good[:-8])
    # flip a check byte: the declared CRC64 no longer matches
    bad = bytearray(good)
    # the check bytes sit right before the index; tamper mid-stream
    bad[len(bad) // 2] ^= 0x01
    with pytest.raises(ValueError):
        xz_decompress(bytes(bad))
    # delta filter chains stay loud
    filt = [{"id": _lzma.FILTER_DELTA, "dist": 1},
            {"id": _lzma.FILTER_LZMA2, "preset": 1}]
    delta = _lzma.compress(b"abcabcabc", format=_lzma.FORMAT_XZ,
                           filters=filt)
    with pytest.raises(NotImplementedError, match="filter chain"):
        xz_decompress(delta)
    # raw LZMA2 stream without its end control
    raw = _lzma.compress(b"zz", format=_lzma.FORMAT_RAW,
                         filters=[{"id": _lzma.FILTER_LZMA2,
                                   "preset": 1}])
    assert lzma2_decompress(raw) == b"zz"
    with pytest.raises(ValueError, match="end-of-stream"):
        lzma2_decompress(raw[:-1])
    with pytest.raises(ValueError, match="props byte|bad props"):
        lzma_alone_decompress(bytes([225]) + b"\x00" * 12)


def test_mid_stream_dict_reset_uses_relative_positions():
    """Concatenating two raw LZMA2 streams (drop the first end
    control) is a valid stream whose SECOND half dict-resets at an
    arbitrary odd offset — the encoder restarts pos_state/literal
    contexts at 0 there, and a decoder using absolute positions
    desynchronizes (round-13 review finding)."""
    filt = [{"id": _lzma.FILTER_LZMA2, "dict_size": 1 << 20,
             "lc": 3, "lp": 1, "pb": 2}]
    a = b"alpha beta gamma " * 40 + b"Z"   # odd length
    b = b"delta epsilon zeta " * 50
    ra = _lzma.compress(a, format=_lzma.FORMAT_RAW, filters=filt)
    rb = _lzma.compress(b, format=_lzma.FORMAT_RAW, filters=filt)
    assert ra.endswith(b"\x00")
    assert lzma2_decompress(ra[:-1] + rb) == a + b


def test_lzma2_invalid_lclp_sum_is_loud():
    # props byte 224 = lc 8, lp 4 - legal LZMA1, illegal LZMA2
    bad = bytes([0xE0, 0x00, 0x00, 0x00, 0x00, 224])
    with pytest.raises(ValueError, match="lc\\+lp"):
        lzma2_decompress(bad)


def test_jsonl_framing_survives_unicode_line_separators():
    """The corpus-shard scans split decoded JSONL on newline ONLY:
    json.dumps(ensure_ascii=False) leaves U+2028/U+2029/U+0085 raw
    inside strings, and str.splitlines() would cut those records in
    half (round-13 review finding against the s69/s75 scan shape)."""
    import json

    text = "a b cd"
    blob = "".join(
        json.dumps({"doc_id": i, "text": text}, ensure_ascii=False)
        + "\n" for i in range(3)
    ).encode("utf-8")
    lines = [ln for ln in blob.decode("utf-8").split("\n") if ln]
    assert [json.loads(ln)["text"] for ln in lines] == [text] * 3
    # the buggy framing really does over-split this payload
    assert len(blob.decode("utf-8").splitlines()) > len(lines)
