"""G.711 µ-law/A-law — exhaustive cross-check against CPython's
audioop (independent reference) plus the code-level round trip."""

import struct
import warnings

import pytest

from cam_etl_spark.multimodal import g711 as G

try:  # stdlib audioop was removed in Python 3.13 (PEP 594)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import audioop
except ModuleNotFoundError:  # pragma: no cover - Python >= 3.13
    audioop = None


@pytest.mark.skipif(audioop is None, reason="audioop removed in 3.13")
def test_decode_matches_audioop_exhaustively():
    ref_u = struct.unpack("<256h", audioop.ulaw2lin(bytes(range(256)), 2))
    ref_a = struct.unpack("<256h", audioop.alaw2lin(bytes(range(256)), 2))
    assert G.ULAW_TABLE == list(ref_u)
    assert G.ALAW_TABLE == list(ref_a)


def test_code_level_roundtrip():
    # the single µ-law exception is the ±0 degeneracy: codes 127 and
    # 255 both decode to 0, and encode(0) canonically picks 255
    for u in range(256):
        want = 255 if u == 127 else u
        assert G.ulaw_encode(G.ULAW_TABLE[u]) == want, u
    for a in range(256):
        assert G.alaw_encode(G.ALAW_TABLE[a]) == a, a


def test_wav_carriage_and_boundaries():
    codes = bytes(range(256))
    for law, table in (("ulaw", G.ULAW_TABLE), ("alaw", G.ALAW_TABLE)):
        wav = G.encode_wav_g711(codes, law, sample_rate=8000)
        m = G.decode_wav_g711(wav)
        assert m["law"] == law and m["sample_rate"] == 8000
        assert m["samples"] == [table[b] for b in codes]
    # PCM fmt code is not G.711 — loud reject, never mis-expanded
    from cam_etl_spark.multimodal.codecs import encode_wav

    pcm_wav = encode_wav(3, sample_rate=8000, samples=b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="not G.711"):
        G.decode_wav_g711(pcm_wav)
    with pytest.raises(ValueError, match="RIFF"):
        G.decode_wav_g711(b"nope")
