"""Opt-in NATIVE fast path for shard decompression (round 14).

The engine's default decoders are its OWN from-spec implementations
(multimodal/zstd.py, xz.py, bzip2.py, inflate.py) — that is the
referee discipline: the real in-container libraries WRITE fixtures
and the from-spec readers are pinned byte-for-byte against them, so
the engine never merely wraps the library it is being checked
against. But a pure-Python LZMA range coder decodes an order of
magnitude slower per byte than liblzma; at a literal 100 TB the
CPU-seconds are real money. This module adds the production knob:

    CAM_ETL_NATIVE_CODECS=1   (env var, read per call)

routes ``decompress`` through the real library (stdlib ``lzma`` /
``bz2`` / ``gzip``, pyarrow's zstd) while the from-spec decoder stays
the default and the permanent referee. On a cluster, set it where the
executor Python workers see it — ``spark.executorEnv.
CAM_ETL_NATIVE_CODECS=1`` (or the submitting shell for local mode);
a driver-side ``os.environ`` mutation after session start does not
reach already-forked workers — an equal-output test pins
both paths byte-identical on every format (tests/test_fastpath.py),
and docs/SCALE.md records the measured per-byte crossover. The flag
changes WHICH engine inflates a shard, never what the bytes mean.
"""

from __future__ import annotations

import os

_FORMATS = ("zstd", "xz", "bz2", "gzip", "lz4", "brotli")


def native_enabled() -> bool:
    """True when the opt-in native-codec flag is set (read per call
    so executors and tests can toggle it via the environment)."""
    return os.environ.get("CAM_ETL_NATIVE_CODECS", "").lower() in (
        "1", "true", "yes")


def decompress(fmt: str, buf: bytes) -> bytes:
    """Decompress one shard payload. ``fmt`` ∈ {zstd, xz, bz2, gzip}.
    Default: the engine's from-spec decoder. With
    CAM_ETL_NATIVE_CODECS=1: the real in-container library."""
    if fmt not in _FORMATS:
        raise ValueError(
            f"fastpath: unknown shard format {fmt!r} "
            f"(supported: {', '.join(_FORMATS)})")
    if native_enabled():
        if fmt == "zstd":
            # streaming read: Codec.decompress needs the decompressed
            # size up front, which a shard frame need not declare
            import pyarrow as pa

            return pa.input_stream(
                pa.BufferReader(buf), compression="zstd").read()
        if fmt == "xz":
            import lzma

            return lzma.decompress(buf)
        if fmt == "bz2":
            import bz2

            return bz2.decompress(buf)
        if fmt == "lz4":
            # streaming read: the frame need not declare its size
            import pyarrow as pa

            return pa.input_stream(
                pa.BufferReader(buf), compression="lz4").read()
        if fmt == "brotli":
            import pyarrow as pa

            return pa.input_stream(
                pa.BufferReader(buf), compression="brotli").read()
        import gzip

        return gzip.decompress(buf)
    if fmt == "zstd":
        from cam_etl_spark.multimodal.zstd import zstd_decompress

        return zstd_decompress(buf)
    if fmt == "xz":
        from cam_etl_spark.multimodal.xz import xz_decompress

        return xz_decompress(buf)
    if fmt == "bz2":
        from cam_etl_spark.multimodal.bzip2 import bz2_decompress

        return bz2_decompress(buf)
    if fmt == "lz4":
        from cam_etl_spark.multimodal.lz4 import lz4_frame_decompress

        return lz4_frame_decompress(buf)
    if fmt == "brotli":
        from cam_etl_spark.multimodal.brotli import brotli_decompress

        return brotli_decompress(buf)
    from cam_etl_spark.multimodal.inflate import gzip_decompress

    return gzip_decompress(buf)[0]
