"""Multimodal binary-column plumbing: schema, Arrow batch shape, determinism."""

import pytest


def test_decode_media_deterministic(spark, sf_dir):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.multimodal import decode_media, documents_as_media

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = documents_as_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    out1 = {r["media_id"]: (r["checksum"], r["width"], r["height"]) for r in decode_media(media).collect()}
    out2 = {r["media_id"]: (r["checksum"], r["width"], r["height"]) for r in decode_media(media.repartition(7)).collect()}
    assert out1 == out2  # partitioning must not change results
    w, h = next(iter(out1.values()))[1:]
    assert 1 <= w <= 1920 and 1 <= h <= 1080


def test_real_decode_is_stubbed():
    from cam_etl_spark.multimodal import real_decode

    with pytest.raises(NotImplementedError):
        real_decode(b"bytes", "image")
