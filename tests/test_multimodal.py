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


def test_resize_contract(spark, sf_dir):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.multimodal import documents_as_media, resize_media

    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(20))
    out = resize_media(media, 64, 32).collect()
    assert len(out) == 20
    assert all(r["width"] == 64 and r["height"] == 32 for r in out)
    assert all(len(r["payload"]) == 64 * 32 for r in out)
    # deterministic: same input -> same surrogate payload
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_media(media, 64, 32).collect()}
    assert all(bytes(r["payload"]) == again[r["media_id"]] for r in out)


def test_frame_sample_fanout(spark, sf_dir):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.multimodal import documents_as_media, sample_frames

    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(50))
    frames = sample_frames(media, max_frames=8).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert len(by_media) == 50
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # 0..n-1 per media
        assert 1 <= len(idxs) <= 8


def test_feature_extract_feeds_ann(spark, sf_dir):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.multimodal import documents_as_media, extract_features
    from cam_etl_spark.operators.similarity import knn_brute_cosine

    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(100))
    feats = extract_features(media, dim=16)
    row = feats.first()
    assert len(row["embedding"]) == 16
    assert all(0.0 <= v < 1.0 for v in row["embedding"])
    out = knn_brute_cosine(feats, feats.filter("media_id < 3"), k=3,
                           id_col="media_id", vec_col="embedding")
    got = out.collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    assert all(r["neighbor_id"] != r["query_id"] for r in got)
