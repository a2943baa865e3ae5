"""Multimodal column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract steps run as Arrow-batched Pandas UDFs
over ``mapInPandas``. The actual codecs are NOT available in this
environment, so the decode step is stubbed behind a deterministic fake
(`fake_decode_meta`) and a clearly-marked NotImplementedError for real
decoding — the Spark-side plumbing (schema, partitioning, UDF signature,
batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = "media_id long, media_type string, n_bytes long, checksum string, width int, height int"


def real_decode(payload: bytes, media_type: str):
    """Real decoding entry point — requires PIL/librosa/av, not present in
    this container."""
    raise NotImplementedError(
        "media codecs are not available in this environment; use fake_decode_meta"
    )


def fake_decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder: derives (width, height) pseudo-
    dimensions from the payload bytes. Exercises the exact mapInPandas
    plumbing a real decoder would use (Arrow batches in, Arrow batches
    out, no driver collection)."""
    import hashlib

    for pdf in batches:
        n_bytes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
        checksum = pdf["payload"].map(
            lambda b: hashlib.md5(b).hexdigest() if b is not None else None
        )
        seed = pdf["payload"].map(
            lambda b: int.from_bytes(hashlib.md5(b or b"").digest()[:4], "big")
        )
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes,
                "checksum": checksum,
                "width": (seed % 1920 + 1).astype("int32"),
                "height": (seed // 1920 % 1080 + 1).astype("int32"),
            }
        )


def decode_media(df: DataFrame) -> DataFrame:
    """Partition-parallel media decode over Arrow batches."""
    return df.mapInPandas(fake_decode_meta, schema=DECODED_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text payloads as opaque binary media rows —
    lets the testdata exercise the multimodal path end-to-end."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


RESIZED_SCHEMA = "media_id long, media_type string, width int, height int, payload binary"


def fake_resize(target_w: int, target_h: int):
    """Deterministic stand-in resize: output payload is an md5-keyed
    fixed-size surrogate. Real implementation swaps the body for
    PIL.Image.resize; the mapInPandas contract (binary in → binary out,
    target dims closed over) is identical."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digest = pdf["payload"].map(lambda b: hashlib.md5(b or b"").digest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                    "payload": digest.map(
                        lambda d: (d * (target_w * target_h // len(d) + 1))[: target_w * target_h]
                    ),
                }
            )

    return run


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    return df.mapInPandas(fake_resize(width, height), schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int, frame_checksum string"


def fake_frame_sample(max_frames: int = 8):
    """Deterministic stand-in frame sampler: frame count derived from the
    payload hash, one output ROW PER FRAME — the 1→N fan-out shape a real
    video sampler (pyav keyframe iteration) produces. Arrow batches out can
    be larger than batches in; Spark handles the size change."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.md5(payload or b"").hexdigest()
                n = int(h[:8], 16) % max_frames + 1
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    sums.append(hashlib.md5(f"{h}:{i}".encode()).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_checksum": sums})

    return run


def sample_frames(df: DataFrame, max_frames: int = 8) -> DataFrame:
    return df.mapInPandas(fake_frame_sample(max_frames), schema=FRAMES_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Payload → deterministic pseudo-embedding (array<float>), the shape a
    real CLIP/audio encoder produces. Output feeds the similarity operators
    directly (media → features → ANN is one pipeline). Pure mapInPandas —
    at scale this is the GPU-batch boundary."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def vec(b):
            d = hashlib.md5(b or b"").digest() * (dim * 4 // 16 + 1)
            return [int.from_bytes(d[4 * i : 4 * i + 4], "big") % 1000 / 1000.0 for i in range(dim)]

        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "embedding": pdf["payload"].map(vec)}
            )

    return df.mapInPandas(run, schema=T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    ))
