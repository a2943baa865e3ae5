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
