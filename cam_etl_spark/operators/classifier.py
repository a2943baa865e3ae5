"""Model-based quality filtering — the fastText-shaped linear classifier
step of web-corpus pipelines (CCNet, Wenzek et al. 2020 arXiv:1911.00359
§3.3; GPT-3's quality filter, Brown et al. 2020 Appendix A): score each
document with a linear model over hashed n-gram features and keep/bin by
threshold.

The classifier here is architecture-real and weights-synthetic: feature
extraction (unigram+bigram hashing trick), sparse dot product, bias,
sigmoid, and threshold are exactly the deployed shape; the weight vector
is a deterministic function of the bucket index standing in for a
vendored model snapshot (the container has no fastText, and the engine's
job is the DISTRIBUTED part — the per-bucket weight lookup is the same
broadcast join whether weights come from arithmetic or a 2 MB binary).

Scale shape (100 TB): tokenize + hash are scan-local column algebra; the
only shuffle is the per-(doc, bucket) count aggregation, whose width is
bounded by min(doc tokens, dim); the weight table is dim rows —
broadcast. Nothing is corpus-quadratic and no Python touches the hot
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cam_etl_spark.functions.text import tokens


def feature_hash_bucket(col, dim: int):
    """Portable feature-hashing bucket: first 8 hex chars of md5 read
    base-16, mod dim — byte-identical in DuckDB as
    ``('0x' || substr(md5(x), 1, 8))::bigint % dim``. Named distinctly
    from operators/sampling.hash_bucket (60-bit pmod-100 split hash):
    the two are NOT interchangeable and each has its own oracle twin."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % dim


def synthetic_weights(spark, dim: int) -> DataFrame:
    """Deterministic stand-in weight vector: Knuth-multiplicative mix of
    the bucket index into [-0.5, 0.5), replayable in integer SQL. A real
    model drops in as any (bucket, w) frame."""
    return spark.range(dim).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * 2654435761) % 1000 / 1000.0 - 0.5).alias("w"),
    )


def quality_classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    dim: int = 64,
    bias: float = 0.05,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a linear model over hashed unigram+bigram
    features (counts L1-normalized by feature total), sigmoid-squashed,
    thresholded. Returns (doc_id, n_feats, score, keep).

    Rounding discipline: the dot product is rounded to 9dp BEFORE the
    sigmoid and the score to 6dp before thresholding, so the float path
    is reproducible across engines (oracle-gotchas rule: round before
    thresholding in both)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            tokens(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
            lambda x: x != "",
        ).alias("tk"),
    )
    feats = toks.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("tk"),
                F.zip_with(
                    F.slice("tk", 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                    F.slice("tk", 2, F.greatest(F.size("tk") - 1, F.lit(0))),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            )
        ).alias("term"),
    )
    counts = feats.select("doc_id", feature_hash_bucket(F.col("term"), dim).alias("bucket")).groupBy(
        "doc_id", "bucket"
    ).agg(F.count("*").alias("c"))
    dot = (
        counts.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(
                F.sum(F.col("c") * F.col("w")) / F.sum("c") + bias, 9
            ).alias("z"),
        )
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6)
    return dot.select(
        "doc_id",
        "n_feats",
        score.alias("score"),
        (score > threshold).alias("keep"),
    )
