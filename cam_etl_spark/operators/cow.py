"""Copy-on-write bucketed upsert — MERGE semantics on plain parquet.

The reference's pipelines re-run whole table transforms to refresh
output (ref /root/reference/config.yml:4-15 — every run rewrites the
full .nq output; lf_address alone is ~130 min). The at-scale pattern
this module provides instead: lay the table out as hash buckets on the
merge key (a parquet partition column, so reads prune on it), and on
upsert rewrite ONLY the buckets that contain updated keys — at 100 TB
with 4096 buckets, a delta touching 1% of keys rewrites ~41 buckets
(~25 GB), not the table. No Delta/Iceberg dependency: the commit unit
is Spark's dynamic partition overwrite (per-write option, no session
conf mutation), which atomically replaces exactly the touched bucket
directories.

Trade-offs stated: the merge key must be stable (bucket = pmod(
xxhash64(key), n)); concurrent writers need external coordination (no
optimistic-concurrency log — that is what a real table format adds);
and bucket count is fixed at layout time (re-bucketing is a full
rewrite, same as clustering changes in Delta/Iceberg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_bucket(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    )


def write_bucketed(
    df: DataFrame, path: str, key_col: str, n_buckets: int
) -> None:
    """Initial layout: parquet partitioned by the key's hash bucket."""
    _with_bucket(df, key_col, n_buckets).write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(path)


def upsert_bucketed(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str,
    n_buckets: int,
) -> list[int]:
    """MERGE (upsert: update-on-match, insert-on-miss) into a bucketed
    parquet table, rewriting only the touched buckets. Returns the
    sorted list of rewritten bucket ids.

    Plan shape: the touched-bucket set is |updates|-bounded driver
    state (one distinct over the delta); the base read PRUNES to those
    partitions (partition filter on the bucket column); the anti-join
    removes superseded rows bucket-locally (both sides carry the same
    bucket, and keys never cross buckets by construction); dynamic
    partition overwrite replaces exactly the touched directories."""
    up = _with_bucket(updates, key_col, n_buckets)
    touched = sorted(
        r.bucket for r in up.select("bucket").distinct().collect()
    )
    base = spark.read.parquet(path).filter(F.col("bucket").isin(touched))
    merged = base.join(
        up.select(key_col), key_col, "left_anti"
    ).unionByName(up)
    (
        merged.write.partitionBy("bucket")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )
    return touched
