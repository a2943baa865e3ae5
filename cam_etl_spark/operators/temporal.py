"""Temporal join operators: as-of join and interval (range) join.

Spark has no ASOF JOIN or native range-join strategy (Catalyst plans an
inequality-only join condition as BroadcastNestedLoopJoin — a scan of every
point against every interval). Both operators here re-express the semantics
as one equi-shuffle plus narrow post-processing, the shape that survives a
100 TB input:

- ``asof_join``: union both sides tagged, one window pass per key carries
  the latest right-side row forward onto each left row. One shuffle on the
  key, no per-row range probe, no join explosion on hot keys (a key with
  m left × n right rows costs m+n window rows, not m×n pair rows).
- ``interval_join``: quantize time into fixed-width buckets; intervals
  explode to the buckets they cover, points map to exactly one bucket, and
  the pair space shrinks from |points| × |intervals| to co-bucketed pairs
  verified exactly. Pick the bucket width near the typical interval length:
  too small explodes the interval index, too large degrades toward the
  cross join within a bucket.

The reference has no temporal joins (its history chains are windowed
sequences, /root/reference/cam/tables/lf_address_history.py); these cover
the training-data-pipeline surface (event attribution, log↔window
correlation) the engine targets beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    ``on`` key and right_ts <= left_ts (inclusive, DuckDB/pandas
    ``merge_asof`` backward semantics). Inner: left rows with no prior
    right row are dropped. With ``tolerance_seconds``, matches older than
    the tolerance are dropped too.

    Implementation: tag right rows 0 and left rows 1, sort each key by
    (ts, tag) in ONE window pass, and carry the last non-null right payload
    forward. Right rows at the exact left timestamp sort first (tag 0 < 1),
    which is what makes the match at-or-before INCLUSIVE. Rows per key cost
    m+n, so a hot key degrades linearly, not quadratically; if one key
    dominates the corpus, pre-split it by time range and merge the seams.

    ``right`` must be unique per (on, right_ts) — pre-aggregate otherwise —
    so "the most recent right row" is well-defined and engine-independent.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]
    # The union/window plumbing claims _k/_ts/_tag/_asof_ts plus _r_*/_asof_*
    # per payload column; a left column with one of those names would alias-
    # collide and silently corrupt the carry-forward — reject up front (the
    # same guard interval_join applies to its internals).
    reserved = {"_k", "_ts", "_tag", "_asof_ts"}
    reserved |= {f"_r_{c}" for c in right_payload}
    reserved |= {f"_asof_{c}" for c in right_payload}
    clashes = sorted(reserved.intersection(left.columns))
    if clashes:
        raise ValueError(
            f"asof_join: left column(s) {clashes} collide with internal "
            "names (_k/_ts/_tag/_asof_ts/_r_*/_asof_*); rename them first"
        )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in left.columns],
    )
    # Align schemas for the union: left rows carry null right-payload.
    for c in right_payload:
        lt = lt.withColumn(f"_r_{c}", F.lit(None).cast(dict(r.dtypes)[f"_r_{c}"]))
    for c in left.columns:
        r = r.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    unioned = lt.select(r.columns).unionByName(r.select(r.columns))

    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(F.when(F.col("_tag") == 0, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("_asof_ts"),
        *[
            F.last(F.when(F.col("_tag") == 0, F.col(f"_r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in right_payload
        ],
    )
    out = carried.filter((F.col("_tag") == 1) & F.col("_asof_ts").isNotNull())
    if tolerance_seconds is not None:
        out = out.filter(
            F.col("_ts").cast("double") - F.col("_asof_ts").cast("double")
            <= F.lit(float(tolerance_seconds))
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("_asof_ts").alias(f"asof_{right_ts}"),
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    interval_start: str = "start_ts",
    interval_end: str = "end_ts",
    bucket_seconds: int = 300,
) -> DataFrame:
    """All (point, interval) pairs with start <= ts <= end (both ends
    inclusive), without a key — the genuinely-range join. Returns the
    point columns plus the interval columns.

    Implementation: quantize to ``bucket_seconds`` buckets. An interval
    [s, e] is indexed under every bucket it touches (sequence-explode); a
    point lives in exactly ONE bucket, so the bucket equi-join emits each
    qualifying pair at most once — no post-join dedup shuffle. The exact
    containment predicate then drops same-bucket near-misses. Shuffle
    volume is |points| + |intervals| × (len/bucket + 1), and only
    co-bucketed pairs are ever materialized — Catalyst's own plan for an
    inequality-only join is BroadcastNestedLoopJoin, every point × every
    interval. Degenerate long intervals fan out to many buckets: cap or
    split them upstream, or raise ``bucket_seconds``.
    """
    p_cols, i_cols = points.columns, intervals.columns
    dup = set(p_cols) & set(i_cols)
    if dup:
        raise ValueError(f"point/interval column collision: {sorted(dup)}")
    b = F.lit(int(bucket_seconds))
    p = points.withColumn("_bucket", F.floor(F.col(point_ts).cast("double") / b))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(interval_start).cast("double") / b),
                F.floor(F.col(interval_end).cast("double") / b),
            )
        ),
    )
    return (
        p.join(i, "_bucket")
        .filter(
            (F.col(point_ts) >= F.col(interval_start))
            & (F.col(point_ts) <= F.col(interval_end))
        )
        .select(*p_cols, *i_cols)
    )
