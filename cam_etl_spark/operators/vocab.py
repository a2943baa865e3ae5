"""Broadcast vocabulary/dictionary lookup (SURVEY J13) with the reference's
fail-fast strict mode.

The reference resolves codes against SKOS vocab graphs by prefLabel/altLabel
with static-map fallbacks, raising on an unmatched concept
(/root/reference/cam/etl/__init__.py:65-71, /root/reference/etl_qrt.py:145-148).
Spark form: broadcast left join + coalesce with a literal map, and strict
mode = an eager driver-side gate (safe default — an inline guard alone is
pruned by Catalyst when downstream drops the column) plus an inline
``raise_error`` guard.  Callers whose plan provably evaluates the output
column opt out of the gate with ``validate_now=False`` and keep strict
fail-fast at zero extra driver actions (an eager validation collect
re-runs the whole upstream plan once per lookup; at 100 TB that doubles
the job — but a silently skipped validation is worse than a slow one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class UnresolvedConceptError(ValueError):
    pass


# Per-session memo of the tiny static-vocab LocalRelation (a PLAN whose
# rows are literals from the caller's mapping — no data derived from any
# input is cached). createDataFrame pays a schema-inference + Arrow
# conversion + py4j storm (~40 ms) per call, and hot builders
# (t3_road_vocab_fanout inside etl_end_to_end_counts) rebuild the same
# 5-row vocab every query build. Stored as an attribute ON the session
# (io._session_cache) — a module-level WeakKeyDictionary can never evict
# because the cached DataFrames strongly reference their session.


def vocab_df(spark: SparkSession, mapping: dict[str, str], key_col: str = "label", value_col: str = "concept_iri") -> DataFrame:
    from cam_etl_spark.io import _session_cache

    cache = _session_cache(spark, "_cam_etl_vocab_plans")
    key = (tuple(sorted(mapping.items())), key_col, value_col)
    hit = cache.get(key)
    if hit is not None:
        return hit
    # LocalRelation, not createDataFrame: the pickled-RDD frame makes
    # every broadcast build of this vocab spawn Python-worker scan tasks
    # (io.local_values_df — same fix as the mmr/bpe result frames).
    from cam_etl_spark.io import local_values_df

    df = local_values_df(
        spark,
        [(k, v) for k, v in mapping.items()],
        f"{key_col} string, {value_col} string",
    )
    cache[key] = df
    return df


def lookup_concept(
    df: DataFrame,
    vocab: DataFrame,
    code_col: str,
    out_col: str = "concept_iri",
    vocab_key: str = "label",
    vocab_value: str = "concept_iri",
    static_map: dict[str, str] | None = None,
    strict: bool = False,
    validate_now: bool | None = None,
) -> DataFrame:
    """Left-join the (small, broadcast) vocab on a normalized key, fall back
    to the static map, optionally fail fast if anything stays unresolved.

    ``strict`` adds an inline raise_error guard (free, fires when out_col
    is evaluated) AND — by default — the eager driver-side gate
    (``validate_now``), because Catalyst prunes the inline guard away in
    plans that drop out_col, silently skipping validation.  Callers whose
    plan provably evaluates out_col can pass ``validate_now=False`` to
    keep strict mode zero-extra-action; the eager gate costs one action
    that re-runs the upstream plan and raises UnresolvedConceptError."""
    if validate_now is None:
        validate_now = strict
    v = F.broadcast(
        vocab.select(
            F.upper(F.trim(F.col(vocab_key))).alias("__vocab_key"),
            F.col(vocab_value).alias("__vocab_value"),
        ).dropDuplicates(["__vocab_key"])
    )
    joined = df.join(v, F.upper(F.trim(F.col(code_col))) == F.col("__vocab_key"), "left")
    fallback = F.lit(None).cast("string")
    if static_map:
        mapping = F.create_map(*[F.lit(x) for kv in static_map.items() for x in kv])
        fallback = mapping[F.upper(F.trim(F.col(code_col)))]
    resolved = F.coalesce(F.col("__vocab_value"), fallback)
    if strict:
        # JVM-side guard: the first unresolved non-null code aborts the job
        # with the offending value in the message — same fail-fast contract
        # as the reference's per-row raise, but zero extra Spark actions.
        # CAVEAT: the guard lives in the out_col expression, so it fires
        # only in plans that actually EVALUATE out_col — Catalyst prunes it
        # away if downstream drops the column. For a hard gate regardless
        # of downstream shape, use validate_now=True (one extra action).
        resolved = F.when(
            F.col(code_col).isNotNull() & resolved.isNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"unresolved code in {code_col}: "), F.col(code_col)
                )
            ),
        ).otherwise(resolved)
    out = joined.withColumn(out_col, resolved).drop("__vocab_key", "__vocab_value")
    if validate_now:
        # eager gate: costs one action that re-runs the upstream plan, but
        # cannot be pruned and raises the typed error on the driver
        bad = (
            joined.filter(
                F.col(code_col).isNotNull()
                & F.coalesce(F.col("__vocab_value"), fallback).isNull()
            )
            .select(code_col)
            .distinct()
            .limit(20)
            .collect()
        )
        if bad:
            raise UnresolvedConceptError(
                f"unresolved codes in {code_col}: {[r[0] for r in bad]}"
            )
    return out
