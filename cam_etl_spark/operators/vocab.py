"""Broadcast vocabulary/dictionary lookup (SURVEY J13) with the reference's
fail-fast strict mode.

The reference resolves codes against SKOS vocab graphs by prefLabel/altLabel
with static-map fallbacks, raising on an unmatched concept
(/root/reference/cam/etl/__init__.py:65-71, /root/reference/etl_qrt.py:145-148).
Spark form: broadcast left join + coalesce with a literal map, and strict
mode = an inline ``raise_error`` guard on the resolved column — fail-fast
exactly when the query executes, with NO extra driver action (an eager
validation collect would re-run the whole upstream plan once per lookup;
at 100 TB that doubles the job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class UnresolvedConceptError(ValueError):
    pass


def vocab_df(spark: SparkSession, mapping: dict[str, str], key_col: str = "label", value_col: str = "concept_iri") -> DataFrame:
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], schema=f"{key_col} string, {value_col} string"
    )


def lookup_concept(
    df: DataFrame,
    vocab: DataFrame,
    code_col: str,
    out_col: str = "concept_iri",
    vocab_key: str = "label",
    vocab_value: str = "concept_iri",
    static_map: dict[str, str] | None = None,
    strict: bool = False,
    validate_now: bool = False,
) -> DataFrame:
    """Left-join the (small, broadcast) vocab on a normalized key, fall back
    to the static map, optionally fail fast if anything stays unresolved.
    ``strict`` = inline raise_error guard (free, fires when out_col is
    evaluated); ``validate_now`` = eager driver-side gate (one extra
    action, cannot be pruned, raises UnresolvedConceptError)."""
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
