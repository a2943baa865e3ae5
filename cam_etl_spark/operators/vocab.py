"""Broadcast vocabulary/dictionary lookup (SURVEY J13) with the reference's
fail-fast strict mode.

The reference resolves codes against SKOS vocab graphs by prefLabel/altLabel
with static-map fallbacks, raising on an unmatched concept
(/root/reference/cam/etl/__init__.py:65-71, /root/reference/etl_qrt.py:145-148).
Spark form: broadcast left join + coalesce with a literal map, and strict
mode = count the unresolved rows post-join (one action) instead of raising
per-row inside a worker.
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
) -> DataFrame:
    """Left-join the (small, broadcast) vocab on a normalized key, fall back
    to the static map, optionally fail fast if anything stays unresolved."""
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
    out = joined.withColumn(out_col, F.coalesce(F.col("__vocab_value"), fallback)).drop(
        "__vocab_key", "__vocab_value"
    )
    if strict:
        bad = (
            out.filter(F.col(out_col).isNull() & F.col(code_col).isNotNull())
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
