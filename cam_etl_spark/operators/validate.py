"""Validation operators — the reference's correctness machinery (SURVEY §5)
as engine primitives:

1. §5.1 pre-validation gates (every distinct code must resolve) —
   ``unresolved_codes`` / strict mode in operators.vocab.
2. §5.3 golden-count reconciliation (source count == output-graph count) —
   ``reconcile_counts``.
3. §5.4 SHACL-shape cardinality (every Address has exactly one rdfs:label,
   /root/reference/shacl.ttl:1-13) — ``cardinality_violations``.

All return DataFrames of violations (empty == valid), so they compose into
pipelines and fail-fast wrappers alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def unresolved_codes(df: DataFrame, code_col: str, lookup: DataFrame) -> DataFrame:
    """Distinct codes with no vocab match — the pre-validation gate
    (/root/reference/etl_pndb_pre_validate.py:28-58) as an anti-join.
    Empty result == safe to run the transform."""
    keys = lookup.select(F.upper(F.trim(F.col("label"))).alias("__k")).distinct()
    return (
        df.select(F.upper(F.trim(F.col(code_col))).alias("code"))
        .filter(F.col("code").isNotNull() & (F.col("code") != ""))
        .distinct()
        .join(F.broadcast(keys), F.col("code") == F.col("__k"), "left_anti")
    )


def cardinality_violations(
    quads: DataFrame,
    predicate: str,
    focus_type: str | None = None,
    min_count: int = 1,
    max_count: int = 1,
) -> DataFrame:
    """Subjects violating a SHACL-ish cardinality shape: each focus subject
    must carry between min_count and max_count values of ``predicate``.
    Returns (subject, n) for violators. One shuffle on subject; the
    focus-type restriction is a semi-join on the (pruned) type quads."""
    focus = quads
    if focus_type is not None:
        typed = (
            quads.filter((F.col("predicate") == RDF_TYPE) & (F.col("object_value") == focus_type))
            .select("subject")
            .distinct()
        )
        focus = quads.join(typed, "subject", "left_semi")
    counts = (
        focus.filter(F.col("predicate") == predicate)
        .groupBy("subject")
        .agg(F.count("*").alias("n"))
    )
    if focus_type is not None:
        typed_all = (
            quads.filter((F.col("predicate") == RDF_TYPE) & (F.col("object_value") == focus_type))
            .select("subject")
            .distinct()
        )
        counts = typed_all.join(counts, "subject", "left").na.fill({"n": 0})
    return counts.filter((F.col("n") < min_count) | (F.col("n") > max_count))


def reconcile_counts(
    source: DataFrame, quads: DataFrame, entity_type: str
) -> DataFrame:
    """Golden-count reconciliation (/root/reference/etl-queries.md,
    /root/reference/etl-notes.md:263-285): the number of source rows that
    survived the filters must equal the number of distinct subjects of the
    produced type. Returns one row (source_rows, graph_subjects, matches)."""
    src = source.agg(F.count("*").alias("source_rows"))
    out = (
        quads.filter((F.col("predicate") == RDF_TYPE) & (F.col("object_value") == entity_type))
        .agg(F.countDistinct("subject").alias("graph_subjects"))
    )
    return src.crossJoin(out).withColumn(
        "matches", (F.col("source_rows") == F.col("graph_subjects")).cast("int")
    )
