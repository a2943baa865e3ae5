"""SKOS vocabulary source (SURVEY S5).

The reference fetches ~20 SKOS Turtle graphs over HTTP at driver start and
pickles the parsed graph to every worker
(/root/reference/cam/etl/__init__.py:55-62,
/root/reference/etl_lalf_address.py:696-709); workers then resolve codes to
concept IRIs by matching skos:prefLabel/altLabel
(/root/reference/cam/etl/__init__.py:65-71).

Spark-first equivalent: vocab graphs are vendored locally as N-Quads/N-Triples
snapshots (SURVEY §7.3 — pin vocab revisions for reproducibility), parsed
with the engine's own quad reader, reshaped into a (label → concept_iri)
lookup DataFrame, and broadcast into the join (operators.vocab.lookup_concept).
The driver-side HTTP fetch is out of engine scope by design: a deployment
fetches to a local snapshot first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cam_etl_spark.quads import read_nquads

SKOS = "http://www.w3.org/2004/02/skos/core#"
PREF_LABEL = SKOS + "prefLabel"
ALT_LABEL = SKOS + "altLabel"
IN_SCHEME = SKOS + "inScheme"


def skos_labels(spark: SparkSession, path: str) -> DataFrame:
    """All (concept_iri, label, label_kind, scheme) rows of a vendored SKOS
    graph snapshot (N-Quads/N-Triples). One small scan; no shuffle beyond
    the scheme join (broadcast — vocabs are tiny)."""
    quads = read_nquads(spark, path)
    labels = quads.filter(F.col("predicate").isin(PREF_LABEL, ALT_LABEL)).select(
        F.col("subject").alias("concept_iri"),
        F.col("object_value").alias("label"),
        F.when(F.col("predicate") == PREF_LABEL, "pref").otherwise("alt").alias("label_kind"),
    )
    schemes = quads.filter(F.col("predicate") == IN_SCHEME).select(
        F.col("subject").alias("concept_iri"), F.col("object_value").alias("scheme")
    )
    return labels.join(F.broadcast(schemes), "concept_iri", "left")


def skos_lookup_df(
    spark: SparkSession, path: str, scheme: str | None = None, casefold: bool = True
) -> DataFrame:
    """The (label → concept_iri) lookup table consumed by
    operators.vocab.lookup_concept — the broadcast side of the vocab join
    (SURVEY J13). prefLabel wins over altLabel on label collisions, matching
    the reference's first-match-by-label semantics."""
    labels = skos_labels(spark, path)
    if scheme is not None:
        labels = labels.filter(F.col("scheme") == scheme)
    key = F.upper(F.col("label")) if casefold else F.col("label")
    ranked = labels.select(
        key.alias("label"),
        F.col("concept_iri"),
        F.when(F.col("label_kind") == "pref", 0).otherwise(1).alias("pri"),
    )
    w = F.row_number().over(Window.partitionBy("label").orderBy("pri", "concept_iri"))
    return ranked.withColumn("rn", w).filter(F.col("rn") == 1).select("label", "concept_iri")
