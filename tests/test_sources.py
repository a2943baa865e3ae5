"""SURVEY S5 (vocab source) and S11 (search-index sink) tests."""

import json
import os

from pyspark.sql import functions as F


def _write_vocab(spark, tmp_path) -> str:
    """Vendor a tiny SKOS snapshot through the engine's own N-Quads sink."""
    from cam_etl_spark.quads import write_nquads

    rows = [
        ("https://ex.org/def/rt/street", "http://www.w3.org/2004/02/skos/core#prefLabel",
         "STREET", "literal", None, None, "urn:g:vocabs"),
        ("https://ex.org/def/rt/street", "http://www.w3.org/2004/02/skos/core#altLabel",
         "ST", "literal", None, None, "urn:g:vocabs"),
        ("https://ex.org/def/rt/street", "http://www.w3.org/2004/02/skos/core#inScheme",
         "https://ex.org/def/rt", "iri", None, None, "urn:g:vocabs"),
        ("https://ex.org/def/rt/road", "http://www.w3.org/2004/02/skos/core#prefLabel",
         "ROAD", "literal", None, None, "urn:g:vocabs"),
        ("https://ex.org/def/rt/road", "http://www.w3.org/2004/02/skos/core#inScheme",
         "https://ex.org/def/rt", "iri", None, None, "urn:g:vocabs"),
        # a second scheme that must be filterable away
        ("https://ex.org/def/other/road", "http://www.w3.org/2004/02/skos/core#prefLabel",
         "ROAD", "literal", None, None, "urn:g:vocabs"),
        ("https://ex.org/def/other/road", "http://www.w3.org/2004/02/skos/core#inScheme",
         "https://ex.org/def/other", "iri", None, None, "urn:g:vocabs"),
    ]
    quads = spark.createDataFrame(
        rows,
        "subject string, predicate string, object_value string, object_kind string,"
        "object_datatype string, object_lang string, graph string",
    )
    path = str(tmp_path / "vocab.nq")
    write_nquads(quads, path)
    return path


def test_skos_lookup_prefers_pref_label_and_filters_scheme(spark, tmp_path):
    from cam_etl_spark.sources.vocab import skos_labels, skos_lookup_df

    path = _write_vocab(spark, tmp_path)
    labels = skos_labels(spark, path)
    assert labels.count() == 4  # pref STREET, alt ST, pref ROAD ×2 schemes
    lookup = skos_lookup_df(spark, path, scheme="https://ex.org/def/rt")
    got = {r["label"]: r["concept_iri"] for r in lookup.collect()}
    assert got == {
        "STREET": "https://ex.org/def/rt/street",
        "ST": "https://ex.org/def/rt/street",
        "ROAD": "https://ex.org/def/rt/road",  # other-scheme ROAD filtered out
    }


def test_skos_lookup_feeds_broadcast_join(spark, tmp_path):
    """End-to-end J13: codes resolve to concept IRIs through the vocab
    lookup, exactly like the reference's concept-by-label matching."""
    from cam_etl_spark.operators.vocab import lookup_concept
    from cam_etl_spark.sources.vocab import skos_lookup_df

    path = _write_vocab(spark, tmp_path)
    lookup = skos_lookup_df(spark, path, scheme="https://ex.org/def/rt")
    data = spark.createDataFrame([("st",), ("Road",), ("street",)], "code string")
    out = lookup_concept(data, lookup, "code")
    iris = [r["concept_iri"] for r in out.orderBy("code").collect()]
    assert iris == [
        "https://ex.org/def/rt/road",
        "https://ex.org/def/rt/street",
        "https://ex.org/def/rt/street",
    ]


def test_index_sink_batches_and_schema(spark, tmp_path):
    from cam_etl_spark.sources.index_sink import index_documents, jsonl_dir_writer

    out_dir = str(tmp_path / "idx")
    df = spark.range(25).select(
        F.col("id").alias("doc_id"), F.format_string("label-%s", "id").alias("label")
    ).repartition(2)
    index_documents(df, jsonl_dir_writer(out_dir), batch_size=10, filterable=["label"])

    docs, schema_decls = [], []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            for line in f:
                d = json.loads(line)
                (schema_decls if "__filterable_attributes__" in d else docs).append(d)
    assert len(docs) == 25
    assert {d["doc_id"] for d in docs} == set(range(25))
    assert all(d["label"] == f"label-{d['doc_id']}" for d in docs)
    # one facet-schema declaration per partition, each batch ≤ batch_size
    assert len(schema_decls) == 2
