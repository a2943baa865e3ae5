"""Flagship address-pipeline tests: golden counts, SHACL shape, label bytes."""

from pyspark.sql import functions as F


def test_post_join_count_invariant(spark, sf_dir):
    """The reference's reconciliation: produced addresses == source rows
    with status != 'H' (ref etl-notes.md:263-285)."""
    from cam_etl_spark.io import load_table
    from cam_etl_spark.operators.validate import reconcile_counts
    from cam_etl_spark.pipelines.address import address_quads

    live = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    quads = address_quads(spark, sf_dir)
    rec = reconcile_counts(live, quads, "https://schema.org/PostalAddress").collect()[0]
    assert rec["matches"] == 1, rec


def test_every_address_exactly_one_label(spark, sf_dir):
    from cam_etl_spark.operators.validate import cardinality_violations
    from cam_etl_spark.pipelines.address import address_quads

    quads = address_quads(spark, sf_dir)
    bad = cardinality_violations(
        quads,
        "http://www.w3.org/2000/01/rdf-schema#label",
        focus_type="https://schema.org/PostalAddress",
    )
    assert bad.count() == 0


def test_label_bytes_golden(spark, sf_dir):
    """Lock the exact spacing/punctuation: unit '/', range '-', road
    ' Name TYPE', locality ', NAME'."""
    from cam_etl_spark.pipelines.address import address_labels

    labels = {r["subject"]: r["label"] for r in address_labels(spark, sf_dir).collect()}
    # reconstruct expected for a few known keys present at every sf
    import re

    pat = re.compile(
        r"^(\d+/)?(\d+)(-\d+)?( Road \d+ (STREET|ROAD|AVENUE|LANE|DRIVE))?(, [A-Z ]+)?$"
    )
    assert labels, "no labels produced"
    bad = {s: l for s, l in labels.items() if not pat.match(l)}
    assert not bad, list(bad.items())[:3]
    # at least one of each structural variant must occur
    assert any("/" in l for l in labels.values())                # unit prefix
    assert any("-" in l.split(" ")[0] for l in labels.values())  # street range
    assert any(", " in l for l in labels.values())               # locality suffix
