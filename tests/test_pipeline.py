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


def test_address_pipeline_streams(spark, sf_dir, tmp_path):
    """SURVEY §2.10 contract: the same bronze->join->fanout transform runs
    under Structured Streaming — streaming addresses, static dims,
    stream-static joins, quad fan-out, parquet sink. Result must equal the
    batch pipeline's quads."""
    from pyspark.sql import functions as F

    from cam_etl_spark.pipelines.address import address_quads, bronze_tables

    t = bronze_tables(spark, sf_dir)
    # batch reference (dedup'd quads)
    batch = {tuple(r) for r in address_quads(spark, sf_dir).collect()}

    # stream the address side from files; dims stay static
    addr_dir = str(tmp_path / "addr")
    t["addresses"].write.parquet(addr_dir)
    addr_stream = spark.readStream.schema(t["addresses"].schema).parquet(addr_dir)

    joined = (
        addr_stream.filter(F.col("addr_status_code") != "H")
        .join(t["sites"], "site_id")
        .join(F.broadcast(t["parcels"]), "parcel_id")
        .join(F.broadcast(t["roads"]), "road_id", "left")
        .join(F.broadcast(t["localities"]), "locality_code", "left")
    )
    from cam_etl_spark.pipelines.address import (
        ADDR_GRAPH,
        RDF_TYPE,
        SDO,
        STATUS_IRIS,
        _display_label,
    )
    from cam_etl_spark.quads import fan_out, quad_struct

    subj = F.format_string("https://example.org/address/%s", F.col("addr_id"))
    status_map = F.create_map(*[F.lit(x) for kv in STATUS_IRIS.items() for x in kv])
    quads = fan_out(
        joined,
        quad_struct(subj, RDF_TYPE, F.lit(SDO + "PostalAddress"), "iri", graph=ADDR_GRAPH),
        quad_struct(subj, SDO + "identifier", F.col("addr_id"), "literal",
                    object_datatype="https://example.org/datatype/address-pid", graph=ADDR_GRAPH),
        quad_struct(subj, SDO + "additionalType", status_map[F.col("addr_status_code")], "iri",
                    graph=ADDR_GRAPH),
        quad_struct(subj, SDO + "containedInPlace",
                    F.format_string("https://example.org/parcel/%s-%s", F.col("lot_no"), F.col("plan_no")),
                    "iri", graph=ADDR_GRAPH),
        F.when(F.col("road_name").isNotNull(),
               quad_struct(subj, SDO + "streetAddress",
                           F.format_string("https://example.org/road/%s", F.col("road_id")),
                           "iri", graph=ADDR_GRAPH)),
        F.when(F.col("unit_no").isNotNull(),
               quad_struct(subj, SDO + "unitCode", F.col("unit_no"), "literal", graph=ADDR_GRAPH)),
        quad_struct(subj, "http://www.w3.org/2000/01/rdf-schema#label", _display_label(),
                    "literal", graph=ADDR_GRAPH),
    )
    q = (
        quads.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {tuple(r) for r in spark.read.parquet(str(tmp_path / "out")).dropDuplicates().collect()}
    assert streamed == batch
