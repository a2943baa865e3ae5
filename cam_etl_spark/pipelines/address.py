"""The flagship end-to-end pipeline: the reference's address extraction
(SURVEY §3.1, /root/reference/etl_lalf_address.py:719-739) re-expressed
Spark-first — per-table bronze reads, Spark-side multi-way join (Catalyst
plans it; the reference pushed one mega-SQL into Postgres), conditional
row→quad fan-out, display-label assembly, global quad dedup.

The testdata star schema stands in for the LALF tables with the same
referential shape (FIXTURES.md):

    orders   → lf_address  (addr_id, site_id→custkey, road_id, status,
                            unit/street parts derived deterministically)
    customer → lf_site     (site_id, parcel_id→nationkey)
    nation   → lf_parcel   (parcel_id, lot/plan)
    supplier → lf_road     (road_id, road_name, type code)
    region   → locality

All bronze columns are STRINGS (the reference ingests every column as
Postgres text, /root/reference/etl-notes.md:30); the silver projection
casts. Status mapping exercises the status-exclusion filter (P2): orders
with o_orderstatus = 'P' become historical 'H' rows and must vanish — the
post-join count invariant (/root/reference/etl-notes.md:263-285) checks
exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cam_etl_spark.io import load_table, scan_partitions
from cam_etl_spark.quads import dedup_quads, fan_out, quad_struct

ADDR_GRAPH = "urn:example:graph:addresses"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SDO = "https://schema.org/"

# F17-style code → IRI mapping (ref /root/reference/etl_lalf_address.py:313-367)
STATUS_IRIS = {
    "C": "https://example.org/def/address-status/current",
    "A": "https://example.org/def/address-status/active",
}
ROAD_TYPES = ["STREET", "ROAD", "AVENUE", "LANE", "DRIVE"]


def bronze_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Stringly-typed bronze frames in the reference's table shapes. Every
    column is cast to string at ingest — casts back happen in the silver
    projection, mirroring the in-query casts of the reference."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    r = load_table(spark, sf_dir, "region")

    k = F.col("o_orderkey")
    addresses = o.select(
        k.cast("string").alias("addr_id"),
        F.col("o_custkey").cast("string").alias("site_id"),
        (k % 100).cast("string").alias("road_id"),
        # P (pending) plays the reference's 'H' (historical, filtered out)
        F.when(F.col("o_orderstatus") == "P", "H")
        .when(F.col("o_orderstatus") == "F", "C")
        .otherwise("A")
        .alias("addr_status_code"),
        F.when(k % 3 == 0, (k % 50 + 1).cast("string")).alias("unit_no"),
        (k % 300 + 1).cast("string").alias("street_no_first"),
        F.when(k % 5 == 0, (k % 300 + 3).cast("string")).alias("street_no_last"),
        F.date_format("o_orderdate", "yyyyMMddHHmmss").alias("addr_create_date"),
    )
    sites = c.select(
        F.col("c_custkey").cast("string").alias("site_id"),
        (F.col("c_nationkey")).cast("string").alias("parcel_id"),
    )
    parcels = n.select(
        F.col("n_nationkey").cast("string").alias("parcel_id"),
        F.col("n_nationkey").cast("string").alias("lot_no"),
        F.concat(F.lit("SP"), F.col("n_regionkey").cast("string")).alias("plan_no"),
    )
    roads = s.select(
        F.col("s_suppkey").cast("string").alias("road_id"),
        F.regexp_replace("s_name", "Supplier#", "Road ").alias("road_name"),
        F.element_at(
            F.array(*[F.lit(t) for t in ROAD_TYPES]),
            (F.col("s_nationkey") % len(ROAD_TYPES) + 1).cast("int"),
        ).alias("road_type"),
        F.col("s_nationkey").cast("string").alias("locality_code"),
    )
    localities = n.join(r, n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").cast("string").alias("locality_code"),
        F.col("r_name").alias("locality_name"),
    )
    return {
        "addresses": addresses,
        "sites": sites,
        "parcels": parcels,
        "roads": roads,
        "localities": localities,
    }


def _joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The big extraction join (J1-J2): address ⋈ site ⋈ parcel, left ⋈ road
    ⋈ locality, status != 'H'. Small dims broadcast; the fact side never
    shuffles for them. Catalyst owns the join order."""
    t = bronze_tables(spark, sf_dir)
    fact = t["addresses"].filter(F.col("addr_status_code") != "H")
    # Tiny-SF inputs arrive as ONE parquet split, which would run the
    # whole broadcast-join + 7-way quad fan-out chain on a single core
    # until the first downstream shuffle. Fan the fact side out to the
    # cluster width in that case; at real scale the scan already has
    # more splits than cores and this branch is a no-op (no exchange).
    par = spark.sparkContext.defaultParallelism
    # memoized split count of the orders scan — fact is a narrow filter
    # over it, so the counts agree, and the per-build df.rdd plan-to-RDD
    # compilation (~150 ms) happens once per session, not once per build
    if scan_partitions(spark, sf_dir, "orders") < par:
        fact = fact.repartition(par)
    return (
        fact
        .join(t["sites"], "site_id")
        .join(F.broadcast(t["parcels"]), "parcel_id")
        .join(F.broadcast(t["roads"]), "road_id", "left")
        .join(F.broadcast(t["localities"]), "locality_code", "left")
    )


def _display_label() -> F.Column:
    """The reference's label assembly byte semantics
    (/root/reference/etl_lalf_address.py:676-686, SURVEY §7.3): ``unit/``
    prefix only when unit present, ``-last`` only for ranges, then road
    name + type and ``, LOCALITY``."""
    street = F.concat(
        F.col("street_no_first"),
        F.when(F.col("street_no_last").isNotNull(), F.concat(F.lit("-"), F.col("street_no_last"))).otherwise(F.lit("")),
    )
    unit = F.when(F.col("unit_no").isNotNull(), F.concat(F.col("unit_no"), F.lit("/"))).otherwise(F.lit(""))
    road = F.when(
        F.col("road_name").isNotNull(),
        F.concat(F.lit(" "), F.col("road_name"), F.lit(" "), F.col("road_type")),
    ).otherwise(F.lit(""))
    loc = F.when(
        F.col("locality_name").isNotNull(), F.concat(F.lit(", "), F.col("locality_name"))
    ).otherwise(F.lit(""))
    return F.concat(unit, street, road, loc)


def address_quads(
    spark: SparkSession, sf_dir: str, dedup: bool = True
) -> DataFrame:
    """Joined rows → conditionally-emitted quads (T1): type, identifier,
    status concept (F17 map), parcel/road links, null-guarded unit part
    (P7), label (F18). Globally deduped (U2) unless the caller composes
    this graph into a larger union that dedups once at the end
    (etl_end_to_end_counts) — a second identical shuffle of the same
    quads buys nothing."""
    j = _joined(spark, sf_dir)
    subj = F.format_string("https://example.org/address/%s", F.col("addr_id"))
    status_map = F.create_map(*[F.lit(x) for kv in STATUS_IRIS.items() for x in kv])
    quads = fan_out(
        j,
        quad_struct(subj, RDF_TYPE, F.lit(SDO + "PostalAddress"), "iri", graph=ADDR_GRAPH),
        quad_struct(subj, SDO + "identifier", F.col("addr_id"), "literal",
                    object_datatype="https://example.org/datatype/address-pid", graph=ADDR_GRAPH),
        quad_struct(subj, SDO + "additionalType", status_map[F.col("addr_status_code")], "iri",
                    graph=ADDR_GRAPH),
        quad_struct(subj, SDO + "containedInPlace",
                    F.format_string("https://example.org/parcel/%s-%s", F.col("lot_no"), F.col("plan_no")),
                    "iri", graph=ADDR_GRAPH),
        F.when(
            F.col("road_name").isNotNull(),
            quad_struct(subj, SDO + "streetAddress",
                        F.format_string("https://example.org/road/%s", F.col("road_id")),
                        "iri", graph=ADDR_GRAPH),
        ),
        F.when(
            F.col("unit_no").isNotNull(),
            quad_struct(subj, SDO + "unitCode", F.col("unit_no"), "literal", graph=ADDR_GRAPH),
        ),
        quad_struct(subj, "http://www.w3.org/2000/01/rdf-schema#label", _display_label(),
                    "literal", graph=ADDR_GRAPH),
    )
    return dedup_quads(quads) if dedup else quads


def address_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subject, label) for every live address — the byte-exact label
    surface the golden tests lock."""
    j = _joined(spark, sf_dir)
    return j.select(
        F.format_string("https://example.org/address/%s", F.col("addr_id")).alias("subject"),
        _display_label().alias("label"),
    )
