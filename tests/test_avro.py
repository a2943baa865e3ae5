"""Avro object container files (sources/avro_io.py) — round trip over
the full binary encoding, independent-reference cross-checks against
the REAL Apache Avro Java library shipped in the Spark distribution
(avro-1.12.1.jar, driven over py4j), and corruption handling."""

import json
import os
import struct
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cam_etl_spark.sources import avro_io as A

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Order",
        "namespace": "engine.test",
        "fields": [
            {"name": "k", "type": "long"},
            {
                "name": "status",
                "type": {"type": "enum", "name": "St", "symbols": ["O", "F", "P"]},
            },
            {"name": "price", "type": "double"},
            {"name": "note", "type": ["null", "string"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "int"}},
            {"name": "blob", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "F8", "size": 8}},
        ],
    }
)


def _rows(n):
    return [
        {
            "k": i * 1_000_003,
            "status": ["O", "F", "P"][i % 3],
            "price": i * 1.5 - 7,
            "note": None if i % 2 else f"n{i}",
            "tags": [f"t{j}" for j in range(i % 4)],
            "props": {f"p{j}": j - 1 for j in range(i % 3)},
            "blob": bytes([i % 256] * (i % 5)),
            "fx": bytes(range(8)),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_roundtrip_all_codecs_multiblock(codec):
    rows = _rows(257)
    buf = A.write_container(SCHEMA, rows, codec=codec, objects_per_block=100)
    back = A.read_container(buf)
    assert back["values"] == rows
    assert back["codec"] == codec
    assert back["n_blocks"] == 3


def test_union_int_long_branch_by_width():
    """An ["int","long"] union must route values wider than 32 bits to
    the long branch instead of picking the first type-compatible branch
    and failing 'int out of range' (round-9 ADVICE item)."""
    schema = json.dumps(
        {
            "type": "record",
            "name": "U",
            "fields": [{"name": "v", "type": ["int", "long"]}],
        }
    )
    rows = [{"v": 7}, {"v": 2**31}, {"v": -(2**31) - 1}, {"v": 2**62}]
    back = A.read_container(A.write_container(schema, rows))
    assert back["values"] == rows
    # and the narrow value really did take the int branch (1-byte index 0
    # + zigzag varint payload is shorter than a long-branch encoding of
    # the same container with all-long values)
    w = A._Writer() if hasattr(A, "_Writer") else None
    if w is not None:
        i, b = A._union_branch(
            {"type": "union", "branches": [{"type": "int"}, {"type": "long"}]}, 7
        )
        assert b["type"] == "int"
        i, b = A._union_branch(
            {"type": "union", "branches": [{"type": "int"}, {"type": "long"}]},
            2**31,
        )
        assert b["type"] == "long"


def test_empty_container_and_determinism():
    assert A.read_container(A.write_container(SCHEMA, []))["values"] == []
    a = A.write_container(SCHEMA, _rows(10), codec="deflate")
    b = A.write_container(SCHEMA, _rows(10), codec="deflate")
    assert a == b  # deterministic sync marker -> reproducible task output


def test_zigzag_spec_vectors():
    # the spec's published example encodings
    for v, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                    (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                    (64, b"\x80\x01")]:
        w = A._Writer()
        w.long(v)
        assert bytes(w.out) == want, v
        assert A._Reader(want).long() == v


def test_named_type_reference_and_recursion():
    schema = json.dumps(
        {
            "type": "record",
            "name": "Node",
            "fields": [
                {"name": "v", "type": "int"},
                {"name": "next", "type": ["null", "Node"]},
            ],
        }
    )
    rows = [{"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}}]
    assert A.read_container(A.write_container(schema, rows))["values"] == rows


def test_logical_type_annotation_passthrough():
    schema = json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {
                    "name": "ts",
                    "type": {"type": "long", "logicalType": "timestamp-micros"},
                }
            ],
        }
    )
    parsed = A.parse_schema(schema)
    assert parsed["fields"][0]["schema"]["logicalType"] == "timestamp-micros"
    rows = [{"ts": 1_700_000_000_000_000}]
    assert A.read_container(A.write_container(schema, rows))["values"] == rows


def test_value_errors_loud():
    schema = json.dumps(
        {"type": "record", "name": "R", "fields": [{"name": "i", "type": "int"}]}
    )
    with pytest.raises(ValueError, match="int out of range"):
        A.write_container(schema, [{"i": 2**33}])
    with pytest.raises(ValueError, match="missing field"):
        A.write_container(schema, [{}])
    with pytest.raises(ValueError, match="unknown codec"):
        A.write_container(schema, [{"i": 1}], codec="zstd")
    u = json.dumps(
        {
            "type": "record",
            "name": "R2",
            "fields": [{"name": "x", "type": ["null", "long"]}],
        }
    )
    with pytest.raises(ValueError, match="no union branch"):
        A.write_container(u, [{"x": "a string"}])


def test_corruption_detected():
    buf = A.write_container(SCHEMA, _rows(5))
    with pytest.raises(ValueError, match="bad magic"):
        A.read_container(b"Obj\x02" + buf[4:])
    # flip a byte inside the trailing sync marker
    bad = bytearray(buf)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker mismatch"):
        A.read_container(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        A.read_container(buf[:-10])
    # snappy codec carries a per-block CRC-32 of the uncompressed
    # bytes: a payload flip just before the CRC trailer must be caught
    sbuf = bytearray(A.write_container(SCHEMA, _rows(5), codec="snappy"))
    sbuf[-21] ^= 0x55
    with pytest.raises(ValueError, match="CRC mismatch"):
        A.read_container(bytes(sbuf))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "a": st.integers(min_value=A.LONG_MIN, max_value=A.LONG_MAX),
                "b": st.booleans(),
                "c": st.one_of(st.none(), st.text(max_size=20)),
                "d": st.floats(allow_nan=False, width=64),
                "e": st.binary(max_size=16),
                "f": st.lists(
                    st.integers(min_value=A.INT_MIN, max_value=A.INT_MAX),
                    max_size=5,
                ),
            }
        ),
        max_size=40,
    ),
    st.sampled_from(["null", "deflate", "snappy"]),
)
def test_property_roundtrip(rows, codec):
    schema = json.dumps(
        {
            "type": "record",
            "name": "P",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "boolean"},
                {"name": "c", "type": ["null", "string"]},
                {"name": "d", "type": "double"},
                {"name": "e", "type": "bytes"},
                {"name": "f", "type": {"type": "array", "items": "int"}},
            ],
        }
    )
    buf = A.write_container(schema, rows, codec=codec, objects_per_block=7)
    assert A.read_container(buf)["values"] == rows


# ---------------------------------------------------------------------------
# Independent reference: the Apache Avro Java library on Spark's classpath
# ---------------------------------------------------------------------------

JSCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Order",
        "namespace": "engine.test",
        "fields": [
            {"name": "k", "type": "long"},
            {
                "name": "status",
                "type": {"type": "enum", "name": "St", "symbols": ["O", "F", "P"]},
            },
            {"name": "price", "type": "double"},
            {"name": "note", "type": ["null", "string"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
)


def _jrows(n):
    return [
        {
            "k": i,
            "status": ["O", "F", "P"][i % 3],
            "price": i * 1.5,
            "note": None if i % 2 else f"n{i}",
            "tags": [f"t{j}" for j in range(i % 4)],
        }
        for i in range(n)
    ]


def test_java_avro_reads_our_files(spark):
    jvm = spark._jvm
    rows = _jrows(50)
    for codec in ("null", "deflate", "snappy"):
        buf = A.write_container(JSCHEMA, rows, codec=codec, objects_per_block=17)
        fd, path = tempfile.mkstemp(suffix=".avro")
        os.write(fd, buf)
        os.close(fd)
        try:
            dr = jvm.org.apache.avro.generic.GenericDatumReader()
            fr = jvm.org.apache.avro.file.DataFileReader(
                jvm.java.io.File(path), dr
            )
            got = []
            while fr.hasNext():
                rec = fr.next()
                got.append(
                    {
                        "k": rec.get("k"),
                        "status": str(rec.get("status")),
                        "price": rec.get("price"),
                        "note": None
                        if rec.get("note") is None
                        else str(rec.get("note")),
                        "tags": [str(x) for x in rec.get("tags")],
                    }
                )
            fr.close()
        finally:
            os.unlink(path)
        assert got == rows, codec


def test_our_reader_decodes_java_written_real_deflate(spark):
    """Real org.apache.avro writer output under null, REAL zlib
    deflate, and REAL libzstd zstandard (zstd-jni ships in Spark's
    jars) — all decoded by the engine's own from-spec codecs."""
    jvm = spark._jvm
    rows = _jrows(50)
    sch = jvm.org.apache.avro.Schema.Parser().parse(JSCHEMA)
    for factory, codec in (
        (jvm.org.apache.avro.file.CodecFactory.nullCodec(), "null"),
        (jvm.org.apache.avro.file.CodecFactory.deflateCodec(6), "deflate"),
        (jvm.org.apache.avro.file.CodecFactory.zstandardCodec(9),
         "zstandard"),
    ):
        dw = jvm.org.apache.avro.generic.GenericDatumWriter(sch)
        fw = jvm.org.apache.avro.file.DataFileWriter(dw)
        fw.setCodec(factory)
        fd, path = tempfile.mkstemp(suffix=".avro")
        os.close(fd)
        try:
            fw.create(sch, jvm.java.io.File(path))
            for r in rows:
                rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
                rec.put("k", r["k"])
                rec.put("price", r["price"])
                rec.put("note", r["note"])
                rec.put(
                    "status",
                    jvm.org.apache.avro.generic.GenericData.EnumSymbol(
                        sch.getField("status").schema(), r["status"]
                    ),
                )
                arr = jvm.java.util.ArrayList()
                for tg in r["tags"]:
                    arr.add(tg)
                rec.put("tags", arr)
                fw.append(rec)
            fw.close()
            back = A.read_container(open(path, "rb").read())
        finally:
            os.unlink(path)
        assert back["codec"] == codec
        assert back["values"] == rows, codec


# ---------------------------------------------------------------------------
# Schema resolution (reader vs writer schema evolution)
# ---------------------------------------------------------------------------

V1 = json.dumps(
    {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "score", "type": "float"},
            {"name": "tag", "type": "string"},
            {"name": "legacy", "type": "long"},
        ],
    }
)
V2 = json.dumps(
    {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "tag", "type": "bytes"},
            {"name": "id", "type": "long"},
            {"name": "score", "type": "double"},
            {"name": "quality", "type": "double", "default": 0.5},
            {"name": "note", "type": ["null", "string"], "default": None},
        ],
    }
)


def test_schema_resolution_promotions_defaults_reorder():
    rows = [
        {"id": i, "score": float(i) * 0.5, "tag": f"t{i}", "legacy": 10**12 + i}
        for i in range(100)
    ]
    buf = A.write_container(V1, rows, codec="deflate")
    back = A.read_container(buf, reader_schema=V2)["values"]
    for i, v in enumerate(back):
        assert v["id"] == i
        assert abs(v["score"] - i * 0.5) < 1e-6
        assert v["tag"] == f"t{i}".encode()  # string -> bytes promotion
        assert v["quality"] == 0.5 and v["note"] is None
        assert "legacy" not in v  # removed field skipped
    # new field without default is a loud error
    v3 = json.dumps(
        {"type": "record", "name": "R",
         "fields": [{"name": "nope", "type": "int"}]}
    )
    with pytest.raises(ValueError, match="no default"):
        A.read_container(buf, reader_schema=v3)


def test_schema_resolution_unions():
    w = json.dumps(
        {"type": "record", "name": "R",
         "fields": [{"name": "x", "type": ["null", "int"]}]}
    )
    r = json.dumps(
        {"type": "record", "name": "R",
         "fields": [{"name": "x", "type": ["null", "long"]}]}
    )
    buf = A.write_container(w, [{"x": None}, {"x": 5}])
    assert [v["x"] for v in
            A.read_container(buf, reader_schema=r)["values"]] == [None, 5]


def test_schema_resolution_matches_java_resolver(spark):
    jvm = spark._jvm
    w = json.dumps(
        {"type": "record", "name": "R", "fields": [
            {"name": "id", "type": "int"},
            {"name": "tag", "type": "string"},
            {"name": "legacy", "type": "long"}]}
    )
    r = json.dumps(
        {"type": "record", "name": "R", "fields": [
            {"name": "id", "type": "long"},
            {"name": "tag", "type": "string"},
            {"name": "quality", "type": "double", "default": 0.5}]}
    )
    rows = [{"id": i, "tag": f"t{i}", "legacy": 7 * i} for i in range(30)]
    buf = A.write_container(w, rows, codec="deflate")
    fd, path = tempfile.mkstemp(suffix=".avro")
    os.write(fd, buf)
    os.close(fd)
    try:
        ws = jvm.org.apache.avro.Schema.Parser().parse(w)
        rs = jvm.org.apache.avro.Schema.Parser().parse(r)
        dr = jvm.org.apache.avro.generic.GenericDatumReader(ws, rs)
        fr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path), dr
        )
        jgot = []
        while fr.hasNext():
            rec = fr.next()
            jgot.append(
                {"id": rec.get("id"), "tag": str(rec.get("tag")),
                 "quality": rec.get("quality")}
            )
        fr.close()
    finally:
        os.unlink(path)
    assert jgot == A.read_container(buf, reader_schema=r)["values"]


def test_logical_types_materialize_known_vectors():
    """Closed-form spec mappings: decimal two's-complement unscaled
    bytes, date days, time millis/micros, timestamp instants, uuid."""
    import datetime as dt
    import decimal
    import uuid as _uuid

    schema = json.dumps(
        {
            "type": "record",
            "name": "L",
            "fields": [
                {"name": "dec", "type": {
                    "type": "bytes", "logicalType": "decimal",
                    "precision": 10, "scale": 2}},
                {"name": "decf", "type": {
                    "type": "fixed", "name": "D8", "size": 8,
                    "logicalType": "decimal", "precision": 16,
                    "scale": 3}},
                {"name": "d", "type": {
                    "type": "int", "logicalType": "date"}},
                {"name": "tm", "type": {
                    "type": "int", "logicalType": "time-millis"}},
                {"name": "tu", "type": {
                    "type": "long", "logicalType": "time-micros"}},
                {"name": "ts", "type": {
                    "type": "long", "logicalType": "timestamp-micros"}},
                {"name": "tsm", "type": {
                    "type": "long", "logicalType": "timestamp-millis"}},
                {"name": "lts", "type": {
                    "type": "long",
                    "logicalType": "local-timestamp-micros"}},
                {"name": "u", "type": {
                    "type": "string", "logicalType": "uuid"}},
                {"name": "opt", "type": ["null", {
                    "type": "int", "logicalType": "date"}]},
            ],
        }
    )
    utc = dt.timezone.utc
    rows = [
        {
            "dec": decimal.Decimal("123.45"),
            "decf": decimal.Decimal("-1.002"),
            "d": dt.date(2020, 1, 1),
            "tm": dt.time(12, 34, 56, 789000),
            "tu": dt.time(23, 59, 59, 999999),
            "ts": dt.datetime(2021, 1, 1, 0, 0, 0, 1, tzinfo=utc),
            "tsm": dt.datetime(1969, 12, 31, 23, 59, 59, 999000,
                               tzinfo=utc),
            "lts": dt.datetime(2000, 2, 29, 6, 30, 0, 500),
            "u": _uuid.UUID("12345678-1234-5678-1234-567812345678"),
            "opt": dt.date(1969, 12, 31),
        }
    ]
    buf = A.write_container(schema, rows, logical=True)
    # underlying (non-logical) read shows the spec's raw forms
    raw = A.read_container(buf)["values"][0]
    assert raw["dec"] == (12345).to_bytes(2, "big")          # 0x3039
    assert raw["decf"] == (-1002).to_bytes(8, "big", signed=True)
    assert raw["d"] == 18262
    assert raw["tm"] == ((12 * 3600 + 34 * 60 + 56) * 1000 + 789)
    assert raw["ts"] == 1_609_459_200_000_001
    assert raw["tsm"] == -1
    assert raw["u"] == "12345678-1234-5678-1234-567812345678"
    assert raw["opt"] == -1
    # logical read round-trips exactly
    assert A.read_container(buf, logical=True)["values"] == rows


def test_logical_types_loud_boundaries():
    import datetime as dt
    import decimal

    dec_s = json.dumps(
        {"type": "record", "name": "R", "fields": [
            {"name": "x", "type": {"type": "bytes",
                                   "logicalType": "decimal",
                                   "precision": 4, "scale": 2}}]}
    )
    with pytest.raises(ValueError, match="fit scale"):
        A.write_container(
            dec_s, [{"x": decimal.Decimal("0.001")}], logical=True
        )
    with pytest.raises(ValueError, match="precision"):
        A.write_container(
            dec_s, [{"x": decimal.Decimal("123.45")}], logical=True
        )
    fixed_s = json.dumps(
        {"type": "record", "name": "R", "fields": [
            {"name": "x", "type": {"type": "fixed", "name": "F1",
                                   "size": 1,
                                   "logicalType": "decimal",
                                   "precision": 10, "scale": 0}}]}
    )
    with pytest.raises(ValueError, match="fit fixed"):
        A.write_container(
            fixed_s, [{"x": decimal.Decimal(1000)}], logical=True
        )
    ts_s = json.dumps(
        {"type": "record", "name": "R", "fields": [
            {"name": "x", "type": {"type": "long",
                                   "logicalType": "timestamp-micros"}}]}
    )
    with pytest.raises(ValueError, match="tz-aware"):
        A.write_container(
            ts_s, [{"x": dt.datetime(2020, 1, 1)}], logical=True
        )
    # unknown annotations pass through as underlying, per spec
    odd = json.dumps(
        {"type": "record", "name": "R", "fields": [
            {"name": "x", "type": {"type": "long",
                                   "logicalType": "duration-ish"}}]}
    )
    buf = A.write_container(odd, [{"x": 7}], logical=True)
    assert A.read_container(buf, logical=True)["values"] == [{"x": 7}]


def test_bzip2_and_xz_codecs(spark):
    """bzip2 / xz codecs (round 11, spec "Required Codecs" optional
    set): each block is one self-checksummed bzip2/xz stream —
    python's stdlib provides the REAL reference compressors. Engine
    roundtrip both directions, plus real org.apache.avro Java-writer
    output when its optional codec classes are on Spark's classpath."""
    rows = _jrows(80)
    for codec in ("bzip2", "xz"):
        buf = A.write_container(JSCHEMA, rows, codec=codec)
        back = A.read_container(buf)
        assert back["codec"] == codec
        assert back["values"] == rows, codec

    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(JSCHEMA)
    for fac_name, codec in (("bzip2Codec", "bzip2"),
                            ("xzCodec", "xz")):
        try:
            factory = getattr(
                jvm.org.apache.avro.file.CodecFactory, fac_name
            )() if fac_name == "bzip2Codec" else getattr(
                jvm.org.apache.avro.file.CodecFactory, fac_name
            )(6)
            dw = jvm.org.apache.avro.generic.GenericDatumWriter(sch)
            fw = jvm.org.apache.avro.file.DataFileWriter(dw)
            fw.setCodec(factory)
        except Exception:
            continue  # optional codec jars absent from Spark's cp
        fd, path = tempfile.mkstemp(suffix=".avro")
        os.close(fd)
        try:
            fw.create(sch, jvm.java.io.File(path))
            for r in rows:
                rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
                rec.put("k", r["k"])
                rec.put("price", r["price"])
                rec.put("note", r["note"])
                rec.put(
                    "status",
                    jvm.org.apache.avro.generic.GenericData.EnumSymbol(
                        sch.getField("status").schema(), r["status"]
                    ),
                )
                arr = jvm.java.util.ArrayList()
                for tg in r["tags"]:
                    arr.add(tg)
                rec.put("tags", arr)
                fw.append(rec)
            fw.close()
            back = A.read_container(open(path, "rb").read())
        finally:
            os.unlink(path)
        assert back["codec"] == codec
        assert back["values"] == rows, codec


def test_single_object_encoding_vs_java(spark):
    """Single-object encoding (round 12): the Parsing Canonical Form
    and CRC-64-AVRO fingerprint match the REAL Avro Java library
    (SchemaNormalization) for every structural shape — named types
    with namespaces, named references, enums/fixed, unions, nested
    arrays/maps — and the full message framing is BYTE-IDENTICAL to
    org.apache.avro.message.BinaryMessageEncoder."""
    from cam_etl_spark.sources import avro_io as A

    jvm = spark._jvm
    sn = jvm.org.apache.avro.SchemaNormalization
    parser = jvm.org.apache.avro.Schema.Parser

    schemas = [
        '{"type":"record","name":"R","fields":['
        '{"name":"a","type":"long"},{"name":"s","type":"string"}]}',
        '{"type":"record","name":"N","namespace":"com.ex","fields":['
        '{"name":"u","type":["null","string"],"default":null},'
        '{"name":"e","type":{"type":"enum","name":"E",'
        '"symbols":["A","B"]}},'
        '{"name":"f","type":{"type":"fixed","name":"Fx","size":4}},'
        '{"name":"again","type":"E"},'
        '{"name":"arr","type":{"type":"array","items":"int"}},'
        '{"name":"m","type":{"type":"map","values":"double"}}]}',
        '"long"',
        '{"type":"array","items":{"type":"record","name":"P",'
        '"namespace":"x.y","fields":[{"name":"q","type":"bytes"}]}}',
        '["null","boolean",{"type":"map","values":["int","string"]}]',
    ]
    for s in schemas:
        jschema = parser().parse(s)
        assert A.parsing_canonical_form(s) == sn.toParsingForm(jschema)
        assert A.schema_fingerprint(s) == (
            sn.parsingFingerprint64(jschema) & 0xFFFFFFFFFFFFFFFF)

    rschema = schemas[0]
    jschema = parser().parse(rschema)
    enc = jvm.org.apache.avro.message.BinaryMessageEncoder(
        jvm.org.apache.avro.generic.GenericData.get(), jschema)
    rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
    rec.put("a", 42)
    rec.put("s", "hi")
    bb = enc.encode(rec)
    jbytes = bytes(bb.array()[bb.position():bb.limit()])
    assert A.write_single_object({"a": 42, "s": "hi"},
                                 rschema) == jbytes

    # registry-based decode + loud boundaries
    msg = A.write_single_object({"a": 7, "s": "x"}, rschema)
    reg = {A.schema_fingerprint(rschema): rschema}
    val, fp = A.read_single_object(msg, reg)
    assert val == {"a": 7, "s": "x"} and fp in reg
    with pytest.raises(ValueError, match="marker"):
        A.read_single_object(b"\xc4\x01" + msg[2:], reg)
    with pytest.raises(ValueError, match="not in the schema registry"):
        A.read_single_object(msg, {})
    with pytest.raises(ValueError, match="trailing"):
        A.read_single_object(msg + b"\x00", reg)
    with pytest.raises(ValueError, match="truncated"):
        A.read_single_object(msg[:-1], reg)
