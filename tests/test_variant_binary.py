"""Variant binary encoding (sources/variant_binary.py) vs Spark's
native VariantType — cross-checked in BOTH directions: our encodings
must read correctly through a real parquet variant column, and
Spark-written variant binaries (extracted by the engine's own
from-spec page reader, since the VARIANT logical annotation is too
new for even pyarrow 16's footer parser) must decode to the original
values."""
import json
import os

import pytest

from cam_etl_spark.sources.variant_binary import (
    decode_metadata,
    decode_value,
    encode_metadata,
    encode_variant,
)


def test_self_roundtrip():
    cases = [
        None, True, False, 0, -5, 127, 128, -70000, 2 ** 40, 1.5,
        "hi", "x" * 100, b"\x00\x01", [1, "a", None, [2.5]],
        {"a": 1, "b": {"c": [1, 2, 3], "d": "y"}, "z": None},
        {}, [], {"k": [{"n": -1}]},
    ]
    for c in cases:
        m, v = encode_variant(c)
        assert decode_value(m, v) == c, c


def test_metadata_roundtrip_and_sorted_flag():
    keys = ["zeta", "alpha", "alpha2"]
    assert decode_metadata(encode_metadata(keys)) == keys
    # sorted flag set only for sorted unique keys
    assert encode_metadata(["a", "b"])[0] & 0x10
    assert not encode_metadata(["b", "a"])[0] & 0x10


def test_loud_boundaries():
    m, v = encode_variant({"a": 1})
    with pytest.raises(ValueError, match="trailing"):
        decode_value(m, v + b"\x00")
    with pytest.raises(ValueError, match="version"):
        decode_value(b"\x02\x00\x00", b"\x00")
    # field id beyond dictionary
    bad = bytes([2 | 0 | 0]) + bytes([1, 5, 0, 1]) + b"\x00"
    with pytest.raises(ValueError, match="beyond dictionary"):
        decode_value(encode_metadata(["a"]), bad)
    with pytest.raises(NotImplementedError, match="primitive type"):
        decode_value(encode_metadata([]), bytes([20 << 2]))
    with pytest.raises(NotImplementedError, match="encode"):
        encode_variant({"a": object()})


def test_encoder_read_by_spark(tmp_path, spark):
    """Our (metadata, value) pairs written as a plain parquet group
    and read under a variant schema must to_json to the source."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    objs = [
        {"a": i, "s": f"v{i}", "nest": {"q": [i, i * 2.5], "f": None}}
        for i in range(6)
    ]
    pairs = [encode_variant(o) for o in objs]
    f = str(tmp_path / "enc.parquet")
    pq.write_table(pa.table({
        "k": pa.array(range(6), pa.int64()),
        "v": pa.array(
            [{"metadata": m, "value": v} for m, v in pairs],
            pa.struct([
                pa.field("metadata", pa.binary(), nullable=False),
                pa.field("value", pa.binary(), nullable=False),
            ])),
    }), f)
    rows = spark.read.schema("k long, v variant").parquet(f) \
        .selectExpr("k", "to_json(v) AS j").collect()
    assert len(rows) == 6
    for r in rows:
        assert json.loads(r.j) == objs[r.k]


def test_decode_spark_written_binaries(tmp_path, spark):
    """Spark-written variant binaries -> engine page reader -> our
    decoder == Spark's own to_json. Heterogeneous rows force Spark's
    writer to keep whole variants in the value column (no shredding
    schema fits), so real full-object/array encodings are decoded."""
    import glob

    from cam_etl_spark.sources.parquet_meta import (
        leaf_levels,
        parse_footer,
    )
    from cam_etl_spark.sources.parquet_pages import decode_column_chunk

    d = str(tmp_path / "sparkvar")
    spark.sql("""
        SELECT id AS k,
               CASE WHEN id % 3 = 0 THEN parse_json(
                        concat('{"a":', id, ',"extra', id, '":"e"}'))
                    WHEN id % 3 = 1 THEN parse_json(
                        concat('[', id, ',', id + 1, ']'))
                    ELSE parse_json(concat('{"a":', id, '}'))
               END AS v
        FROM range(9)""").coalesce(1).write.parquet(d)
    p = glob.glob(d + "/*.parquet")[0]
    raw = open(p, "rb").read()
    foot = parse_footer(raw)
    lv = leaf_levels(foot["schema"])
    rg = foot["row_groups"][0]
    cols = {c["path"]: c for c in rg["columns"]}
    n = rg["num_rows"]
    metas = decode_column_chunk(raw, cols["v.metadata"], n,
                                max_def=lv["v.metadata"][0])
    vals = decode_column_chunk(raw, cols["v.value"], n,
                               max_def=lv["v.value"][0])
    ks = decode_column_chunk(raw, cols["k"], n,
                             optional=bool(lv["k"][0]))
    ref = {r.k: json.loads(r.j) for r in
           spark.read.parquet(d).selectExpr(
               "k", "to_json(v) AS j").collect()}
    assert len(ks) == 9
    for k, m, v in zip(ks, metas, vals):
        assert decode_value(m, v) == ref[k], k


def test_bitpacked_msb_levels():
    """The deprecated standalone BIT_PACKED level encoding unpacks
    MSB-first (parquet-format Encodings.md) — distinct from the RLE
    hybrid's LSB-first runs."""
    from cam_etl_spark.sources.parquet_pages import bitpacked_msb_levels

    # width 1: 0b10110000 -> 1,0,1,1,0 (first five values)
    assert bitpacked_msb_levels(b"\xb0", 1, 5) == [1, 0, 1, 1, 0]
    # width 2: 0b01_10_11_00 -> 1,2,3,0
    assert bitpacked_msb_levels(b"\x6c", 2, 4) == [1, 2, 3, 0]
    # width 3 crossing a byte boundary: values 5,1,7
    # bits: 101 001 111 -> 10100111 1.......
    assert bitpacked_msb_levels(b"\xa7\x80", 3, 3) == [5, 1, 7]
