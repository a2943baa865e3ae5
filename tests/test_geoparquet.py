"""GeoParquet source (sources/geoparquet.py): the ``geo`` metadata
contract through the from-spec footer reader, and WKB point decoding
(both byte orders) via the scalar reference and the Arrow/numpy
kernel."""
import json
import struct

import pytest

from cam_etl_spark.sources.geoparquet import (
    geo_file_metadata_json,
    geo_metadata,
    points_xy,
    wkb_point_xy,
)
from cam_etl_spark.sources.parquet_meta import parse_footer


def _wkb(x, y, little=True):
    return (struct.pack("<BIdd", 1, 1, x, y) if little
            else struct.pack(">BIdd", 0, 1, x, y))


def test_wkb_point_scalar_both_orders():
    assert wkb_point_xy(_wkb(1.5, -2.25)) == (1.5, -2.25)
    assert wkb_point_xy(_wkb(1.5, -2.25, little=False)) == (1.5, -2.25)
    with pytest.raises(ValueError, match="21 bytes"):
        wkb_point_xy(b"\x01\x01")
    with pytest.raises(ValueError, match="byte order"):
        wkb_point_xy(b"\x02" + bytes(20))
    # linestring (type 2) rejects in the point kernel
    with pytest.raises(NotImplementedError, match="type 2"):
        wkb_point_xy(struct.pack("<BIdd", 1, 2, 0, 0))


def test_geo_metadata_roundtrip_and_loud(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tab = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "geometry": pa.array([_wkb(1, 2), _wkb(3, 4, False)],
                             pa.binary()),
    })
    f = str(tmp_path / "geo.parquet")
    pq.write_table(tab.replace_schema_metadata(
        {b"geo": geo_file_metadata_json("geometry")}), f)
    foot = parse_footer(open(f, "rb").read())
    meta = geo_metadata(foot)
    assert meta["version"] == "1.1.0"
    assert meta["primary_column"] == "geometry"
    assert meta["columns"]["geometry"]["encoding"] == "WKB"

    # loud: no geo key
    f2 = str(tmp_path / "plain.parquet")
    pq.write_table(tab, f2)
    with pytest.raises(ValueError, match="no 'geo' key"):
        geo_metadata(parse_footer(open(f2, "rb").read()))
    # loud: unsupported version / encoding / missing primary
    for bad, exc, pat in [
        ({"version": "2.0.0", "primary_column": "geometry",
          "columns": {"geometry": {"encoding": "WKB"}}},
         NotImplementedError, "version"),
        ({"version": "1.1.0", "primary_column": "geometry",
          "columns": {"geometry": {"encoding": "point"}}},
         NotImplementedError, "encoding"),
        ({"version": "1.1.0", "primary_column": "g",
          "columns": {}}, ValueError, "primary_column"),
    ]:
        f3 = str(tmp_path / "bad.parquet")
        pq.write_table(tab.replace_schema_metadata(
            {b"geo": json.dumps(bad).encode()}), f3)
        with pytest.raises(exc, match=pat):
            geo_metadata(parse_footer(open(f3, "rb").read()))


def test_points_xy_kernel_mixed_endian(tmp_path, spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pts = [(k, 100.0 + k * 0.5, -30.0 + k * 0.25) for k in range(50)]
    tab = pa.table({
        "k": pa.array([p[0] for p in pts], pa.int64()),
        "geometry": pa.array(
            [_wkb(x, y, little=(k % 2 == 0)) for k, x, y in pts],
            pa.binary()),
    })
    f = str(tmp_path / "pts.parquet")
    pq.write_table(tab.replace_schema_metadata(
        {b"geo": geo_file_metadata_json("geometry")}), f)
    out = points_xy(spark.read.parquet(f), "geometry") \
        .select("k", "x", "y").collect()
    got = {r.k: (r.x, r.y) for r in out}
    assert got == {k: (x, y) for k, x, y in pts}
    # loud inside the kernel: a truncated WKB fails the whole batch
    tab2 = pa.table({
        "k": pa.array([1], pa.int64()),
        "geometry": pa.array([b"\x01\x01"], pa.binary()),
    })
    f2 = str(tmp_path / "bad.parquet")
    pq.write_table(tab2, f2)
    with pytest.raises(Exception, match="21 bytes"):
        points_xy(spark.read.parquet(f2), "geometry").collect()


def test_points_xy_null_geometry_is_loud(tmp_path, spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tab = pa.table({
        "k": pa.array([0, 1], pa.int64()),
        "geometry": pa.array([_wkb(1.0, 2.0, little=True), None],
                             pa.binary()),
    })
    f = str(tmp_path / "nullgeom.parquet")
    pq.write_table(tab, f)
    with pytest.raises(Exception, match="null geometry"):
        points_xy(spark.read.parquet(f), "geometry").collect()
