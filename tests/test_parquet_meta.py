"""From-spec parquet footer / thrift-compact parser, cross-checked
against DuckDB's independent parquet reader."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cam_etl_spark.sources.parquet_meta import parse_footer


def _crosscheck(path):
    m = parse_footer(open(path, "rb").read())
    con = duckdb.connect()
    f = con.execute(
        "SELECT num_rows, num_row_groups, created_by "
        "FROM parquet_file_metadata(?)",
        [str(path)],
    ).fetchone()
    assert (m["num_rows"], len(m["row_groups"]), m["created_by"]) == f
    ref = con.execute(
        "SELECT row_group_id, column_id, path_in_schema, type, num_values, "
        "total_compressed_size, total_uncompressed_size, compression, "
        "encodings, data_page_offset, dictionary_page_offset, "
        "row_group_num_rows FROM parquet_metadata(?) "
        "ORDER BY row_group_id, column_id",
        [str(path)],
    ).fetchall()
    ours = [
        (gi, ci, c)
        for gi, rg in enumerate(m["row_groups"])
        for ci, c in enumerate(rg["columns"])
    ]
    assert len(ref) == len(ours)
    for (gi, ci, c), d in zip(ours, ref):
        assert (gi, ci) == (d[0], d[1])
        assert c["path"] == d[2].replace(", ", ".")
        assert c["type"] == d[3]
        assert c["num_values"] == d[4]
        assert c["total_compressed_size"] == d[5]
        assert c["total_uncompressed_size"] == d[6]
        assert c["codec"] == d[7]
        assert sorted(d[8].split(", ")) == c["encodings"]
        assert c["data_page_offset"] == d[9]
        assert c["dictionary_page_offset"] == d[10]
        assert m["row_groups"][gi]["num_rows"] == d[11]
    return m


def test_testdata_footers(sf_dir):
    for t in ("documents", "embeddings", "lineitem"):
        _crosscheck(f"{sf_dir}/{t}.parquet")


def test_multi_row_group_and_codecs(tmp_path):
    """The engine testdata is single-row-group; pin the multi-group walk
    (RowGroup list, per-group num_rows) and a second codec."""
    n = 10_000
    table = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "s": pa.array([f"row-{i % 97}" for i in range(n)]),
            "v": pa.array([i / 7 for i in range(n)], pa.float64()),
        }
    )
    for codec in ("snappy", "gzip", "zstd", "none"):
        p = tmp_path / f"t_{codec}.parquet"
        pq.write_table(table, p, row_group_size=1024, compression=codec)
        m = _crosscheck(p)
        assert len(m["row_groups"]) == 10  # ceil(10000/1024)
        assert sum(rg["num_rows"] for rg in m["row_groups"]) == n
        for rg in m["row_groups"]:
            for c in rg["columns"]:
                assert c["num_values"] == rg["num_rows"]


def test_boundaries(sf_dir):
    data = open(f"{sf_dir}/region.parquet", "rb").read()
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_footer(data[:-4] + b"PARE")
    with pytest.raises(ValueError, match="magic"):
        parse_footer(data[:-1])
    with pytest.raises(ValueError):
        parse_footer(b"PAR1" + b"\x00" * 4)
    with pytest.raises(ValueError, match="exceeds"):
        parse_footer(data[-12:])  # real flen but no footer bytes before it
    with pytest.raises(ValueError, match="shorter"):
        parse_footer(data[-10:])
