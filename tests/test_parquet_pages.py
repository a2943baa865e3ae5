"""Parquet data-page decode cross-checked against pyarrow/DuckDB —
independent reference readers/writers exercise our from-spec Snappy,
gzip-page, RLE-hybrid, PLAIN and dictionary paths."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cam_etl_spark.sources.parquet_meta import parse_footer
from cam_etl_spark.sources.parquet_pages import (
    decode_column_chunk,
    snappy_decompress,
)


def _decode_all(path):
    data = open(path, "rb").read()
    m = parse_footer(data)
    rep = {s["name"]: s["repetition"] for s in m["schema"]}
    out = {}
    for rg in m["row_groups"]:
        for c in rg["columns"]:
            out.setdefault(c["path"], []).extend(
                decode_column_chunk(
                    data, c, rg["num_rows"], optional=rep[c["path"]] == 1
                )
            )
    return out


def _table(n=3000):
    return pa.table(
        {
            "i64": pa.array(
                [None if i % 17 == 0 else i * 31 for i in range(n)],
                pa.int64(),
            ),
            "i32": pa.array(
                [None if i % 23 == 0 else i % 999 for i in range(n)],
                pa.int32(),
            ),
            "f64": pa.array([i / 7 for i in range(n)], pa.float64()),
            "s": pa.array(
                [None if i % 11 == 0 else f"str-{i % 301}" for i in range(n)]
            ),
            "b": pa.array([i % 3 == 0 for i in range(n)], pa.bool_()),
        }
    )


@pytest.mark.parametrize("codec", ["snappy", "gzip", "lz4", "none",
                                   "zstd"])
def test_all_types_nulls_multigroup(tmp_path, codec):
    t = _table()
    p = tmp_path / f"t_{codec}.parquet"
    pq.write_table(t, p, row_group_size=512, compression=codec)
    got = _decode_all(p)
    for col in t.column_names:
        ref = t.column(col).to_pylist()
        ours = [
            v.decode("utf-8") if isinstance(v, bytes) else v
            for v in got[col]
        ]
        assert ours == ref, col


def test_plain_fallback_when_dictionary_disabled(tmp_path):
    t = _table(500)
    p = tmp_path / "plain.parquet"
    pq.write_table(t, p, use_dictionary=False, compression="snappy")
    got = _decode_all(p)
    assert [
        v.decode() if isinstance(v, bytes) else v for v in got["s"]
    ] == t.column("s").to_pylist()


def test_engine_testdata_columns(sf_dir):
    path = f"{sf_dir}/documents.parquet"
    got = _decode_all(path)
    con = duckdb.connect()
    ref = con.execute(
        "SELECT doc_id, text FROM read_parquet(?) ", [path]
    ).fetchall()
    assert got["doc_id"] == [r[0] for r in ref]
    assert [v.decode("utf-8") for v in got["text"]] == [r[1] for r in ref]


@pytest.mark.parametrize("codec", ["snappy", "none", "zstd"])
def test_data_page_v2(tmp_path, codec):
    t = _table(2000)
    p = tmp_path / f"v2_{codec}.parquet"
    pq.write_table(
        t, p, data_page_version="2.0", compression=codec,
        row_group_size=700,
    )
    got = _decode_all(p)
    for col in t.column_names:
        ours = [
            v.decode("utf-8") if isinstance(v, bytes) else v
            for v in got[col]
        ]
        assert ours == t.column(col).to_pylist(), col


def test_boundaries(tmp_path):
    t = _table(200)
    # BROTLI stopped being a boundary in round 12 (the engine's own
    # RFC-7932 decoder, multimodal/brotli.py) — pin the decode instead
    brotli = tmp_path / "b.parquet"
    pq.write_table(t, brotli, compression="brotli")
    db = open(brotli, "rb").read()
    mb = parse_footer(db)
    col0 = mb["row_groups"][0]["columns"][0]
    assert col0["codec"] == "BROTLI"
    got = decode_column_chunk(db, col0, mb["row_groups"][0]["num_rows"])
    assert got == t.column(col0["path"]).to_pylist()
    # snappy integrity: bad copy offset and length mismatch
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(b"\x05\x01\x00\x00")  # copy before start
    with pytest.raises(ValueError, match="header says"):
        snappy_decompress(b"\x09" + b"\x10abcde")  # 5 literals, claims 9


def test_list_column_embeddings(sf_dir):
    """Single-level LIST reassembly (rep/def Dremel levels) against
    DuckDB on the engine's embeddings table."""
    from cam_etl_spark.sources.parquet_meta import leaf_levels

    path = f"{sf_dir}/embeddings.parquet"
    data = open(path, "rb").read()
    m = parse_footer(data)
    md, mr = leaf_levels(m["schema"])["embedding.list.element"]
    assert (md, mr) == (3, 1)
    lists = []
    for rg in m["row_groups"]:
        chunk = next(
            c for c in rg["columns"] if c["path"] == "embedding.list.element"
        )
        lists += decode_column_chunk(
            data, chunk, rg["num_rows"], max_def=md, max_rep=mr
        )
    con = duckdb.connect()
    ref = [
        r[0]
        for r in con.execute(
            "SELECT embedding FROM read_parquet(?)", [path]
        ).fetchall()
    ]
    assert len(lists) == len(ref)
    for a, b in zip(lists, ref):
        assert a == b


def test_list_with_nulls_and_empties(tmp_path):
    """Null lists, empty lists and null elements through the v1 and v2
    writers — every def-level case of the assembly."""
    from cam_etl_spark.sources.parquet_meta import leaf_levels

    data = [
        None, [], [1.5, None, 2.5], [None], [3.25], [], None,
        [0.0, -1.0, None, 4.5, 5.5],
    ] * 40
    t = pa.table({"v": pa.array(data, pa.list_(pa.float64()))})
    for version, codec in (("1.0", "snappy"), ("2.0", "none")):
        p = tmp_path / f"lists_{version}_{codec}.parquet"
        pq.write_table(
            t, p, data_page_version=version, compression=codec,
            row_group_size=64,
        )
        raw = open(p, "rb").read()
        m = parse_footer(raw)
        md, mr = leaf_levels(m["schema"])["v.list.element"]
        got = []
        for rg in m["row_groups"]:
            chunk = rg["columns"][0]
            got += decode_column_chunk(
                raw, chunk, rg["num_rows"], max_def=md, max_rep=mr
            )
        assert got == data, (version, codec)


def test_deep_nesting_rejected(tmp_path):
    from cam_etl_spark.sources.parquet_meta import leaf_levels

    t = pa.table(
        {"v": pa.array([[[1.0]]], pa.list_(pa.list_(pa.float64())))}
    )
    p = tmp_path / "deep.parquet"
    pq.write_table(t, p)
    raw = open(p, "rb").read()
    m = parse_footer(raw)
    (leaf,) = [c["path"] for c in m["row_groups"][0]["columns"]]
    md, mr = leaf_levels(m["schema"])[leaf]
    assert mr == 2
    with pytest.raises(NotImplementedError, match="nesting"):
        decode_column_chunk(raw, m["row_groups"][0]["columns"][0], 1,
                            max_def=md, max_rep=mr)


@pytest.mark.parametrize(
    "s_enc", ["DELTA_LENGTH_BYTE_ARRAY", "DELTA_BYTE_ARRAY"]
)
def test_delta_encodings(tmp_path, s_enc):
    """DELTA_BINARY_PACKED ints (negative values, nulls, multi-block)
    and both delta string encodings against the pyarrow writer."""
    from cam_etl_spark.sources.parquet_meta import leaf_levels

    n = 5000
    t = pa.table(
        {
            "i64": pa.array(
                [None if i % 13 == 0 else i * 977 - 999999 for i in range(n)],
                pa.int64(),
            ),
            "i32": pa.array(
                [None if i % 7 == 0 else (i % 4001) - 2000 for i in range(n)],
                pa.int32(),
            ),
            "s": pa.array(
                [
                    None if i % 11 == 0 else f"prefix-{i % 61:04d}-sfx-{i}"
                    for i in range(n)
                ]
            ),
        }
    )
    p = tmp_path / f"delta_{s_enc}.parquet"
    pq.write_table(
        t, p, use_dictionary=False,
        column_encoding={
            "i64": "DELTA_BINARY_PACKED",
            "i32": "DELTA_BINARY_PACKED",
            "s": s_enc,
        },
        compression="snappy", row_group_size=900,
    )
    raw = open(p, "rb").read()
    m = parse_footer(raw)
    lv = leaf_levels(m["schema"])
    for col in t.column_names:
        got = []
        for rg in m["row_groups"]:
            chunk = next(c for c in rg["columns"] if c["path"] == col)
            md, mr = lv[col]
            got += decode_column_chunk(
                raw, chunk, rg["num_rows"], max_def=md, max_rep=mr
            )
        got = [v.decode() if isinstance(v, bytes) else v for v in got]
        assert got == t.column(col).to_pylist(), col


def test_byte_stream_split(tmp_path):
    from cam_etl_spark.sources.parquet_meta import leaf_levels

    n = 3000
    t = pa.table(
        {
            "f": pa.array(
                [None if i % 9 == 0 else i / 13 for i in range(n)],
                pa.float32(),
            ),
            "d": pa.array([i * -1.5 for i in range(n)], pa.float64()),
        }
    )
    p = tmp_path / "bss.parquet"
    pq.write_table(
        t, p, use_dictionary=False,
        column_encoding={"f": "BYTE_STREAM_SPLIT",
                         "d": "BYTE_STREAM_SPLIT"},
        compression="snappy", row_group_size=700,
    )
    raw = open(p, "rb").read()
    m = parse_footer(raw)
    lv = leaf_levels(m["schema"])
    for col in t.column_names:
        got = []
        for rg in m["row_groups"]:
            chunk = next(c for c in rg["columns"] if c["path"] == col)
            md, mr = lv[col]
            got += decode_column_chunk(
                raw, chunk, rg["num_rows"], max_def=md, max_rep=mr
            )
        ref = t.column(col).to_pylist()
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            if b is None:
                assert a is None
            else:
                assert abs(a - b) < 1e-6 or a == b, col


def test_from_spec_writer_three_readers(tmp_path):
    """Files written by the from-spec writer read back byte-exact in
    DuckDB, pyarrow, AND the engine's own page decoder."""
    from cam_etl_spark.sources.parquet_meta import leaf_levels
    from cam_etl_spark.sources.parquet_write import write_parquet

    n = 2500
    cols = [
        ("k", "INT64", [i * 37 - 50000 for i in range(n)]),
        ("price", "DOUBLE", [i / 7 for i in range(n)]),
        ("name", "BYTE_ARRAY", [f"row-{i % 97}-{'x' * (i % 23)}" for i in range(n)]),
    ]
    for codec in ("SNAPPY", "UNCOMPRESSED"):
        data = write_parquet(cols, codec=codec)
        p = tmp_path / f"ours_{codec}.parquet"
        p.write_bytes(data)
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT k, price, name FROM read_parquet('{p}')"
        ).fetchall()
        assert [r[0] for r in rows] == cols[0][2]
        assert [r[1] for r in rows] == cols[1][2]
        assert [r[2] for r in rows] == cols[2][2]
        t = pq.read_table(p)
        assert t.column("k").to_pylist() == cols[0][2]
        assert t.column("name").to_pylist() == cols[2][2]
        m = parse_footer(data)
        lv = leaf_levels(m["schema"])
        paths = [c["path"] for c in m["row_groups"][0]["columns"]]
        for name, ptype, vals in cols:
            md, mr = lv[name]
            got = decode_column_chunk(
                data, m["row_groups"][0]["columns"][paths.index(name)],
                n, max_def=md, max_rep=mr,
            )
            got = [v.decode() if isinstance(v, bytes) else v for v in got]
            assert got == vals, (codec, name)


def test_writer_boundaries():
    from cam_etl_spark.sources.parquet_write import write_parquet

    with pytest.raises(NotImplementedError, match="codec"):
        write_parquet([("k", "INT64", [1])], codec="ZSTD")
    with pytest.raises(ValueError, match="ragged"):
        write_parquet([("a", "INT64", [1, 2]), ("b", "INT64", [1])])


def test_fuzz_random_tables_roundtrip():
    """Property fuzz: random schemas × codecs × page versions ×
    row-group sizes × null densities through the pyarrow writer must
    decode value-exact with the from-spec reader."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cam_etl_spark.sources.parquet_meta import leaf_levels

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def run(data):
        import tempfile

        rng = random.Random(data.draw(st.integers(0, 2**32)))
        n = data.draw(st.integers(1, 2000))
        null_every = data.draw(st.sampled_from([0, 2, 7, 31]))

        def maybe_null(i, v):
            return None if null_every and i % null_every == 0 else v

        table = pa.table(
            {
                "a": pa.array(
                    [maybe_null(i, rng.randint(-2**40, 2**40)) for i in range(n)],
                    pa.int64(),
                ),
                "b": pa.array(
                    [maybe_null(i, rng.random() * 1e6 - 5e5) for i in range(n)],
                    pa.float64(),
                ),
                "c": pa.array(
                    [
                        maybe_null(i, "s" * rng.randint(0, 40) + str(i % 13))
                        for i in range(n)
                    ]
                ),
                "l": pa.array(
                    [
                        maybe_null(
                            i,
                            [
                                maybe_null(j, rng.random())
                                for j in range(rng.randint(0, 6))
                            ],
                        )
                        for i in range(n)
                    ],
                    pa.list_(pa.float64()),
                ),
            }
        )
        codec = data.draw(st.sampled_from(["snappy", "gzip", "lz4", "none"]))
        version = data.draw(st.sampled_from(["1.0", "2.0"]))
        rgs = data.draw(st.sampled_from([256, 1024, 100000]))
        use_dict = data.draw(st.booleans())
        with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
            pq.write_table(
                table, f.name, compression=codec,
                data_page_version=version, row_group_size=rgs,
                use_dictionary=use_dict,
            )
            raw = open(f.name, "rb").read()
        m = parse_footer(raw)
        lv = leaf_levels(m["schema"])
        for col in ("a", "b", "c"):
            got = []
            for rg in m["row_groups"]:
                chunk = next(x for x in rg["columns"] if x["path"] == col)
                md, mr = lv[col]
                got += decode_column_chunk(
                    raw, chunk, rg["num_rows"], max_def=md, max_rep=mr
                )
            got = [v.decode() if isinstance(v, bytes) else v for v in got]
            assert got == table.column(col).to_pylist(), (
                col, codec, version, rgs, use_dict,
            )
        got = []
        for rg in m["row_groups"]:
            chunk = next(
                x for x in rg["columns"] if x["path"] == "l.list.element"
            )
            md, mr = lv["l.list.element"]
            got += decode_column_chunk(
                raw, chunk, rg["num_rows"], max_def=md, max_rep=mr
            )
        assert got == table.column("l").to_pylist(), (codec, version)

    run()


def test_writer_nullable_columns_three_readers():
    """Nullable writes: OPTIONAL schema nodes + v1 RLE definition
    levels, accepted with exact null positions by DuckDB, pyarrow,
    and the engine's own page decoder."""
    import os
    import tempfile

    import duckdb
    import pyarrow.parquet as papq

    from cam_etl_spark.sources.parquet_meta import leaf_levels, parse_footer
    from cam_etl_spark.sources.parquet_pages import decode_column_chunk
    from cam_etl_spark.sources.parquet_write import write_parquet

    keys = [i if i % 3 else None for i in range(100)]
    ds = [float(i) * 1.5 if i % 4 else None for i in range(100)]
    ss = [f"s{i}" if i % 5 else None for i in range(100)]
    req = [i * 7 for i in range(100)]
    for codec in ("UNCOMPRESSED", "SNAPPY"):
        data = write_parquet(
            [("k", "INT64", keys), ("d", "DOUBLE", ds),
             ("s", "BYTE_ARRAY", ss), ("r", "INT64", req)],
            codec=codec,
        )
        fd, path = tempfile.mkstemp(suffix=".parquet")
        os.write(fd, data)
        os.close(fd)
        try:
            con = duckdb.connect()
            rows = con.execute(
                "SELECT k, d, s, r FROM read_parquet(?)", [path]
            ).fetchall()
            assert [r[0] for r in rows] == keys, codec
            assert [r[1] for r in rows] == ds
            assert [r[2] for r in rows] == ss
            assert [r[3] for r in rows] == req
            p = papq.read_table(path).to_pydict()
            assert p["k"] == keys and p["s"] == ss
        finally:
            os.unlink(path)
        m = parse_footer(data)
        lv = leaf_levels(m["schema"])
        cm = {c["path"]: c for c in m["row_groups"][0]["columns"]}
        for col, want in (("k", keys), ("d", ds), ("r", req)):
            md, mr = lv[col]
            got = decode_column_chunk(
                data, cm[col], 100, max_def=md, max_rep=mr
            )
            assert got == want, (codec, col)
        md, mr = lv["s"]
        got = decode_column_chunk(data, cm["s"], 100, max_def=md, max_rep=mr)
        assert [
            g.decode() if g is not None else None for g in got
        ] == ss


def test_legacy_hadoop_lz4_spark_writer(spark, tmp_path):
    """The LEGACY parquet 'LZ4' codec (round 11): Hadoop
    BlockCompressorStream framing around raw LZ4 blocks — what
    parquet-mr, and therefore Spark's `compression=lz4`, writes.
    Real Spark-written file decoded value-exact against pyarrow."""
    import glob

    df = spark.range(20000).selectExpr(
        "id",
        "concat('s-', id % 211) s",
        "CAST(id * 1.5 AS DOUBLE) d",
        "CASE WHEN id % 41 = 0 THEN NULL ELSE id * 7 END n",
    )
    p = str(tmp_path / "lz4_legacy")
    df.coalesce(1).write.option("compression", "lz4").parquet(p)
    f = glob.glob(p + "/*.parquet")[0]
    data = open(f, "rb").read()
    m = parse_footer(data)
    assert all(
        c["codec"] == "LZ4"
        for rg in m["row_groups"] for c in rg["columns"]
    )
    ref = pq.read_table(f).to_pydict()
    rep = {s["name"]: s["repetition"] for s in m["schema"]}
    for name in ("id", "s", "d", "n"):
        vals = []
        for rg in m["row_groups"]:
            cc = next(c for c in rg["columns"] if c["path"] == name)
            vals.extend(decode_column_chunk(
                data, cc, rg["num_rows"], optional=rep[name] == 1
            ))
        vals = [v.decode("utf-8") if isinstance(v, bytes) else v
                for v in vals]
        assert vals == ref[name], name
    # framing integrity is loud
    from cam_etl_spark.sources.parquet_pages import (
        lz4_hadoop_decompress,
    )
    with pytest.raises(ValueError, match="truncated block header"):
        lz4_hadoop_decompress(b"\x00\x00\x00", 10)
    with pytest.raises(ValueError, match="header says"):
        good = lz4_hadoop_decompress(
            (5).to_bytes(4, "big") + (6).to_bytes(4, "big")
            + b"\x50hello", 5)
        assert good == b"hello"
        lz4_hadoop_decompress(
            (5).to_bytes(4, "big") + (6).to_bytes(4, "big")
            + b"\x50hello", 99)
