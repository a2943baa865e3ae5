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


def test_bloom_filter_against_real_spark_writer(tmp_path, spark):
    """Split-block bloom filters (round 11): REAL parquet-mr blooms
    written by Spark decode with ZERO false negatives over every
    present value (int64 AND byte_array hashing; any salt/hash/
    block-math error would produce one) and reject absent probes;
    header unions other than BLOCK/XXHASH/UNCOMPRESSED are loud."""
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from cam_etl_spark.sources import parquet_meta as P

    d = str(tmp_path / "bloom")
    (spark.range(0, 20000)
     .select((F.col("id") * 7919 % 1000003).alias("k"),
             F.concat(F.lit("u"), F.col("id")).alias("s"))
     .coalesce(1)
     .write.mode("overwrite")
     .option("parquet.bloom.filter.enabled#k", "true")
     .option("parquet.bloom.filter.enabled#s", "true")
     .parquet(d))
    path = glob.glob(d + "/*.parquet")[0]
    raw = open(path, "rb").read()
    foot = P.parse_footer(raw)
    cols = {c["path"]: c for c in foot["row_groups"][0]["columns"]}
    assert cols["k"]["bloom_filter_offset"] is not None
    assert cols["s"]["bloom_filter_offset"] is not None

    ks = pq.read_table(path, columns=["k"])["k"].to_pylist()
    verdict = P.bloom_prune(raw, "k", ks[:200] + [1000003, 1000004])
    assert all(verdict[v] for v in ks[:200])          # no false negs
    ss = pq.read_table(path, columns=["s"])["s"].to_pylist()
    vs = P.bloom_prune(raw, "s", ss[:200]
                       + ["absent_a", "absent_b"])
    assert all(vs[v] for v in ss[:200])
    # absent probes overwhelmingly reject (default sizing: measured
    # 0/400 fp on this writer; allow any True but require SOME skip
    # power over a 100-probe absent set)
    absent = P.bloom_prune(raw, "k",
                           [2000003 + i for i in range(100)])
    assert sum(1 for v in absent.values() if not v) >= 90

    # bitset structural checks are loud
    with pytest.raises(ValueError, match="bloom bitset truncated"):
        P.read_bloom_filter(raw[:cols["k"]["bloom_filter_offset"] + 40],
                            cols["k"]["bloom_filter_offset"])
    # a bloom-less file: the row group falls back to footer min/max
    # stats — out-of-range probes are PROVABLY absent (skip power in
    # mixed-writer files), in-range probes stay possibly-present
    d2 = str(tmp_path / "nobloom")
    spark.range(5).select(F.col("id").alias("k")).coalesce(1) \
        .write.mode("overwrite").parquet(d2)
    raw2 = open(glob.glob(d2 + "/*.parquet")[0], "rb").read()
    assert P.bloom_prune(raw2, "k", [999, 3, -1]) == \
        {999: False, 3: True, -1: False}


def test_page_index_prune_against_real_spark_writer(tmp_path, spark):
    """OffsetIndex/ColumnIndex page pruning (round 11): real
    parquet-mr page indexes (Spark writes them by default) parse and
    a range predicate keeps only the pages whose [min, max] overlap —
    every matching row is covered (no false skip) and the kept
    fraction is a small slice of the sorted file."""
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from cam_etl_spark.sources import parquet_meta as P

    d = str(tmp_path / "pidx")
    (spark.range(0, 30000)
     .select(F.col("id").alias("k"),
             F.concat(F.lit("u"), F.col("id")).alias("s"))
     .coalesce(1).sortWithinPartitions("k")
     .write.mode("overwrite")
     .option("parquet.page.size", "2048")
     .option("parquet.page.row.count.limit", "1000")
     .parquet(d))
    p = glob.glob(d + "/*.parquet")[0]
    raw = open(p, "rb").read()
    foot = P.parse_footer(raw)
    rg = foot["row_groups"][0]
    col = next(c for c in rg["columns"] if c["path"] == "k")
    idx = P.read_page_index(raw, col)
    assert len(idx["page_locations"]) > 20
    assert idx["boundary_order"] == 1  # ASCENDING on a sorted column
    # offsets ascend, first_row_index starts at 0 and ascends
    firsts = [fr for _, _, fr in idx["page_locations"]]
    assert firsts[0] == 0 and firsts == sorted(firsts)

    keep = P.prune_pages(idx, 7000, 7400, rg["num_rows"])
    ks = pq.read_table(p, columns=["k"])["k"].to_pylist()
    match = [i for i, v in enumerate(ks) if 7000 <= v <= 7400]
    assert match, "fixture lost its range"
    assert all(any(fr <= i < er for _, fr, er in keep)
               for i in match)                      # no false skip
    read_rows = sum(er - fr for _, fr, er in keep)
    assert read_rows < rg["num_rows"] * 0.1         # real pruning
    # every kept page really overlaps
    for pi, fr, er in keep:
        assert idx["maxs"][pi] >= 7000 and idx["mins"][pi] <= 7400

    # string bounds decode as raw bytes
    cs = next(c for c in rg["columns"] if c["path"] == "s")
    idxs = P.read_page_index(raw, cs)
    assert idxs["mins"][0].startswith(b"u")
    # unbounded range keeps every non-null page
    assert len(P.prune_pages(idx, None, None, rg["num_rows"])) == \
        len(idx["page_locations"])
    # a file without a page index is loud
    with pytest.raises(ValueError, match="no page index"):
        P.read_page_index(raw, dict(col, offset_index_offset=None))


def test_bloom_prune_float_stats_fallback(tmp_path, spark):
    """Round-12 review fix: a float64 probe of a FLOAT column's
    min/max stats must be narrowed to float32 first (the same lossy
    pack the bloom path applies) — float32(0.1) != 0.1 in float64,
    and without the narrowing a stored value was 'provably absent'
    (a false negative, the one thing pruning must never produce)."""
    import glob

    from pyspark.sql import functions as F

    from cam_etl_spark.sources import parquet_meta as P

    d = str(tmp_path / "fstats")
    spark.range(3).select(
        (F.lit(0.1) + F.col("id") * 0.2).cast("float").alias("x")
    ).coalesce(1).write.parquet(d)
    raw = open(glob.glob(d + "/*.parquet")[0], "rb").read()
    got = P.bloom_prune(raw, "x", [0.1, 0.5, 99.0])
    assert got[0.1] is True       # stored as float32(0.1)
    assert got[0.5] is True
    assert got[99.0] is False     # genuinely out of range
