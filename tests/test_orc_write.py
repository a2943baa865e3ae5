"""From-spec ORC writer (sources/orc_write.py) — files accepted
row-exact by THREE readers: pyarrow's ORC C++ reader, Spark's native
ORC Java reader, and the engine's own from-spec decoder."""

import os
import random
import tempfile

import pyarrow.orc as orc
import pytest

from cam_etl_spark.sources.orc_read import read_orc
from cam_etl_spark.sources.orc_write import rle_v2_direct, write_orc


def _cols(n=3000, seed=1):
    rng = random.Random(seed)
    return (
        [rng.randrange(-(10**15), 10**15) for _ in range(n)],
        [rng.random() * 1e6 - 5e5 for _ in range(n)],
        [f"val_{i}_{'x' * (i % 7)}" for i in range(n)],
    )


def test_own_reader_roundtrip():
    keys, ds, ss = _cols()
    buf = write_orc([("k", "long", keys), ("d", "double", ds),
                     ("s", "string", ss)])
    got = read_orc(buf)
    assert got["columns"]["k"] == keys
    assert got["columns"]["d"] == ds
    assert got["columns"]["s"] == ss
    assert got["n_rows"] == len(keys)


def test_pyarrow_reads_our_files():
    keys, ds, ss = _cols(seed=2)
    buf = write_orc([("k", "long", keys), ("d", "double", ds),
                     ("s", "string", ss)])
    fd, path = tempfile.mkstemp(suffix=".orc")
    os.write(fd, buf)
    os.close(fd)
    try:
        p = orc.read_table(path).to_pydict()
    finally:
        os.unlink(path)
    assert p["k"] == keys and p["d"] == ds and p["s"] == ss


def test_spark_reads_our_files(spark, tmp_path):
    keys, ds, ss = _cols(seed=3, n=5000)
    buf = write_orc([("k", "long", keys), ("d", "double", ds),
                     ("s", "string", ss)])
    (tmp_path / "part-000.orc").write_bytes(buf)
    df = spark.read.orc(str(tmp_path))
    got = [(r.k, r.d, r.s) for r in df.orderBy("k").collect()]
    assert got == sorted(zip(keys, ds, ss))


def test_rle_v2_direct_self_consistent():
    from cam_etl_spark.sources.orc_read import rle_v2

    rng = random.Random(7)
    for signed in (True, False):
        for scale in (1, 7, 63, 10**12):
            vals = [rng.randrange(0, scale + 1) for _ in range(1500)]
            if signed:
                vals = [v if i % 2 else -v for i, v in enumerate(vals)]
            enc = rle_v2_direct(vals, signed)
            assert rle_v2(enc, len(vals), signed) == vals, (signed, scale)


def _null_cols(n=2500, seed=11):
    rng = random.Random(seed)
    keys = [
        None if i % 9 == 0 else rng.randrange(-(10**15), 10**15)
        for i in range(n)
    ]
    ds = [None if i % 7 == 3 else rng.random() * 1e6 for i in range(n)]
    ss = [None if i % 5 == 1 else f"s{i}_{'y' * (i % 4)}" for i in range(n)]
    allnull = [None] * n
    return keys, ds, ss, allnull


def test_nullable_columns_three_readers(spark, tmp_path):
    """PRESENT-stream encoding accepted by pyarrow, Spark's Java
    reader, and the engine's own decoder — incl. an all-null column
    and >1024 rows so byte-RLE literal groups split."""
    keys, ds, ss, allnull = _null_cols()
    buf = write_orc(
        [("k", "long", keys), ("d", "double", ds),
         ("s", "string", ss), ("z", "string", allnull)]
    )
    got = read_orc(buf)
    assert got["columns"]["k"] == keys
    assert got["columns"]["d"] == ds
    assert got["columns"]["s"] == ss
    assert got["columns"]["z"] == allnull
    fd, path = tempfile.mkstemp(suffix=".orc")
    os.write(fd, buf)
    os.close(fd)
    try:
        p = orc.read_table(path).to_pydict()
    finally:
        os.unlink(path)
    assert p["k"] == keys and p["d"] == ds and p["s"] == ss
    assert p["z"] == allnull
    (tmp_path / "part-000.orc").write_bytes(buf)
    df = spark.read.orc(str(tmp_path))
    rows = df.collect()
    # multiset equality (row order is not part of the contract)
    assert sorted(repr((r.k, r.d, r.s, r.z)) for r in rows) == sorted(
        repr(t) for t in zip(keys, ds, ss, allnull)
    )


def test_boundaries_loud():
    with pytest.raises(NotImplementedError, match="type 'date'"):
        write_orc([("k", "date", [1])])
    with pytest.raises(ValueError, match="ragged"):
        write_orc([("a", "long", [1]), ("b", "long", [1, 2])])
    with pytest.raises(ValueError, match="negative unsigned"):
        rle_v2_direct([-1], signed=False)
