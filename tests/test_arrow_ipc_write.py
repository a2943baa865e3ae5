"""Arrow IPC stream WRITER (sources/arrow_ipc_write.py) — the
referee direction flips: pyarrow (the real Arrow, including its
flatbuffers verifier) reads the engine's hand-built bytes and must
see exactly the rows the engine wrote; the engine's own reader
round-trips them too."""

import pyarrow as pa
import pytest

from cam_etl_spark.sources.arrow_ipc import read_stream
from cam_etl_spark.sources.arrow_ipc_write import write_stream

FIELDS = [("doc_id", "int64"), ("score", "float64"),
          ("text", "utf8")]
B1 = [[1, 2, None], [0.5, None, 2.25], ["héllo", "", None]]
B2 = [[4, 5], [1.0, -2.5], ["日本語 🎉", "x" * 100]]
WANT = [(1, 0.5, "héllo"), (2, None, ""), (None, 2.25, None),
        (4, 1.0, "日本語 🎉"), (5, -2.5, "x" * 100)]


def test_pyarrow_reads_engine_bytes():
    buf = write_stream(FIELDS, [B1, B2])
    t = pa.ipc.open_stream(buf).read_all()
    assert [str(f.type) for f in t.schema] == ["int64", "double",
                                               "string"]
    assert t.schema.names == ["doc_id", "score", "text"]
    got = [tuple(t.column(n)[i].as_py() for n, _ in FIELDS)
           for i in range(t.num_rows)]
    assert got == WANT


def test_engine_reader_roundtrip():
    buf = write_stream(FIELDS, [B1, B2])
    fields, rows = read_stream(buf)
    assert fields == FIELDS
    assert [tuple(r) for r in rows] == WANT


def test_null_free_and_empty_batches():
    buf = write_stream([("k", "int64")], [[[1, 2, 3]], [[]]])
    t = pa.ipc.open_stream(buf).read_all()
    assert t.column("k").to_pylist() == [1, 2, 3]
    fields, rows = read_stream(buf)
    assert [r[0] for r in rows] == [1, 2, 3]


def test_writer_boundaries():
    with pytest.raises(NotImplementedError, match="column type"):
        write_stream([("b", "bool")], [[[True]]])
    with pytest.raises(ValueError, match="ragged"):
        write_stream([("a", "int64"), ("b", "int64")],
                     [[[1, 2], [1]]])
