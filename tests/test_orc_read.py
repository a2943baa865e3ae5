"""From-spec ORC reader (sources/orc_read.py) — spec example vectors
for RLEv2, value-exact cross-checks against TWO independent
references (pyarrow's ORC C++ writer/reader and Spark's ORC Java
writer), encoding stress (SHORT_REPEAT / DIRECT / PATCHED_BASE /
DELTA, dictionary and direct strings, PRESENT nulls), and loud
boundaries."""

import datetime
import io
import random

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from cam_etl_spark.sources import orc_read as O


def test_rle_v2_spec_vectors():
    # the ORCv1 specification's own printed examples
    assert O.rle_v2(bytes([0x0A, 0x27, 0x10]), 5, signed=False) == [10000] * 5
    assert O.rle_v2(
        bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF]),
        4,
        signed=False,
    ) == [23713, 43806, 57005, 48879]
    assert O.rle_v2(
        bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46]),
        10,
        signed=False,
    ) == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]


def test_byte_and_boolean_rle():
    # run: control 0x61 = 100+3? no: 0x61=97 -> 100 copies of next byte
    assert O.byte_rle(bytes([0x61, 0x00])) == bytes(100)
    # literal: 0xfe -> 2 literal bytes
    assert O.byte_rle(bytes([0xFE, 0x44, 0x45])) == b"\x44\x45"
    bits = O.boolean_rle(bytes([0xFF, 0x80]), 8)  # literal 1 byte 0x80
    assert bits == [True] + [False] * 7
    with pytest.raises(ValueError, match="truncated byte-RLE"):
        O.byte_rle(bytes([0x61]))
    with pytest.raises(ValueError, match="boolean stream too short"):
        O.boolean_rle(bytes([0xFF, 0x80]), 9)


def _make_table(n=5000, seed=7):
    random.seed(seed)
    return pa.table(
        {
            "k": [random.randrange(-(10**12), 10**12) for _ in range(n)],
            "small": [random.randrange(0, 50) for _ in range(n)],
            "seq": list(range(n)),  # monotonic -> DELTA runs
            "d": [random.random() * 1e6 - 5e5 for _ in range(n)],
            "f": pa.array(
                [float(i) * 0.5 for i in range(n)], type=pa.float32()
            ),
            "s": [f"name_{i % 37}" if i % 7 else None for i in range(n)],
            "uniq": [f"u{i}x{random.randrange(999999)}" for i in range(n)],
            "b": [bool(i % 3) if i % 11 else None for i in range(n)],
            "bin": pa.array(
                [bytes([i % 256, (i * 7) % 256]) for i in range(n)],
                type=pa.binary(),
            ),
        }
    )


@pytest.mark.parametrize("comp", ["uncompressed", "zlib", "snappy",
                                  "lz4"])
def test_pyarrow_written_value_exact(comp):
    table = _make_table()
    buf = io.BytesIO()
    orc.write_table(table, buf, compression=comp, stripe_size=64 * 1024)
    got = O.read_orc(buf.getvalue())
    ref = table.to_pydict()
    assert got["n_rows"] == table.num_rows
    for col in table.column_names:
        if col == "f":  # float32 round-trips through python floats
            assert all(
                abs(a - b) < 1e-3 for a, b in zip(got["columns"][col], ref[col])
            )
        else:
            assert got["columns"][col] == ref[col], col
    if comp == "uncompressed":
        assert len(got["tail"]["stripes"]) > 1  # multi-stripe exercised


@pytest.mark.parametrize(
    "seed,stride,hi",
    [(3, 97, 10**14), (5, 13, 10**17), (9, 501, 2**62), (13, 7, 10**10)],
)
def test_patched_base_outlier_stress(seed, stride, hi):
    random.seed(seed)
    n = 10000
    vals = [random.randrange(0, 512) for _ in range(n)]
    for i in range(0, n, stride):
        vals[i] = random.randrange(hi // 10, hi)
    vals = [v if i % 2 else -v for i, v in enumerate(vals)]
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"x": pa.array(vals, type=pa.int64())}),
        buf,
        compression="uncompressed",
    )
    assert O.read_orc(buf.getvalue())["columns"]["x"] == vals


def test_short_repeat_and_dates():
    n = 2000
    vals = [1234567] * n  # constant -> SHORT_REPEAT
    dates = [
        datetime.date(2020, 1, 1) + datetime.timedelta(days=i % 1000)
        for i in range(n)
    ]
    buf = io.BytesIO()
    orc.write_table(
        pa.table(
            {"c": pa.array(vals, type=pa.int64()),
             "dt": pa.array(dates, type=pa.date32())}
        ),
        buf,
        compression="zlib",
    )
    got = O.read_orc(buf.getvalue())
    assert got["columns"]["c"] == vals
    assert got["columns"]["dt"] == dates


def test_boundaries_loud():
    with pytest.raises(ValueError, match="file too short"):
        O.read_orc(b"OR")
    with pytest.raises(ValueError, match="magic"):
        O.read_orc(b"\x00" * 64)
    # union columns decode since round 11 — sparse Arrow input
    # included (the ORC C++ writer densifies on write)
    buf = io.BytesIO()
    orc.write_table(
        pa.table(
            {"u": pa.UnionArray.from_sparse(
                pa.array([0, 1], type=pa.int8()),
                [pa.array([1, 2], type=pa.int64()),
                 pa.array(["a", "b"], type=pa.string())],
            )}
        ),
        buf,
    )
    assert O.read_orc(buf.getvalue())["columns"]["u"] == [
        (0, 1), (1, "b")
    ]


def test_nested_list_map_struct_value_exact(spark, tmp_path):
    """LIST/MAP/STRUCT decode (LENGTH-stream reassembly; child streams
    cover only parent-present rows), cross-checked against pyarrow on
    both pyarrow- and Spark-written files, nulls at every level."""
    import glob

    n = 500
    lists = [
        None if i % 17 == 0 else [
            None if j % 5 == 3 else i * 10 + j for j in range(i % 7)
        ]
        for i in range(n)
    ]
    maps = [
        None if i % 13 == 0 else [
            (f"k{j}", None if j % 4 == 2 else i + j)
            for j in range(i % 5)
        ]
        for i in range(n)
    ]
    structs = [
        None if i % 19 == 0 else {
            "a": None if i % 3 == 0 else i,
            "b": f"s{i}" if i % 4 else None,
        }
        for i in range(n)
    ]
    tbl = pa.table(
        {
            "l": pa.array(lists, type=pa.list_(pa.int64())),
            "m": pa.array(maps, type=pa.map_(pa.string(), pa.int64())),
            "st": pa.array(
                structs,
                type=pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
        }
    )
    buf = io.BytesIO()
    orc.write_table(tbl, buf, compression="zlib")
    got = O.read_orc(buf.getvalue())
    ref = orc.read_table(io.BytesIO(buf.getvalue())).to_pydict()
    for c in ("l", "m", "st"):
        assert got["columns"][c] == ref[c], c
    # Spark (Java writer): array + map + struct in one file
    df = spark.range(n).selectExpr(
        "CASE WHEN id % 17 = 0 THEN NULL "
        "  WHEN id % 7 = 0 THEN array() ELSE "
        "  transform(sequence(1, CAST(id % 7 AS INT)), "
        "    j -> IF((j - 1) % 5 = 3, NULL, id * 10 + j - 1)) END AS l",
        "CASE WHEN id % 13 = 0 THEN NULL "
        "  WHEN id % 5 = 0 THEN map() ELSE "
        "  map_from_arrays("
        "    transform(sequence(1, CAST(id % 5 AS INT)),"
        "      j -> concat('k', j - 1)),"
        "    transform(sequence(1, CAST(id % 5 AS INT)),"
        "      j -> IF((j - 1) % 4 = 2, NULL, id + j - 1))) END AS m",
        "CASE WHEN id % 19 = 0 THEN NULL ELSE named_struct("
        "  'a', IF(id % 3 = 0, NULL, id),"
        "  'b', IF(id % 4 = 0, NULL, concat('s', id))) END AS st",
    )
    p = str(tmp_path / "jnested")
    df.coalesce(1).write.option("compression", "zlib").orc(p)
    f = glob.glob(p + "/*.orc")[0]
    got = O.read_orc(open(f, "rb").read())
    ref = orc.read_table(f).to_pydict()
    for c in ("l", "m", "st"):
        assert got["columns"][c] == ref[c], c


def test_decimal_and_tinyint_value_exact(spark, tmp_path):
    """ORC decimal (unbounded zigzag varint DATA + signed RLEv2 scale
    SECONDARY) and tinyint (signed byte-RLE), cross-checked against
    pyarrow on both pyarrow- and Spark-written files."""
    import decimal as dec
    import glob

    dvals = [
        dec.Decimal("1.23"), dec.Decimal("-99999.99"), dec.Decimal("0.01"),
        None, dec.Decimal("12345678901234.56"), dec.Decimal("-0.07"),
    ] + [dec.Decimal(i).scaleb(-2) for i in range(-500, 500, 7)]
    bvals = [
        None if i % 11 == 0 else (i % 256) - 128
        for i in range(len(dvals))
    ]
    buf = io.BytesIO()
    orc.write_table(
        pa.table(
            {"d": pa.array(dvals, type=pa.decimal128(16, 2)),
             "b": pa.array(bvals, type=pa.int8())}
        ),
        buf,
        compression="zlib",
    )
    got = O.read_orc(buf.getvalue())
    ref = orc.read_table(io.BytesIO(buf.getvalue())).to_pydict()
    assert got["columns"]["d"] == ref["d"]
    assert got["columns"]["b"] == ref["b"]
    # Spark (Java writer)
    df = spark.createDataFrame(
        [(str(v) if v is not None else None,) for v in dvals],
        "d string",
    ).selectExpr("CAST(d AS DECIMAL(16,2)) AS d")
    p = str(tmp_path / "jdec")
    df.coalesce(1).write.option("compression", "snappy").orc(p)
    f = glob.glob(p + "/*.orc")[0]
    got = O.read_orc(open(f, "rb").read())
    ref = orc.read_table(f).to_pydict()
    assert got["columns"]["d"] == ref["d"]


def test_timestamps_both_writers_value_exact(spark, tmp_path):
    """Timestamp decode (DATA rel-2015 seconds + SECONDARY scaled
    nanos) against BOTH reference writers, including the hostile
    pre-1970 forms: the C++ writer's signed-nanos encoding and the
    Java writer's truncated-seconds-with-positive-nanos form (the
    millisecond-granularity correction)."""
    import glob

    random.seed(9)
    base = datetime.datetime(2020, 1, 1)
    vals = [
        base
        + datetime.timedelta(
            seconds=random.randrange(-2 * 10**9, 10**9),
            microseconds=random.choice([0, 1, 123, 100000, 999999]),
        )
        for _ in range(2000)
    ] + [
        datetime.datetime(1969, 7, 20, 20, 17, 40, 500000),
        datetime.datetime(1960, 1, 1, 0, 0, 0, 1),
        datetime.datetime(2014, 12, 31, 23, 59, 59, 999999),
        datetime.datetime(2015, 1, 1),
    ]
    # C++ writer (pyarrow), with nulls
    buf = io.BytesIO()
    orc.write_table(
        pa.table(
            {
                "ts": pa.array(vals, type=pa.timestamp("us")),
                "n": pa.array(
                    [None if i % 7 == 0 else v for i, v in enumerate(vals)],
                    type=pa.timestamp("us"),
                ),
            }
        ),
        buf,
        compression="zlib",
    )
    got = O.read_orc(buf.getvalue())
    ref = orc.read_table(io.BytesIO(buf.getvalue())).to_pydict()
    assert got["columns"]["ts"] == ref["ts"]
    assert got["columns"]["n"] == ref["n"]
    # Java writer (Spark), UTC session timezone
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, ts timestamp"
        )
        p = str(tmp_path / "jts")
        df.coalesce(1).write.option("compression", "zlib").orc(p)
        f = glob.glob(p + "/*.orc")[0]
        got = O.read_orc(open(f, "rb").read())
        ref = orc.read_table(f).to_pydict()
        assert got["columns"]["ts"] == ref["ts"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_spark_written_cross_checked_vs_pyarrow(spark, tmp_path):
    import glob

    random.seed(11)
    n = 20000
    rows = [
        (
            i,
            random.randrange(0, 100)
            if i % 500
            else random.randrange(10**14, 10**15),
            1234567,
            i * 3 + 1000,
            f"s{i % 13}",
            None if i % 97 == 0 else float(i) * 1.25,
            datetime.date(2020, 1, 1) + datetime.timedelta(days=i % 1000),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "k long, outlier long, const long, mono long, s string, "
        "d double, dt date",
    )
    for comp in ("none", "zlib", "snappy"):
        path = str(tmp_path / comp)
        df.coalesce(2).write.option("compression", comp).orc(path)
        total = 0
        for f in sorted(glob.glob(path + "/*.orc")):
            raw = open(f, "rb").read()
            got = O.read_orc(raw)
            ref = orc.read_table(f).to_pydict()  # independent reference
            for col in df.columns:
                assert got["columns"][col] == ref[col], (comp, col)
            total += got["n_rows"]
        assert total == n


def test_rle_v1_spec_vectors_and_roundtrip():
    """The spec's printed RLE v1 examples, plus encoder->decoder
    roundtrips over runs, literals, deltas and signed values."""
    # spec: 100 copies of 7 -> [0x61, 0x00, 0x07]
    assert O.rle_v1(bytes([0x61, 0x00, 0x07]), 100, False) == [7] * 100
    # spec: 7, 8, ..., 106 -> [0x61, 0x01, 0x07]
    assert O.rle_v1(bytes([0x61, 0x01, 0x07]), 100, False) == list(
        range(7, 107)
    )
    assert O.rle_v1_encode([7] * 100, False) == bytes([0x61, 0x00, 0x07])
    assert O.rle_v1_encode(list(range(7, 107)), False) == bytes(
        [0x61, 0x01, 0x07]
    )
    random.seed(7)
    for signed in (False, True):
        for _ in range(25):
            vals = []
            while len(vals) < 400:
                pick = random.randrange(3)
                if pick == 0:
                    v = random.randrange(-10**6 if signed else 0, 10**6)
                    vals += [v] * random.randrange(1, 140)
                elif pick == 1:
                    v = random.randrange(-10**6 if signed else 0, 10**6)
                    d = random.randrange(-100, 100)
                    if not signed:
                        v = abs(v)
                        d = abs(d)
                    vals += [v + i * d for i in range(random.randrange(3, 50))]
                else:
                    lo = -10**9 if signed else 0
                    vals += [random.randrange(lo, 10**9)
                             for _ in range(random.randrange(1, 20))]
            enc = O.rle_v1_encode(vals, signed)
            assert O.rle_v1(enc, len(vals), signed) == vals
    with pytest.raises(ValueError, match="truncated"):
        O.rle_v1(bytes([0x61, 0x00]), 100, False)  # missing base varint
    with pytest.raises(ValueError, match="truncated RLE v1"):
        O.rle_v1(b"", 5, False)


def test_rle_v1_java_writer_011_format_value_exact(spark, tmp_path):
    """REAL RLE v1 files: Spark's Java ORC writer in 0.11-format mode
    (orc.write.format=0.11) emits DIRECT/DICTIONARY v1 encodings —
    decode and assert value-exact against pyarrow's read-back,
    the same independent-reference discipline as the v2 tests."""
    import glob

    random.seed(13)
    n = 5000
    rows = [
        (
            i,
            random.randrange(-1000, 1000),
            7,
            i * 3 + 1000,
            f"s{i % 13}",
            None if i % 97 == 0 else float(i) * 1.25,
            datetime.date(2020, 1, 1) + datetime.timedelta(days=i % 900),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "k long, v long, const long, mono long, s string, "
        "d double, dt date",
    )
    for comp in ("zlib", "snappy"):
        path = str(tmp_path / ("v1_" + comp))
        (
            df.coalesce(1)
            .write.option("orc.write.format", "0.11")
            .option("compression", comp)
            .orc(path)
        )
        for f in sorted(glob.glob(path + "/*.orc")):
            raw = open(f, "rb").read()
            tail = O.parse_tail(raw)
            sf = O._stripe_footer(
                raw, tail["stripes"][0], tail["compression"]
            )
            kinds = {e["kind"] for e in sf["encodings"]}
            assert kinds <= {"DIRECT", "DICTIONARY"}, kinds  # really v1
            got = O.read_orc(raw)
            ref = orc.read_table(f).to_pydict()
            for col in df.columns:
                assert got["columns"][col] == ref[col], (comp, col)


def test_dictionary_encoded_numeric_columns_reject():
    """Hive 0.11 could dictionary-encode NUMERIC columns (DATA =
    dictionary indexes); decoding the index stream as values would be
    silently wrong, so every numeric kind rejects loudly."""
    for kind in ("long", "decimal", "timestamp", "date"):
        with pytest.raises(NotImplementedError, match="dictionary-enc"):
            O._reject_dictionary("DICTIONARY", kind)
    O._reject_dictionary("DIRECT", "long")  # fine
    O._reject_dictionary("DIRECT_V2", "long")  # fine


def test_lz4_java_writer_value_exact(spark, tmp_path):
    """LZ4 chunk decompression (round-11 boundary removal) against
    the OTHER real writer: Spark's Java ORC library with
    compression=lz4, asserted value-exact against pyarrow's
    read-back — the raw-block LZ4 decoder is shared with the parquet
    page reader (parquet_pages.lz4_block_decompress); ORC's framing
    carries no decompressed size, so the size check is the framing's
    chunk bound."""
    import glob

    random.seed(29)
    rows = [
        (i, f"val-{i % 211}-{'y' * (i % 17)}",
         None if i % 53 == 0 else float(i) * 0.75)
        for i in range(30000)
    ]
    df = spark.createDataFrame(rows, "k long, s string, d double")
    path = str(tmp_path / "lz4")
    df.coalesce(1).write.option("compression", "lz4").orc(path)
    f = glob.glob(path + "/*.orc")[0]
    buf = open(f, "rb").read()
    got = O.read_orc(buf)
    assert got["tail"]["compression"] == "LZ4"
    ref = orc.read_table(f).to_pydict()
    for col in ("k", "s", "d"):
        assert got["columns"][col] == ref[col], col


def test_non_utc_writer_timezone_value_exact(spark, tmp_path):
    """Non-UTC wall-clock timestamps (round-11 boundary removal):
    REAL Java-writer files produced under four non-UTC JVM default
    zones (negative / positive / half-hour offsets, DST and not),
    over instants spanning 1959-2021 including the hostile pre-1970
    truncated-seconds/positive-nanos sub-second forms — each decoded
    value asserted exactly equal to pyarrow's read-back. Unknown
    writer timezones stay a loud boundary."""
    import glob

    jvm = spark._jvm
    TZ = jvm.java.util.TimeZone
    orig = TZ.getDefault()
    vals = [
        "1959-02-03 04:05:06.125", "1969-06-30 11:22:33.25",
        "1969-12-31 23:59:59.5", "1969-12-31 20:00:00.75",
        "1970-01-01 00:00:00.5", "1970-07-15 12:00:00.333",
        "2014-12-31 23:59:59.999", "2015-01-01 00:00:00",
        "2021-01-15 03:00:00.000001", "2021-07-01 12:34:56.789",
        "1969-12-31 23:59:59", "1969-06-30 11:22:33",
    ]
    zones = ["America/New_York", "Australia/Adelaide",
             "Europe/Berlin", "Asia/Kolkata"]
    df = spark.createDataFrame(
        [(v,) for v in vals], "ts string"
    ).selectExpr("cast(ts as timestamp) ts")
    paths = {}
    try:
        for z in zones:
            TZ.setDefault(TZ.getTimeZone(z))
            p = str(tmp_path / z.replace("/", "_"))
            df.coalesce(1).write.option("compression", "snappy").orc(p)
            paths[z] = p
    finally:
        TZ.setDefault(orig)
    for z, p in paths.items():
        f = glob.glob(p + "/*.orc")[0]
        buf = open(f, "rb").read()
        got = O.read_orc(buf)["columns"]["ts"]
        ref = orc.read_table(f).column("ts").to_pylist()
        assert [x.isoformat() for x in got] == [
            r.isoformat() for r in ref
        ], z
    # unresolvable writer timezones stay loud: patch the stripe
    # footer's timezone string in a small uncompressed file
    table = pa.table({"t": pa.array(
        [datetime.datetime(2021, 1, 1, 12, 0, 0)],
        type=pa.timestamp("ns"))})
    buf = io.BytesIO()
    orc.write_table(table, buf, compression="uncompressed")
    raw = buf.getvalue()
    assert b"GMT" in raw
    patched = raw.replace(b"GMT", b"GM?", 1)
    with pytest.raises(NotImplementedError, match="not resolvable"):
        O.read_orc(patched)


def test_zstd_default_spark_writer_value_exact(spark, tmp_path):
    """ZSTD chunk decompression (round-11 boundary removal, the
    engine's own RFC-8878 decoder): Spark 4's DEFAULT ORC compression
    is ZSTD, so this is the file an unconfigured `df.write.orc(...)`
    produces — written with NO compression option and asserted
    value-exact against pyarrow's read-back. Also covers pyarrow's
    C++ ZSTD writer in the parametrized test above via the 'lz4'
    pattern's sibling (compression='zstd' in _make_table tests is
    exercised in tests/test_zstd.py's lake integration)."""
    import glob

    rows = [
        (i, f"doc-{i % 307}-{'z' * (i % 19)}",
         None if i % 41 == 0 else i * 1.5)
        for i in range(40000)
    ]
    df = spark.createDataFrame(rows, "k long, s string, d double")
    path = str(tmp_path / "zstd_default")
    df.coalesce(1).write.orc(path)  # NO compression option: default
    f = glob.glob(path + "/*.orc")[0]
    buf = open(f, "rb").read()
    got = O.read_orc(buf)
    assert got["tail"]["compression"] == "ZSTD"  # proves the default
    ref = orc.read_table(f).to_pydict()
    for col in ("k", "s", "d"):
        assert got["columns"][col] == ref[col], col


def test_zstd_pyarrow_orc_value_exact():
    table = _make_table()
    buf = io.BytesIO()
    orc.write_table(table, buf, compression="zstd",
                    stripe_size=64 * 1024)
    got = O.read_orc(buf.getvalue())
    ref = table.to_pydict()
    for col in table.column_names:
        if col == "f":
            assert all(
                abs(a - b) < 1e-3
                for a, b in zip(got["columns"][col], ref[col])
            )
        else:
            assert got["columns"][col] == ref[col], col


def test_lzo_java_writer_value_exact(spark, tmp_path):
    """LZO chunk decompression (round 11 — this closes the ORC codec
    matrix: NONE/ZLIB/SNAPPY/LZO/LZ4/ZSTD all decode): raw LZO1X per
    chunk, the instruction grammar from the public lzo1x format
    description, cross-checked against REAL Spark/aircompressor
    writer output over three data shapes (dictionary strings, runs,
    incompressible doubles) and pyarrow's read-back."""
    import glob

    random.seed(37)
    rows = [
        (i,
         f"v-{i % 307}-{'q' * (i % 17)}",
         float(i % 50),                      # long runs after RLE
         random.random() * 1e9,              # incompressible
         None if i % 43 == 0 else i * 13)
        for i in range(40000)
    ]
    df = spark.createDataFrame(rows,
                               "k long, s string, r double, x double,"
                               " n long")
    path = str(tmp_path / "lzo")
    df.coalesce(1).write.option("compression", "lzo").orc(path)
    f = glob.glob(path + "/*.orc")[0]
    buf = open(f, "rb").read()
    got = O.read_orc(buf)
    assert got["tail"]["compression"] == "LZO"
    ref = orc.read_table(f).to_pydict()
    for col in ("k", "s", "r", "x", "n"):
        assert got["columns"][col] == ref[col], col


def test_union_column_against_pyarrow():
    """UNION columns (round 11): the tag stream is Byte-RLE, children
    hold only their own values in row order. A real pyarrow-written
    (ORC C++ library) union file decodes value-exact against
    pyarrow's own read-back, with the branch identity preserved as
    (tag, value) pairs; child-level nulls survive."""
    import io
    import random

    import pyarrow as pa
    import pyarrow.orc as orc

    from cam_etl_spark.sources.orc_read import read_orc

    rng = random.Random(83)
    n = 500
    tags_py = [rng.choice([0, 1, 2]) for _ in range(n)]
    child_vals = {0: [], 1: [], 2: []}
    offs_py = []
    for t in tags_py:
        offs_py.append(len(child_vals[t]))
        if t == 0:
            child_vals[0].append(
                None if rng.random() < 0.1 else rng.randrange(-10**6, 10**6)
            )
        elif t == 1:
            child_vals[1].append("s" * rng.randrange(0, 5) + str(rng.random()))
        else:
            child_vals[2].append(rng.random())
    u = pa.UnionArray.from_dense(
        pa.array(tags_py, type=pa.int8()),
        pa.array(offs_py, type=pa.int32()),
        [pa.array(child_vals[0], type=pa.int64()),
         pa.array(child_vals[1], type=pa.string()),
         pa.array(child_vals[2], type=pa.float64())],
    )
    table = pa.table({"k": pa.array(range(n)), "u": u})
    buf = io.BytesIO()
    orc.write_table(table, buf)
    raw = buf.getvalue()

    out = read_orc(raw)
    got = out["columns"]["u"]
    assert [t for t, _ in got] == tags_py
    back = orc.read_table(io.BytesIO(raw))["u"].to_pylist()
    assert [v for _, v in got] == back
    # the None written into child 0 came through as a child-level null
    assert any(t == 0 and v is None for t, v in got)
    assert out["columns"]["k"] == list(range(n))
