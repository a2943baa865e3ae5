"""Shapefile source (SURVEY S4).

The reference ingests ESRI Shapefiles with ``shp2pgsql`` into Postgres before
the ETL ever sees them (/root/reference/etl-notes.md:50-57 loads the QRT road
centrelines, /root/reference/etl-notes.md:826-832 the postcode polygons), so
shapefile parsing sits outside its engine. Here it is a first-class Spark
source: the ESRI shapefile binary layout is a public spec ("ESRI Shapefile
Technical Description", 1998), simple enough to parse with ``struct`` — no
GIS libraries needed.

Two read paths, both fully distributed:

- ``read_shapefile``: many-file datasets. ``spark.read.format("binaryFile")``
  loads each ``.shp`` and its sibling ``.dbf`` (joined on path stem, both
  sides tiny metadata rows until the parse), and ``mapInPandas`` parses each
  pair into (record_number, shape_type, WKT geometry, attribute map) rows.
  Parallelism = number of files; Spark never sees the binary blobs twice.
- ``read_shapefile_split``: ONE huge ``.shp`` (the 100 TB case is a handful
  of multi-GB statewide files, not millions of small ones). The ``.shx``
  sidecar is a fixed 8-bytes-per-record offset index, so the driver reads
  only it (tiny), slices the record space into ``num_splits`` contiguous
  byte ranges, and each executor task seeks/reads ONLY its range of the
  ``.shp`` (+ the matching fixed-width ``.dbf`` range). Requires the path to
  be executor-visible (shared FS / mounted object store), which is the
  normal cluster layout.

Geometry output is WKT text — the engine's spatial interchange column
(functions/spatial.py, operators/knn.py consume it). All attributes are kept
stringly-typed, matching the reference's all-``text`` load model
(/root/reference/etl-notes.md:30).
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ESRI shape type ids → (base kind, has Z/M payload after XY block).
# Z/M variants append coordinate measures AFTER the XY data, so XY parsing
# reads identical prefixes and simply ignores the tail.
_SHAPE_KINDS = {
    0: "null",
    1: "point",
    11: "point",
    21: "point",
    3: "polyline",
    13: "polyline",
    23: "polyline",
    5: "polygon",
    15: "polygon",
    25: "polygon",
    8: "multipoint",
    18: "multipoint",
    28: "multipoint",
}

SHAPEFILE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_number", IntegerType()),
        StructField("shape_type", StringType()),
        StructField("geometry", StringType()),  # WKT; null for null shapes
        StructField("attributes", MapType(StringType(), StringType())),
    ]
)


def _fmt(v: float) -> str:
    # WKT coordinate formatting: shortest exact repr (matches str(float)).
    return repr(float(v))


def _ring_signed_area(points: list[tuple[float, float]]) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(points, points[1:]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _point_in_ring(pt: tuple[float, float], ring: list[tuple[float, float]]) -> bool:
    # Standard ray cast; ring is closed (first == last).
    x, y = pt
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        if (y1 > y) != (y2 > y):
            xi = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
            if x < xi:
                inside = not inside
    return inside


def _wkt_ring(points: list[tuple[float, float]]) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in points) + ")"


def _polygon_wkt(rings: list[list[tuple[float, float]]]) -> str:
    """Shapefile polygons are flat ring lists: outer rings wind clockwise
    (negative shoelace area), holes counter-clockwise. Regroup into
    POLYGON/MULTIPOLYGON by assigning each hole to the outer ring that
    contains its first vertex (spec: holes lie inside exactly one outer)."""
    outers: list[tuple[list, list]] = []  # (ring, holes)
    holes: list[list] = []
    for ring in rings:
        if _ring_signed_area(ring) <= 0:
            outers.append((ring, []))
        else:
            holes.append(ring)
    if not outers:  # degenerate: treat all as outers in given order
        outers = [(r, []) for r in holes]
        holes = []
    for hole in holes:
        for ring, ring_holes in outers:
            if _point_in_ring(hole[0], ring):
                ring_holes.append(hole)
                break
        else:
            outers[0][1].append(hole)
    if len(outers) == 1:
        ring, ring_holes = outers[0]
        return "POLYGON (" + ", ".join(_wkt_ring(r) for r in [ring, *ring_holes]) + ")"
    parts = [
        "(" + ", ".join(_wkt_ring(r) for r in [ring, *ring_holes]) + ")"
        for ring, ring_holes in outers
    ]
    return "MULTIPOLYGON (" + ", ".join(parts) + ")"


def _parse_shape(content: bytes) -> tuple[str, str | None]:
    """One record's content block → (kind, WKT | None)."""
    (stype,) = struct.unpack_from("<i", content, 0)
    kind = _SHAPE_KINDS.get(stype, "unknown")
    if kind in ("null", "unknown"):
        return kind, None
    if kind == "point":
        x, y = struct.unpack_from("<2d", content, 4)
        return kind, f"POINT ({_fmt(x)} {_fmt(y)})"
    if kind == "multipoint":
        (n,) = struct.unpack_from("<i", content, 36)
        pts = struct.unpack_from(f"<{2 * n}d", content, 40)
        body = ", ".join(f"{_fmt(pts[2 * i])} {_fmt(pts[2 * i + 1])}" for i in range(n))
        return kind, f"MULTIPOINT ({body})"
    # polyline / polygon: bbox(32) + numParts + numPoints + parts[] + points[]
    nparts, npoints = struct.unpack_from("<2i", content, 36)
    parts = struct.unpack_from(f"<{nparts}i", content, 44)
    pts_off = 44 + 4 * nparts
    flat = struct.unpack_from(f"<{2 * npoints}d", content, pts_off)
    pieces: list[list[tuple[float, float]]] = []
    bounds = list(parts) + [npoints]
    for i in range(nparts):
        seg = [(flat[2 * j], flat[2 * j + 1]) for j in range(bounds[i], bounds[i + 1])]
        pieces.append(seg)
    if kind == "polyline":
        if len(pieces) == 1:
            return kind, "LINESTRING " + _wkt_ring(pieces[0])
        return kind, "MULTILINESTRING (" + ", ".join(_wkt_ring(p) for p in pieces) + ")"
    return kind, _polygon_wkt(pieces)


def parse_shp(buf: bytes) -> Iterator[tuple[int, str, str | None]]:
    """Yield (record_number, kind, wkt) from a whole .shp byte string.

    File layout: 100-byte header (big-endian file code 9994 at offset 0,
    file length in 16-bit words at 24), then records of
    [record_number:be_i32, content_words:be_i32, content...]."""
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError("not a shapefile: bad file code")
    (flen_words,) = struct.unpack_from(">i", buf, 24)
    end = min(len(buf), 2 * flen_words)
    off = 100
    while off + 8 <= end:
        recno, clen_words = struct.unpack_from(">2i", buf, off)
        content = buf[off + 8 : off + 8 + 2 * clen_words]
        kind, wkt = _parse_shape(content)
        yield recno, kind, wkt
        off += 8 + 2 * clen_words


def parse_dbf_header(buf: bytes) -> tuple[int, int, int, list[tuple[str, int]]]:
    """(record_count, header_size, record_size, [(field_name, length)...])."""
    nrec, hsize, rsize = struct.unpack_from("<IHH", buf, 4)
    fields: list[tuple[str, int]] = []
    off = 32
    while off < hsize - 1 and buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\x00", 1)[0].decode("latin-1")
        length = buf[off + 16]
        fields.append((name, length))
        off += 32
    return nrec, hsize, rsize, fields


def parse_dbf(buf: bytes) -> Iterator[dict[str, str] | None]:
    """Yield one stringly attribute dict per record SLOT — ``None`` for
    deleted records (1-byte flag ``*``) rather than skipping them. ``.shp``
    records are never deleted, so the positional zip in ``_records_for``
    relies on slot alignment; skipping would shift every attribute dict
    after the first deleted record onto the wrong geometry (and disagree
    with ``read_shapefile_split``, which already yields None). dBase III:
    fixed-width fields, latin-1 text."""
    nrec, hsize, rsize, fields = parse_dbf_header(buf)
    for i in range(nrec):
        off = hsize + i * rsize
        rec = buf[off : off + rsize]
        if len(rec) < rsize or rec[0:1] == b"*":  # deleted → keep the slot
            yield None
            continue
        out, pos = {}, 1
        for name, length in fields:
            out[name] = rec[pos : pos + length].decode("latin-1").strip()
            pos += length
        yield out


def _records_for(path: str, shp: bytes, dbf: bytes | None) -> Iterable[dict]:
    attrs: list[dict[str, str] | None]
    attrs = list(parse_dbf(dbf)) if dbf else []
    for idx, (recno, kind, wkt) in enumerate(parse_shp(shp)):
        yield {
            "path": path,
            "record_number": recno,
            "shape_type": kind,
            "geometry": wkt,
            "attributes": attrs[idx] if idx < len(attrs) else None,
        }


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """Distributed read of a directory/glob of shapefiles → one row per
    feature (WKT + stringly attribute map). Parallelism is per-file; each
    ``.shp``/``.dbf`` pair is parsed exactly once inside one Arrow batch."""
    import pandas as pd  # executor-side import

    shp = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.shp")
        .load(path)
        .select(F.col("path").alias("shp_path"), F.col("content").alias("shp"))
        .withColumn("stem", F.regexp_replace("shp_path", r"\.shp$", ""))
    )
    dbf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.dbf")
        .load(path)
        .select(F.col("content").alias("dbf"), F.regexp_replace("path", r"\.dbf$", "").alias("stem"))
    )
    paired = shp.join(dbf, "stem", "left")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dbf_bytes = r["dbf"] if isinstance(r["dbf"], (bytes, bytearray)) else None
                rows.extend(_records_for(r["shp_path"], bytes(r["shp"]), dbf_bytes))
            yield pd.DataFrame(
                rows, columns=[f.name for f in SHAPEFILE_SCHEMA.fields]
            )

    return paired.mapInPandas(parse, schema=SHAPEFILE_SCHEMA)


def read_shapefile_split(
    spark: SparkSession, shp_path: str, num_splits: int = 32
) -> DataFrame:
    """One huge .shp, many tasks. The driver reads only the tiny ``.shx``
    index (8 bytes/record) to slice the record space into ``num_splits``
    contiguous ranges; each task then seeks its own byte range of the .shp
    and the matching fixed-width .dbf range. The .shp itself never moves
    through the driver. Path must be executor-visible (shared FS)."""
    import pandas as pd

    base = shp_path[:-4] if shp_path.endswith(".shp") else shp_path
    with open(base + ".shx", "rb") as fh:
        shx = fh.read()
    nrec = (len(shx) - 100) // 8
    # per-record (byte_offset, content_words), big-endian, offsets in words
    entries = [struct.unpack_from(">2i", shx, 100 + 8 * i) for i in range(nrec)]
    num_splits = max(1, min(num_splits, nrec)) if nrec else 1
    step = -(-nrec // num_splits)
    splits = []
    for s in range(0, nrec, step):
        e = min(s + step, nrec)
        start_off = 2 * entries[s][0]
        end_off = 2 * entries[e - 1][0] + 8 + 2 * entries[e - 1][1]
        splits.append((s, e - s, start_off, end_off - start_off))
    sdf = spark.createDataFrame(
        splits, "first_record int, n_records int, byte_start long, byte_len long"
    ).repartition(len(splits))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dbf_meta = None
        try:
            with open(base + ".dbf", "rb") as fh:
                head = fh.read(32)
                hsize = struct.unpack_from("<H", head, 8)[0]
                fh.seek(0)
                dbf_meta = parse_dbf_header(fh.read(hsize))
        except OSError:
            pass
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                with open(base + ".shp", "rb") as fh:
                    fh.seek(int(r["byte_start"]))
                    chunk = fh.read(int(r["byte_len"]))
                attrs: list[dict[str, str] | None] = []
                if dbf_meta:
                    _, hsize, rsize, fields = dbf_meta
                    with open(base + ".dbf", "rb") as fh:
                        fh.seek(hsize + int(r["first_record"]) * rsize)
                        ab = fh.read(int(r["n_records"]) * rsize)
                    for i in range(int(r["n_records"])):
                        rec = ab[i * rsize : (i + 1) * rsize]
                        if len(rec) < rsize or rec[0:1] == b"*":
                            attrs.append(None)
                            continue
                        d, pos = {}, 1
                        for name, length in fields:
                            d[name] = rec[pos : pos + length].decode("latin-1").strip()
                            pos += length
                        attrs.append(d)
                off, idx = 0, 0
                while off + 8 <= len(chunk):
                    recno, clen_words = struct.unpack_from(">2i", chunk, off)
                    kind, wkt = _parse_shape(chunk[off + 8 : off + 8 + 2 * clen_words])
                    rows.append(
                        {
                            "path": base + ".shp",
                            "record_number": recno,
                            "shape_type": kind,
                            "geometry": wkt,
                            "attributes": attrs[idx] if idx < len(attrs) else None,
                        }
                    )
                    off += 8 + 2 * clen_words
                    idx += 1
            yield pd.DataFrame(rows, columns=[f.name for f in SHAPEFILE_SCHEMA.fields])

    return sdf.mapInPandas(parse, schema=SHAPEFILE_SCHEMA)


# ---------------------------------------------------------------------------
# Writers (public ESRI spec) — so tests and catalog fixtures can synthesize
# REAL shapefiles the reader must round-trip, same discipline as the
# multimodal codec encoders (multimodal/codecs.py).
# ---------------------------------------------------------------------------


def pack_shp(shapes: list[bytes]) -> tuple[bytes, bytes]:
    """Build (.shp, .shx) bytes from record content blocks."""
    recs, idx, off = [], [], 100
    for i, content in enumerate(shapes, start=1):
        words = len(content) // 2
        recs.append(struct.pack(">2i", i, words) + content)
        idx.append(struct.pack(">2i", off // 2, words))
        off += 8 + len(content)

    def header(total_bytes: int) -> bytes:
        h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0) + struct.pack(">i", total_bytes // 2)
        h += struct.pack("<2i", 1000, 1)  # version, shape type (unused by reader)
        h += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
        return h

    shp = header(off) + b"".join(recs)
    shx = header(100 + 8 * len(shapes)) + b"".join(idx)
    return shp, shx


def shp_point(x: float, y: float) -> bytes:
    return struct.pack("<i2d", 1, x, y)


def shp_polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    pts = [p for r in rings for p in r]
    parts, acc = [], 0
    for r in rings:
        parts.append(acc)
        acc += len(r)
    out = struct.pack("<i", 5) + struct.pack("<4d", 0, 0, 0, 0)
    out += struct.pack("<2i", len(rings), len(pts))
    out += struct.pack(f"<{len(parts)}i", *parts)
    out += b"".join(struct.pack("<2d", x, y) for x, y in pts)
    return out


def shp_polyline(lines: list[list[tuple[float, float]]]) -> bytes:
    return struct.pack("<i", 3) + shp_polygon(lines)[4:]


def pack_dbf(
    fields: list[tuple[str, int]],
    rows: list[list[str]],
    deleted: frozenset[int] | set[int] = frozenset(),
) -> bytes:
    """dBase III: fixed-width latin-1 character fields, 1-byte delete flag."""
    rsize = 1 + sum(length for _, length in fields)
    hsize = 32 + 32 * len(fields) + 1
    head = struct.pack("<4BIHH20x", 3, 26, 8, 13, len(rows), hsize, rsize)
    for name, length in fields:
        head += name.encode().ljust(11, b"\x00") + b"C" + b"\x00" * 4
        head += struct.pack("<BB", length, 0) + b"\x00" * 14
    head += b"\x0d"
    body = b""
    for i, row in enumerate(rows):
        flag = b"*" if i in deleted else b" "
        body += flag + b"".join(
            v.encode().ljust(length)[:length] for v, (_, length) in zip(row, fields)
        )
    return head + body + b"\x1a"


def write_shapefile(
    base_path: str,
    shapes: list[bytes],
    fields: list[tuple[str, int]],
    rows: list[list[str]],
) -> None:
    """Write ``base_path``.shp/.shx/.dbf as one standards-shaped trio."""
    shp, shx = pack_shp(shapes)
    with open(base_path + ".shp", "wb") as f:
        f.write(shp)
    with open(base_path + ".shx", "wb") as f:
        f.write(shx)
    with open(base_path + ".dbf", "wb") as f:
        f.write(pack_dbf(fields, rows))


# ---------------------------------------------------------------------------
# Registered Spark data source (Python DataSource API, Spark 4) — makes the
# split reader a first-class format: spark.read.format("shapefile") with
# .shx-driven partition planning, so shapefiles compose with every option
# and catalog mechanism a built-in source does.
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class ShapefileDataSource(DataSource):
        """``spark.read.format("shapefile").option("num_splits", 8)
        .load("/path/to/file.shp")`` — the read_shapefile_split path as a
        registered source. The driver plans partitions from the tiny
        ``.shx`` offset index only; each task seeks its own byte range of
        the executor-visible ``.shp``/``.dbf``."""

        @classmethod
        def name(cls) -> str:
            return "shapefile"

        def schema(self):
            return SHAPEFILE_SCHEMA

        def reader(self, schema):
            return _ShapefileSourceReader(self.options)

    class _ShapefileSourceReader(DataSourceReader):
        def __init__(self, options):
            path = options.get("path")
            if not path:
                raise ValueError("shapefile source: .load(path) is required")
            self.base = path[:-4] if path.endswith(".shp") else path
            self.num_splits = int(options.get("num_splits", "8"))

        def partitions(self):
            with open(self.base + ".shx", "rb") as fh:
                shx = fh.read()
            nrec = (len(shx) - 100) // 8
            entries = [
                struct.unpack_from(">2i", shx, 100 + 8 * i) for i in range(nrec)
            ]
            n = max(1, min(self.num_splits, nrec)) if nrec else 1
            step = -(-nrec // n) if nrec else 1
            parts = []
            for s in range(0, nrec, step):
                e = min(s + step, nrec)
                start_off = 2 * entries[s][0]
                end_off = 2 * entries[e - 1][0] + 8 + 2 * entries[e - 1][1]
                parts.append(InputPartition((s, e - s, start_off, end_off - start_off)))
            return parts or [InputPartition((0, 0, 100, 0))]

        def read(self, partition):
            first, n_records, byte_start, byte_len = partition.value
            if n_records == 0:
                return
            dbf_meta = None
            try:
                with open(self.base + ".dbf", "rb") as fh:
                    head = fh.read(32)
                    hsize = struct.unpack_from("<H", head, 8)[0]
                    fh.seek(0)
                    dbf_meta = parse_dbf_header(fh.read(hsize))
            except OSError:
                pass
            attrs: list[dict[str, str] | None] = []
            if dbf_meta:
                _, hsize, rsize, fields = dbf_meta
                with open(self.base + ".dbf", "rb") as fh:
                    fh.seek(hsize + first * rsize)
                    ab = fh.read(n_records * rsize)
                for i in range(n_records):
                    rec = ab[i * rsize : (i + 1) * rsize]
                    if len(rec) < rsize or rec[0:1] == b"*":
                        attrs.append(None)
                        continue
                    d, pos = {}, 1
                    for name, length in fields:
                        d[name] = rec[pos : pos + length].decode("latin-1").strip()
                        pos += length
                    attrs.append(d)
            with open(self.base + ".shp", "rb") as fh:
                fh.seek(byte_start)
                chunk = fh.read(byte_len)
            off, idx = 0, 0
            while off + 8 <= len(chunk):
                recno, clen_words = struct.unpack_from(">2i", chunk, off)
                kind, wkt = _parse_shape(chunk[off + 8 : off + 8 + 2 * clen_words])
                yield (
                    self.base + ".shp",
                    recno,
                    kind,
                    wkt,
                    attrs[idx] if idx < len(attrs) else None,
                )
                off += 8 + 2 * clen_words
                idx += 1

    def register_shapefile_source(spark: SparkSession) -> None:
        """Idempotent registration of the 'shapefile' format."""
        spark.dataSource.register(ShapefileDataSource)

except ImportError:  # pragma: no cover - Spark < 4 has no Python DataSource
    ShapefileDataSource = None  # type: ignore[assignment]

    def register_shapefile_source(spark: SparkSession) -> None:
        raise NotImplementedError(
            "shapefile DataSource requires Spark >= 4 (pyspark.sql.datasource)"
        )
