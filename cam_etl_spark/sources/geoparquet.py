"""GeoParquet read support from spec (OGC GeoParquet 1.1,
geoparquet.org/releases/v1.1.0 — public): the ``geo`` file-level
key-value metadata (version / primary_column / per-column encoding,
geometry types, optional bbox+CRS) plus WKB geometry decoding (OGC
Simple Features well-known binary, both byte orders).

Why it's in the engine: the reference's spatial layer ingests
shapefiles (sources/shapefile.py); GeoParquet is what the same data
looks like in a modern lake — plain parquet columns the whole engine
already scans, plus a metadata contract naming which binary column is
geometry and how it is encoded. The read path stays 100% Spark-native
(the geometry column is a parquet binary column; predicate pushdown,
column pruning, row-group pruning all apply) — only the WKB→(x, y)
step runs as an Arrow-batched kernel, after which the existing
point-in-polygon / KNN / z-order operators take over.

Boundaries (loud): geo versions other than 1.x, non-WKB encodings
(the 1.1 native arrays), and WKB geometry types other than Point in
the point kernel raise; truncated WKB raises ValueError.

Reference parity: extends the engine's source surface (SURVEY.md
§2.1) beside the shapefile source (ref cam-etl loads spatial frames
from Shape/GeoJSON; GeoParquet is additive).
"""

from __future__ import annotations

import json
import struct


def geo_metadata(footer: dict) -> dict:
    """Extract + validate the GeoParquet ``geo`` metadata from a
    parse_footer() result. Returns the parsed dict with
    ``primary_column`` guaranteed WKB-encoded."""
    raw = footer.get("key_value_metadata", {}).get("geo")
    if raw is None:
        raise ValueError("geoparquet: no 'geo' key in file metadata")
    meta = json.loads(raw.decode("utf-8"))
    version = str(meta.get("version", ""))
    if not version.startswith("1."):
        raise NotImplementedError(
            f"geoparquet: version {version!r} unsupported (1.x only)"
        )
    primary = meta.get("primary_column")
    cols = meta.get("columns", {})
    if primary not in cols:
        raise ValueError(
            f"geoparquet: primary_column {primary!r} not described "
            f"in columns {sorted(cols)}"
        )
    enc = cols[primary].get("encoding")
    if enc != "WKB":
        raise NotImplementedError(
            f"geoparquet: encoding {enc!r} unsupported (WKB only; "
            "the 1.1 native point/linestring arrays stay loud)"
        )
    return meta


def wkb_point_xy(wkb: bytes) -> tuple[float, float]:
    """Decode one WKB Point (either byte order). Loud on any other
    geometry type or a truncated buffer."""
    if len(wkb) != 21:
        raise ValueError(
            f"geoparquet: WKB point must be 21 bytes, got {len(wkb)}"
        )
    order = wkb[0]
    if order not in (0, 1):
        raise ValueError(f"geoparquet: bad WKB byte order {order}")
    fmt = "<" if order == 1 else ">"
    (gtype,) = struct.unpack_from(fmt + "I", wkb, 1)
    if gtype != 1:
        raise NotImplementedError(
            f"geoparquet: WKB geometry type {gtype} unsupported in "
            "the point kernel (Point=1 only)"
        )
    x, y = struct.unpack_from(fmt + "dd", wkb, 5)
    return x, y


def points_xy(df, geom_col: str = "geometry"):
    """Add ``x``/``y`` doubles decoded from a WKB Point column — an
    Arrow-batched mapInPandas kernel (numpy reinterpret per byte
    order, no per-row Python in the loop bodies); every other column
    passes through unchanged. Zero shuffles. Loud on null geometries
    (named ValueError, not an opaque join error)."""
    import numpy as np
    import pandas as pd

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    ) + ", x double, y double"

    def run(batches):
        for pdf in batches:
            g = pdf[geom_col]
            n = len(pdf)
            x = np.empty(n, dtype="f8")
            y = np.empty(n, dtype="f8")
            if n:
                if g.isna().any():
                    raise ValueError(
                        "geoparquet: null geometry in WKB point "
                        "column (the point kernel requires every row "
                        "to carry a geometry)"
                    )
                lens = g.str.len()
                if not (lens == 21).all():
                    bad = int(lens[lens != 21].iloc[0])
                    raise ValueError(
                        "geoparquet: WKB point must be 21 bytes, "
                        f"got {bad}"
                    )
                buf = np.frombuffer(b"".join(g), dtype="u1").reshape(
                    n, 21)
                order = buf[:, 0]
                if not np.isin(order, (0, 1)).all():
                    raise ValueError("geoparquet: bad WKB byte order")
                gtype_le = buf[:, 1:5].copy().view("<u4")[:, 0]
                gtype_be = buf[:, 1:5].copy().view(">u4")[:, 0]
                gtype = np.where(order == 1, gtype_le, gtype_be)
                if not (gtype == 1).all():
                    raise NotImplementedError(
                        "geoparquet: WKB geometry type "
                        f"{int(gtype[gtype != 1][0])} unsupported in "
                        "the point kernel (Point=1 only)"
                    )
                xs_le = buf[:, 5:13].copy().view("<f8")[:, 0]
                xs_be = buf[:, 5:13].copy().view(">f8")[:, 0]
                ys_le = buf[:, 13:21].copy().view("<f8")[:, 0]
                ys_be = buf[:, 13:21].copy().view(">f8")[:, 0]
                le = order == 1
                x = np.where(le, xs_le, xs_be)
                y = np.where(le, ys_le, ys_be)
            out = pdf.copy()
            out["x"] = x
            out["y"] = y
            yield out

    return df.mapInPandas(run, out_schema)


def geo_file_metadata_json(primary: str, bbox: list | None = None,
                           geometry_types: list | None = None) -> bytes:
    """Author a spec-conformant ``geo`` metadata JSON (the writer-side
    half, used by fixtures and the engine's own exports)."""
    col: dict = {
        "encoding": "WKB",
        "geometry_types": geometry_types or ["Point"],
    }
    if bbox is not None:
        col["bbox"] = bbox
    return json.dumps({
        "version": "1.1.0",
        "primary_column": primary,
        "columns": {primary: col},
    }).encode("utf-8")
