"""Spatial KNN join (SURVEY J10/W2) — the reference's hardest operator.

Reference semantics (/root/reference/etl_lalf_road_qrt_spatial_match.py:49-93):
for each query point, take the top-``candidates`` targets by distance
(``ORDER BY q.geom <-> rp.geom LIMIT 100``), then apply a name-equality
filter, then keep the single nearest survivor. A matching target ranked
101st is legitimately missed — we replicate that exactly (SURVEY §7.3).

Two physical strategies:

- ``broadcast``: exact; broadcast the smaller target side and rank with a
  window. Right choice when targets fit in memory (QRT roads ≈ 543k
  segments — they do).
- ``grid``: both sides bucketed into grid cells (functions/spatial.grid_cell)
  and joined on the 3×3 neighbourhood of the query's cell — the shuffle-key
  analogue of the GiST index for when both sides are huge. Exact w.r.t. the
  candidate cap as long as cell_size covers the distance of the k-th
  neighbour.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cam_etl_spark.functions.spatial import euclidean_distance


def _rank_and_filter(
    joined: DataFrame,
    candidates: int,
    name_filter: Column | None,
    keep: int,
) -> DataFrame:
    w_dist = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("target_id").asc()
    )
    if name_filter is None:
        # Without a between-the-windows filter, final_rank over
        # cand_rank's own order IS cand_rank (row_number over a strictly
        # increasing unique sequence), so the second per-query window
        # sort is a no-op — one window, rank <= min(candidates, keep).
        return (
            joined.withColumn("cand_rank", F.row_number().over(w_dist))
            .filter(F.col("cand_rank") <= min(candidates, keep))
            .select(
                "query_id", "target_id", "distance", "cand_rank",
                F.col("cand_rank").alias("final_rank"),
            )
        )
    out = joined.withColumn("cand_rank", F.row_number().over(w_dist)).filter(
        F.col("cand_rank") <= candidates
    )
    out = out.filter(name_filter)
    w_keep = Window.partitionBy("query_id").orderBy(F.col("cand_rank").asc())
    return (
        out.withColumn("final_rank", F.row_number().over(w_keep))
        .filter(F.col("final_rank") <= keep)
        .select("query_id", "target_id", "distance", "cand_rank", "final_rank")
    )


def knn_join(
    points: DataFrame,
    targets: DataFrame,
    candidates: int = 100,
    keep: int = 1,
    name_filter: Column | None = None,
    strategy: str = "broadcast",
    cell_size: float | None = None,
) -> DataFrame:
    """points: (query_id, x, y); targets: (target_id, x, y [, extra cols
    referenced by name_filter]). Returns the reference's
    top-candidates → filter → keep-1 pipeline with planar distance."""
    p = points.withColumnRenamed("x", "qx").withColumnRenamed("y", "qy")
    t = targets.withColumnRenamed("x", "tx").withColumnRenamed("y", "ty")
    dist = euclidean_distance(F.col("qx"), F.col("qy"), F.col("tx"), F.col("ty"))

    if strategy == "broadcast":
        joined = p.crossJoin(F.broadcast(t)).withColumn("distance", dist)
        return _rank_and_filter(joined, candidates, name_filter, keep)

    if strategy == "grid":
        if cell_size is None:
            raise ValueError("grid strategy requires cell_size")
        cx = F.floor(F.col("qx") / F.lit(cell_size)).cast("long")
        cy = F.floor(F.col("qy") / F.lit(cell_size)).cast("long")
        # query side: explode into the 3×3 neighbourhood so any target within
        # one cell_size of the point is join-reachable.
        neigh = F.array(*[F.struct((cx + F.lit(dx)).alias("cx"), (cy + F.lit(dy)).alias("cy"))
                          for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
        pg = p.withColumn("cell", F.explode(neigh)).select(
            "*", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy")
        ).drop("cell")
        tg = t.withColumn("cx", F.floor(F.col("tx") / F.lit(cell_size)).cast("long")).withColumn(
            "cy", F.floor(F.col("ty") / F.lit(cell_size)).cast("long")
        )
        # no dedup needed: the query side explodes into 9 DISTINCT cells and
        # each target registers in exactly one cell, so a (query, target)
        # pair matches at most once — the dropDuplicates this used to carry
        # was a pure extra exchange on the candidate path (same argument as
        # nearest_segment_join below; removing it took one
        # Exchange hashpartitioning(query_id, target_id) out of every tier)
        joined = pg.join(tg, ["cx", "cy"]).withColumn("distance", dist).drop("cx", "cy")
        return _rank_and_filter(joined, candidates, name_filter, keep)

    raise ValueError(f"unknown strategy {strategy!r}")


def knn_join_exact(
    points: DataFrame,
    targets: DataFrame,
    tiers: tuple[float, ...] = (1.0, 8.0, 64.0),
) -> DataFrame:
    """Exact 1-NN join with NO cross join of the full target set: grid
    candidate generation (equi-join on cell) plus an escalating ring search
    for points whose nearest target is farther than the current cell size.

    Exactness argument per tier: the 3×3 cell neighbourhood contains every
    target within Chebyshev distance ``cell`` of the point, hence every
    target within Euclidean distance ``cell``. So if the best candidate found
    in the neighbourhood is at distance ≤ ``cell``, it is provably the global
    nearest — emit it. Otherwise the true nearest may sit outside the window;
    escalate the point (and only the point) to the next tier. The last tier
    must cover the data domain (Chebyshev extent), making its neighbourhood
    the whole target set — an equi-join in which all rows share one cell, not
    a crossJoin node, and by then only the pathological stragglers remain.

    This is the shuffle-key analogue of PostGIS's GiST index walk the
    reference leans on (/root/reference/etl_lalf_road_qrt_spatial_match.py:
    80-87): almost all points resolve in tier 1 with candidate volume
    ∝ local density × 9 cells; tier membership, not data volume, drives the
    per-tier cost, so the plan survives a 100× scale-up (density ↑ only
    shrinks NN distances, pushing MORE points into tier 1).
    """
    remaining = points
    parts: list[DataFrame] = []
    for i, cell in enumerate(tiers):
        cand = knn_join(
            remaining, targets, candidates=2**31 - 1, keep=1,
            strategy="grid", cell_size=cell,
        )
        last = i == len(tiers) - 1
        sure = cand if last else cand.filter(F.col("distance") <= F.lit(cell))
        sure = sure.select("query_id", "target_id", "distance")
        if not last:
            # Materialize each non-last tier's (small: resolved query ids +
            # one target each) result. Without this, tier i's grid-join
            # subtree is embedded in BOTH the final union and every later
            # tier's anti-join chain, so tier 1 executed ~3× per run
            # (visible as repeated subtrees in plans/r14/
            # j10_knn_nearest_before.txt). Guide §2.4/§5: pay one bounded
            # materialization, compute each tier exactly once — at 100 TB
            # the tier-1 candidate join is the dominant cost and must not
            # re-run per escalation level.
            sure = sure.localCheckpoint(eager=True)
            remaining = remaining.join(
                sure.select("query_id"), "query_id", "left_anti"
            )
        parts.append(sure)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def point_in_rect_join(points: DataFrame, rects: DataFrame, how: str = "inner") -> DataFrame:
    """Point-in-polygon join for axis-aligned polygons (SURVEY J9,
    /root/reference/cam/tables/lf_address.py:80-81): broadcast the small
    polygon side (QLD postcodes ≈ hundreds) and range-filter. For general
    polygons swap the predicate for a winding-number UDF or Sedona."""
    pred = (
        (F.col("x") >= F.col("xmin"))
        & (F.col("x") < F.col("xmax"))
        & (F.col("y") >= F.col("ymin"))
        & (F.col("y") < F.col("ymax"))
    )
    return points.join(F.broadcast(rects), pred, how)


def _ray_cast_inside() -> "F.Column":
    """Even-odd ray-cast membership as a pure column expression over
    (x, y, vertices array<struct<x,y>>): count edges a rightward ray
    crosses. Codegen'd JVM-side — shared by the broadcast and grid PIP
    joins so both execute the identical geometry predicate."""
    edges = F.arrays_zip(
        F.col("vertices"),
        F.concat(F.slice("vertices", 2, 1_000_000), F.slice("vertices", 1, 1)),
    )
    px, py = F.col("x"), F.col("y")

    def crosses(e):
        x1, y1 = e["vertices"]["x"], e["vertices"]["y"]
        x2, y2 = e["1"]["x"], e["1"]["y"]
        return ((y1 > py) != (y2 > py)) & (
            px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
        )

    return F.size(F.filter(edges, crosses)) % 2 == 1


def point_in_polygon_join_grid(
    points: DataFrame,
    polygons: DataFrame,
    cell_size: float = 1.0,
) -> DataFrame:
    """Point-in-polygon join with NO broadcast and NO cross join — the
    100 TB path when the polygon side is itself large (nationwide cadastre,
    not a few hundred postcodes).

    Both sides are bucketed onto a grid: a point lands in exactly ONE cell
    (floor(x/cell), floor(y/cell)); a polygon is replicated to every cell
    its bounding box overlaps (explode over the bbox's cell range — pure
    column algebra on the vertex array, no UDF). The (cx, cy) equi-join is
    the only shuffle, and Catalyst plans it like any join key — AQE can
    split hot cells. The exact ray-cast then filters candidates.

    Exact by construction, with no post-dedup: a containing polygon's bbox
    necessarily covers the containing point's cell, and since each point
    has exactly one cell, each (point, polygon) pair is tested exactly
    once. Replication cost = bbox area / cell² per polygon — size the cell
    to typical polygon extent; degenerate giant polygons (a state border)
    are the skew knob, handled upstream by splitting or routing the few of
    them through the broadcast path.
    """
    cs = F.lit(float(cell_size))
    xs = F.transform("vertices", lambda v: v["x"])
    ys = F.transform("vertices", lambda v: v["y"])
    polys = (
        polygons.withColumn("__cx0", F.floor(F.array_min(xs) / cs))
        .withColumn("__cx1", F.floor(F.array_max(xs) / cs))
        .withColumn("__cy0", F.floor(F.array_min(ys) / cs))
        .withColumn("__cy1", F.floor(F.array_max(ys) / cs))
        .withColumn("cx", F.explode(F.sequence("__cx0", "__cx1")))
        .withColumn("cy", F.explode(F.sequence("__cy0", "__cy1")))
        .drop("__cx0", "__cx1", "__cy0", "__cy1")
    )
    pts = points.withColumn("cx", F.floor(F.col("x") / cs)).withColumn(
        "cy", F.floor(F.col("y") / cs)
    )
    return (
        pts.join(polys, ["cx", "cy"])
        .filter(_ray_cast_inside())
        .drop("cx", "cy", "vertices")
    )


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """General point-in-polygon join by ray casting (even-odd rule), the
    non-rectangular J9 (/root/reference/cam/tables/lf_address.py:80-81 uses
    PostGIS ST_Intersects against the small QLD postcode polygon set).

    points: (…, x, y); polygons: (poly_id, vertices array<struct<x,y>>) —
    vertex order either way, closing edge implied. The polygon side is
    broadcast (it's small by assumption, like the reference's); the
    crossing test runs as a codegen'd filter over the zipped edge array —
    no Python in the loop. A point on an edge may land either side
    (standard ray-casting caveat).

    ``how``: ``inner`` (matching pairs only), ``left`` (one extra row with
    null polygon columns for each point inside NO polygon), or ``flag``
    (every point×polygon pair with a boolean ``__in`` column — the full
    product, for diagnostics)."""
    if how not in ("inner", "left", "flag"):
        raise ValueError(
            f"point_in_polygon_join: how={how!r} not supported — use "
            "'inner', 'left', or 'flag'"
        )
    pts = points
    if how == "left":
        # transient row id so unmatched points can be re-attached; derived
        # and dropped inside this one plan, never exposed.
        pts = pts.withColumn("__pid", F.monotonically_increasing_id())
    joined = pts.crossJoin(F.broadcast(polygons))
    out = joined.withColumn("__in", _ray_cast_inside())
    if how == "flag":
        return out.drop("vertices")
    matched = out.filter("__in").drop("__in", "vertices")
    if how == "inner":
        return matched
    poly_cols = [c for c in polygons.columns if c != "vertices"]
    unmatched = pts.join(matched.select("__pid"), "__pid", "left_anti")
    for c in poly_cols:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(polygons.dtypes)[c]))
    return matched.unionByName(unmatched).drop("__pid")


def nearest_segment_join(
    points: DataFrame,
    segments: DataFrame,
    tiers: tuple[float, ...] = (1.0, 8.0, 64.0),
) -> DataFrame:
    """Exact nearest-POLYLINE join — the reference's actual spatial match
    is point → nearest road CENTRELINE (PostGIS ``<->`` on linestrings,
    /root/reference/etl_lalf_road_qrt_spatial_match.py:80-87), not point →
    point. points: (query_id, x, y); segments: (target_id, verts) with
    verts = array<struct<x,y>> (functions/spatial.parse_wkt_linestring).

    Same escalating-ring shape as knn_join_exact, adjusted for extent:
    segments register in the grid by their FIRST vertex, and E = the max
    Chebyshev extent of any polyline from its first vertex (one scalar
    agg). In the 3×3 neighbourhood of cell size ``cell`` every segment
    whose first vertex lies within Chebyshev ``cell`` of the point is a
    candidate; an unseen segment's first vertex is farther than ``cell``,
    so no point of it is nearer than ``cell − E``. Hence a candidate at
    distance ≤ ``cell − E`` is provably the global nearest — emit;
    otherwise escalate the point. The last tier is widened to the data
    bbox extent when the configured tiers fall short, so its 3×3
    neighbourhood provably reaches every segment (still an equi-join on
    computed cell keys, never a crossJoin node).

    Cost: candidates ∝ local density × 9 cells, per tier; E only shifts
    the emit threshold. At 100 TB both sides stay partitioned; no
    broadcast of the 543k-segment set is required (though it would fit)."""
    from cam_etl_spark.functions.spatial import point_to_linestring_distance

    sstats = (
        segments.filter(F.size("verts") >= 1).select(
            F.greatest(
                F.array_max(F.transform(F.col("verts"), lambda v: F.abs(v["x"] - F.element_at(F.col("verts"), 1)["x"]))),
                F.array_max(F.transform(F.col("verts"), lambda v: F.abs(v["y"] - F.element_at(F.col("verts"), 1)["y"]))),
            ).alias("e"),
            F.element_at(F.col("verts"), 1)["x"].alias("sx"),
            F.element_at(F.col("verts"), 1)["y"].alias("sy"),
        )
        .agg(F.max("e"), F.min("sx"), F.max("sx"), F.min("sy"), F.max("sy"))
        .first()
    )
    ext = sstats[0] or 0.0
    pstats = points.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y")).first()
    # The proof in the docstring needs the LAST tier's cell to span the
    # data domain (a point cell and any first-vertex cell then differ by
    # ≤1, so the 3×3 neighbourhood reaches every segment).  Callers can't
    # know the domain, so derive it: Chebyshev extent of the union bbox of
    # points and first vertices, and widen the last tier to it if the
    # configured tiers fall short.  Two scalar aggs — one pass per side.
    if sstats[1] is not None and pstats[0] is not None:
        span = max(
            max(sstats[2], pstats[1]) - min(sstats[1], pstats[0]),
            max(sstats[4], pstats[3]) - min(sstats[3], pstats[2]),
        )
        tiers = tuple(tiers[:-1]) + (max(tiers[-1], float(span)),)
    # drop empty/null vertex arrays up front: element_at(_, 1) on [] is an
    # ANSI runtime error, and a vertex-less segment has no distance anyway
    seg = (
        segments.filter(F.size("verts") >= 1)
        .select(
            "target_id",
            "verts",
            F.element_at(F.col("verts"), 1)["x"].alias("sx"),
            F.element_at(F.col("verts"), 1)["y"].alias("sy"),
        )
    )
    remaining = points
    parts: list[DataFrame] = []
    for i, cell in enumerate(tiers):
        last = i == len(tiers) - 1
        # the last tier must span the data domain: its 3×3 neighbourhood
        # then reaches every first-vertex cell, and the join stays a HASH
        # equi-join on computed cell keys (literal cells would constant-fold
        # the condition away and plan a BroadcastNestedLoopJoin)
        qcx = F.floor(F.col("x") / F.lit(cell)).cast("long")
        qcy = F.floor(F.col("y") / F.lit(cell)).cast("long")
        neigh = F.array(*[
            F.struct((qcx + F.lit(dx)).alias("cx"), (qcy + F.lit(dy)).alias("cy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
        pg = (
            remaining.withColumn("cell", F.explode(neigh))
            .select("*", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))
            .drop("cell")
        )
        tg = seg.withColumn(
            "cx", F.floor(F.col("sx") / F.lit(cell)).cast("long")
        ).withColumn("cy", F.floor(F.col("sy") / F.lit(cell)).cast("long"))
        # no dedup needed: the query side explodes into 9 DISTINCT cells and
        # each segment registers in exactly one cell, so a (query, target)
        # pair matches at most once per tier — a dropDuplicates here would
        # be a pure extra exchange on the hot candidate path
        joined = pg.join(tg, ["cx", "cy"]).withColumn(
            "distance",
            point_to_linestring_distance(F.col("x"), F.col("y"), F.col("verts")),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.round(F.col("distance"), 6).asc(), F.col("target_id").asc()
        )
        best = (
            joined.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("query_id", "target_id", "distance")
        )
        # 2e-6 margin under the proof threshold: downstream consumers rank
        # on round(distance, 6), and two distances straddling cell − E by
        # less than one rounding quantum could otherwise tie at 6dp with an
        # unseen segment and flip the id tie-break vs a brute-force oracle.
        # Escalated points lose nothing — the next tier re-finds them.
        sure = best if last else best.filter(
            F.col("distance") <= F.lit(cell - ext - 2e-6)
        )
        if not last:
            # Same tier-materialization as knn_join_exact: without it the
            # tier-i candidate join re-executes inside every later tier's
            # anti-join lineage AND the final union (≈3× for 3 tiers).
            sure = sure.localCheckpoint(eager=True)
            remaining = remaining.join(
                sure.select("query_id"), "query_id", "left_anti"
            )
        parts.append(sure)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
