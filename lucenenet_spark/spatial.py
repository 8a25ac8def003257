"""Spatial search — the Lucene.Net.Spatial module re-expressed
Spark-first (reference ``src/Lucene.Net.Spatial/``:
``SpatialStrategy.cs``, ``Vector/PointVectorStrategy.cs``,
``Prefix/RecursivePrefixTreeStrategy.cs``, ``Query/SpatialArgs.cs``
Intersects/distance operations).

Design mapping (NOT a port):
- PointVectorStrategy's two numeric fields -> plain ``lat``/``lon``
  double columns; an Intersects bbox query is a Catalyst BETWEEN
  filter that pushes down to the parquet scan.
- RecursivePrefixTreeStrategy's geohash trie -> an integer quad-grid
  cell id (``floor``-arithmetic only, so the SAME cell math runs as
  Spark Columns and as oracle SQL). ``build_spatial_index`` writes
  the corpus ``partitionBy(cell)``; a bbox query then prunes to the
  covering cells (parquet partition pruning — the IVF/standing-index
  pattern) before the exact filter.
- Distance (haversine, R=6371 km) runs in double and truncates to
  float32, the repo's oracle-determinism discipline; the degrees->
  radians factor is the explicit literal 0.017453292519943295 on
  both engines (``pi()/180`` would round differently).
- ``distance_join`` buckets by latitude band (band height r/110 deg
  >= the maximum latitude extent of an r-km pair), joins adjacent
  bands, cheap |dlat| lower-bound prefilter, exact haversine last —
  never all-pairs. At 100 TB the band key would sub-split longitude
  by cos(lat) per band; the band-only key is the simple form and the
  oracle checks it exactly. No antimeridian wrap (documented
  divergence; the reference's SpatialContext handles dateline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEG2RAD = 0.017453292519943295  # double(pi/180), pinned literal
EARTH_R_KM = 6371.0


def synthetic_points(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic (id, lat, lon) derived from the id by integer
    arithmetic (Knuth multiplicative constants) — the same formula
    the oracle SQL computes, so both engines see identical points."""
    did = F.col(id_col).cast("long")
    lat = ((did * F.lit(2654435761)) % 1800001).cast("double") / 10000.0 - 90.0
    lon = ((did * F.lit(2246822519)) % 3600001).cast("double") / 10000.0 - 180.0
    return docs.select(did.alias("id"), lat.alias("lat"), lon.alias("lon"))


def cell_of(lat, lon, zoom: int):
    """Integer quad-grid cell id at ``zoom`` (2^zoom x 2^zoom grid) —
    pure floor arithmetic, Column-native."""
    n = float(1 << zoom)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    y = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n))
    x = F.least(x, F.lit((1 << zoom) - 1)).cast("long")
    y = F.least(y, F.lit((1 << zoom) - 1)).cast("long")
    return y * F.lit(1 << zoom) + x


def bbox_query(
    points: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> DataFrame:
    """Intersects(bbox) over point data (SpatialOperation.Intersects,
    ``Query/SpatialArgs.cs``): a pushdown-able BETWEEN conjunction.
    Returns (id, lat, lon) sorted by id."""
    return points.where(
        F.col("lat").between(float(min_lat), float(max_lat))
        & F.col("lon").between(float(min_lon), float(max_lon))
    ).orderBy("id")


def build_spatial_index(points: DataFrame, path: str, zoom: int = 4) -> None:
    """Standing spatial index: the corpus partitioned by its quad cell
    (RecursivePrefixTree's trie level = the parquet partition column).
    Bbox queries then scan only covering-cell directories."""
    points.withColumn("cell", cell_of(F.col("lat"), F.col("lon"), zoom)).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)


def bbox_query_persisted(
    spark,
    path: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    zoom: int = 4,
) -> DataFrame:
    """Bbox over a :func:`build_spatial_index` warehouse: cell-range
    pruning (partition filter) then the exact BETWEEN."""
    n = 1 << zoom
    nx0 = int(np.floor((min_lon + 180.0) / 360.0 * n))
    nx1 = int(np.floor((max_lon + 180.0) / 360.0 * n))
    ny0 = int(np.floor((min_lat + 90.0) / 180.0 * n))
    ny1 = int(np.floor((max_lat + 90.0) / 180.0 * n))
    cells = [
        y * n + x
        for y in range(max(ny0, 0), min(ny1, n - 1) + 1)
        for x in range(max(nx0, 0), min(nx1, n - 1) + 1)
    ]
    pts = spark.read.parquet(path).where(F.col("cell").isin(cells))
    return bbox_query(pts.select("id", "lat", "lon"), min_lat, max_lat, min_lon, max_lon)


def parse_wkt_polygon(wkt: str) -> list[list[tuple[float, float]]]:
    """Minimal WKT POLYGON parser -> list of rings (shell first, then
    holes), each a list of (lon, lat) with the closing vertex dropped.
    Covers the shapes RecursivePrefixTreeStrategy accepts via
    Spatial4n's WktShapeParser (reference
    ``Prefix/RecursivePrefixTreeStrategy.cs:46``); only POLYGON here —
    points/bboxes already have first-class queries."""
    s = wkt.strip()
    up = s.upper()
    if not up.startswith("POLYGON"):
        raise ValueError(f"not a WKT POLYGON: {wkt[:40]!r}")
    body = s[len("POLYGON"):].strip()
    if not (body.startswith("(") and body.endswith(")")):
        raise ValueError("malformed POLYGON body")
    body = body[1:-1]
    rings: list[list[tuple[float, float]]] = []
    depth = 0
    start = None
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
            start = i + 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError("unbalanced parens in POLYGON")
            ring = []
            for pair in body[start:i].split(","):
                xy = pair.split()
                if len(xy) != 2:
                    raise ValueError(f"bad coordinate pair {pair!r}")
                ring.append((float(xy[0]), float(xy[1])))
            if len(ring) >= 2 and ring[0] == ring[-1]:
                ring = ring[:-1]
            if len(ring) < 3:
                raise ValueError("ring needs >= 3 distinct vertices")
            rings.append(ring)
    if not rings:
        raise ValueError("POLYGON with no rings")
    return rings


def _polygon_edges(rings) -> list[tuple[float, float, float, float]]:
    """All ring edges (x1, y1, x2, y2) incl. the closing edge — the
    even-odd rule over shell + hole edges together implements
    shell-minus-holes containment."""
    edges = []
    for ring in rings:
        for i, (x1, y1) in enumerate(ring):
            x2, y2 = ring[(i + 1) % len(ring)]
            edges.append((float(x1), float(y1), float(x2), float(y2)))
    return edges


def _pip_mask(px: np.ndarray, py: np.ndarray, edges) -> np.ndarray:
    """Vectorized even-odd ray cast (numpy twin of the Column/SQL
    forms — used for driver-side cell classification and in tests).
    Division-free: crossing iff the edge straddles py vertically AND
    sign((x2-x1)(py-y1) - (px-x1)(y2-y1)) == sign(y2-y1)."""
    inside = np.zeros(px.shape, dtype=bool)
    for x1, y1, x2, y2 in edges:
        straddle = (y1 > py) != (y2 > py)
        t = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
        inside ^= straddle & ((t > 0.0) == (y2 > y1))
    return inside


def _crossings_col(px, py, edges):
    """Even-odd crossing count as a pure JVM Column: F.aggregate over
    the literal edge array — no Python in the per-point hot path, and
    the identical double expression runs as the DuckDB oracle."""
    arr = F.array(
        *[
            F.struct(
                F.lit(x1).alias("x1"),
                F.lit(y1).alias("y1"),
                F.lit(x2).alias("x2"),
                F.lit(y2).alias("y2"),
            )
            for x1, y1, x2, y2 in edges
        ]
    )
    def step(acc, e):
        straddle = (e.y1 > py) != (e.y2 > py)
        t = (e.x2 - e.x1) * (py - e.y1) - (px - e.x1) * (e.y2 - e.y1)
        return acc + F.when(straddle & ((t > F.lit(0.0)) == (e.y2 > e.y1)), 1).otherwise(0)
    return F.aggregate(arr, F.lit(0), step)


def polygon_contains_query(points: DataFrame, wkt: str) -> DataFrame:
    """Points inside a WKT polygon (SpatialOperation.Intersects with a
    polygon shape, ``Prefix/RecursivePrefixTreeStrategy.cs:46`` role):
    shell-bbox BETWEEN prefilter (parquet pushdown) then an exact
    even-odd ray cast folded JVM-side over the literal edge list.
    Output (id, lat, lon) sorted by id. Boundary behavior: even-odd
    with strict inequalities — vertices/edges at exact point
    coordinates are undefined territory; pick polygon vertices off the
    data grid (the synthetic points sit on a 1e-4 lattice)."""
    rings = parse_wkt_polygon(wkt)
    edges = _polygon_edges(rings)
    xs = [x for x, _ in rings[0]]
    ys = [y for _, y in rings[0]]
    px, py = F.col("lon"), F.col("lat")
    return (
        points.where(
            py.between(min(ys), max(ys)) & px.between(min(xs), max(xs))
        )
        .where(_crossings_col(px, py, edges) % 2 == 1)
        .orderBy("id")
        .select("id", "lat", "lon")
    )


def _cover_cells(rings, zoom: int):
    """RecursivePrefixTree's fixed-depth grid approximation, driver
    side over the <= 4^zoom bbox cells: classify each shell-bbox cell
    OUTSIDE (pruned) / INSIDE (points pass with no per-point test) /
    BOUNDARY (exact ray cast on its points). A cell is BOUNDARY iff
    some edge's bbox overlaps it and the edge segment crosses the cell
    rectangle (conservative: edge-bbox overlap is the cheap test, may
    mark extra cells BOUNDARY — never wrong, only less pruned)."""
    n = 1 << zoom
    edges = _polygon_edges(rings)
    xs = [x for x, _ in rings[0]]
    ys = [y for _, y in rings[0]]
    cx0 = max(int(np.floor((min(xs) + 180.0) / 360.0 * n)), 0)
    cx1 = min(int(np.floor((max(xs) + 180.0) / 360.0 * n)), n - 1)
    cy0 = max(int(np.floor((min(ys) + 90.0) / 180.0 * n)), 0)
    cy1 = min(int(np.floor((max(ys) + 90.0) / 180.0 * n)), n - 1)
    inside_cells, boundary_cells = [], []
    for cy in range(cy0, cy1 + 1):
        lat0, lat1 = cy * 180.0 / n - 90.0, (cy + 1) * 180.0 / n - 90.0
        for cx in range(cx0, cx1 + 1):
            lon0, lon1 = cx * 360.0 / n - 180.0, (cx + 1) * 360.0 / n - 180.0
            touches = any(
                max(x1, x2) >= lon0 and min(x1, x2) <= lon1
                and max(y1, y2) >= lat0 and min(y1, y2) <= lat1
                for x1, y1, x2, y2 in edges
            )
            cell = cy * n + cx
            if touches:
                boundary_cells.append(cell)
            elif _pip_mask(
                np.array([(lon0 + lon1) / 2.0]), np.array([(lat0 + lat1) / 2.0]), edges
            )[0]:
                inside_cells.append(cell)
    return inside_cells, boundary_cells


def polygon_query_persisted(spark, path: str, wkt: str, zoom: int = 4) -> DataFrame:
    """Polygon containment over a :func:`build_spatial_index`
    warehouse: OUTSIDE cells never read (partition pruning), INSIDE
    cells pass wholesale, only BOUNDARY-cell points pay the exact ray
    cast — the fixed-depth form of RecursivePrefixTreeStrategy's
    approximated/exact split."""
    rings = parse_wkt_polygon(wkt)
    edges = _polygon_edges(rings)
    inside_cells, boundary_cells = _cover_cells(rings, zoom)
    px, py = F.col("lon"), F.col("lat")
    parts = []
    if inside_cells:
        parts.append(
            spark.read.parquet(path)
            .where(F.col("cell").isin(inside_cells))
            .select("id", "lat", "lon")
        )
    if boundary_cells:
        parts.append(
            spark.read.parquet(path)
            .where(F.col("cell").isin(boundary_cells))
            .where(_crossings_col(px, py, edges) % 2 == 1)
            .select("id", "lat", "lon")
        )
    if not parts:
        return spark.read.parquet(path).select("id", "lat", "lon").limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("id")


def _haversine_udf():
    @F.pandas_udf("float")
    def hav(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        p1 = lat1.to_numpy(dtype=np.float64) * DEG2RAD
        p2 = lat2.to_numpy(dtype=np.float64) * DEG2RAD
        dp = (lat2.to_numpy(dtype=np.float64) - lat1.to_numpy(dtype=np.float64)) * DEG2RAD
        dl = (lon2.to_numpy(dtype=np.float64) - lon1.to_numpy(dtype=np.float64)) * DEG2RAD
        h = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
        # rounding can push h a hair past 1 -> arcsin domain error;
        # both engines clamp identically (SQL: least(sqrt(h), 1.0))
        d = 2.0 * EARTH_R_KM * np.arcsin(np.minimum(np.sqrt(h), 1.0))
        return pd.Series(d.astype(np.float32))

    return hav


def distance_topk(
    points: DataFrame, qlat: float, qlon: float, k: int = 10
) -> DataFrame:
    """k nearest points to (qlat, qlon) by float32 haversine km —
    the distance-sort of PointVectorStrategy.MakeDistanceValueSource.
    One scan + TakeOrdered. Output (rank, id, dist_km)."""
    hav = _haversine_udf()
    scored = points.select(
        "id",
        hav(
            F.lit(float(qlat)), F.lit(float(qlon)), F.col("lat"), F.col("lon")
        ).alias("dist_km"),
    )
    w = Window.orderBy(F.col("dist_km").asc(), F.col("id").asc())
    return (
        scored.orderBy(F.col("dist_km").asc(), F.col("id").asc())
        .limit(k)
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "id",
            F.col("dist_km").cast("double").alias("dist_km"),
        )
    )


def distance_join(points: DataFrame, radius_km: float) -> DataFrame:
    """All pairs (id_a < id_b) within ``radius_km`` — grid-bucketed,
    never all-pairs: latitude bands of height radius/110 deg (>= the
    max latitude extent of a qualifying pair, since a meridian degree
    is >= 110.57 km), adjacent-band join, |dlat| lower-bound
    prefilter, exact float32 haversine last. Output
    (id_a, id_b, dist_km) sorted."""
    band_h = float(radius_km) / 110.0
    banded = points.withColumn(
        "band", F.floor((F.col("lat") + F.lit(90.0)) / F.lit(band_h)).cast("long")
    )
    a = banded.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band"),
    )
    b = banded.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "band",
    )
    max_dlat = float(radius_km) / 110.0
    hav = _haversine_udf()
    cand = (
        a.join(b, "band")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.abs(F.col("lat_a") - F.col("lat_b")) <= F.lit(max_dlat))
        .drop("band")
    )
    # no dedup needed: b carries its HOME band only, so a pair joins
    # on exactly one of a's three exploded band values
    return (
        cand.withColumn(
            "dist_km",
            hav(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")),
        )
        .where(F.col("dist_km") <= F.lit(float(radius_km)).cast("float"))
        .select("id_a", "id_b", F.col("dist_km").cast("double").alias("dist_km"))
        .orderBy("id_a", "id_b")
    )
