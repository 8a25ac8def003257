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
