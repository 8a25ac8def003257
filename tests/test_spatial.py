"""Spatial module — quad-grid bbox, haversine top-k, banded distance join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucenenet_spark import spatial


@pytest.fixture(scope="module")
def pts(spark):
    df = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    return spatial.synthetic_points(df).cache()


def test_bbox_matches_python_filter(pts):
    got = [r["id"] for r in spatial.bbox_query(pts, -10, 40, 0, 90).collect()]
    rows = pts.collect()
    expect = sorted(
        r["id"] for r in rows if -10 <= r["lat"] <= 40 and 0 <= r["lon"] <= 90
    )
    assert got == expect and got


def test_persisted_bbox_prunes_and_matches(pts, tmp_path, spark):
    path = str(tmp_path / "sp")
    spatial.build_spatial_index(pts, path, zoom=3)
    inline = spatial.bbox_query(pts, -10, 40, 0, 90).collect()
    persisted = spatial.bbox_query_persisted(spark, path, -10, 40, 0, 90, zoom=3)
    plan = persisted._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan  # directory pruning engaged
    assert [tuple(r) for r in persisted.collect()] == [tuple(r) for r in inline]


def test_distance_topk_matches_numpy(pts):
    got = [(r["id"], r["dist_km"]) for r in spatial.distance_topk(pts, 10.0, 20.0, k=5).collect()]
    rows = pts.collect()
    d2r = spatial.DEG2RAD
    dists = []
    for r in rows:
        dp = (r["lat"] - 10.0) * d2r
        dl = (r["lon"] - 20.0) * d2r
        h = (
            np.sin(dp / 2) ** 2
            + np.cos(10.0 * d2r) * np.cos(r["lat"] * d2r) * np.sin(dl / 2) ** 2
        )
        dists.append(
            (float(np.float32(2 * 6371.0 * np.arcsin(min(np.sqrt(h), 1.0)))), r["id"])
        )
    expect = [(i, d) for d, i in sorted(dists)[:5]]
    assert got == [(i, float(d)) for i, d in expect]


def test_distance_join_equals_all_pairs_at_high_latitude(spark):
    """Polar stress: 500-km pairs near lat 85 span tens of degrees of
    longitude — the latitude-band join must still find every pair the
    quadratic scan finds."""
    rows = [
        (i, 84.0 + (i % 30) * 0.2, -180.0 + i * 7.1) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {
        (r["id_a"], r["id_b"]) for r in spatial.distance_join(df, 500.0).collect()
    }
    d2r = spatial.DEG2RAD
    expect = set()
    for i, la1, lo1 in rows:
        for j, la2, lo2 in rows:
            if i >= j:
                continue
            dp = (la2 - la1) * d2r
            dl = (lo2 - lo1) * d2r
            h = (
                np.sin(dp / 2) ** 2
                + np.cos(la1 * d2r) * np.cos(la2 * d2r) * np.sin(dl / 2) ** 2
            )
            d = np.float32(2 * 6371.0 * np.arcsin(min(np.sqrt(h), 1.0)))
            if d <= np.float32(500.0):
                expect.add((i, j))
    assert got == expect and expect


_WKT = (
    "POLYGON ((-60.00005 -30.00005, 60.00005 -40.00005, 70.00005 20.00005, "
    "0.00005 55.00005, -65.00005 25.00005, -60.00005 -30.00005), "
    "(-20.00005 -10.00005, 20.00005 -10.00005, 20.00005 15.00005, "
    "-20.00005 15.00005, -20.00005 -10.00005))"
)


def test_wkt_parse_shapes_and_errors():
    rings = spatial.parse_wkt_polygon(_WKT)
    assert len(rings) == 2 and len(rings[0]) == 5 and len(rings[1]) == 4
    for bad in ("POINT (1 2)", "POLYGON 1 2", "POLYGON ((0 0, 1 1))",
                "POLYGON ((0 0, 1, 2 2, 0 0))"):
        with pytest.raises(ValueError):
            spatial.parse_wkt_polygon(bad)


def test_polygon_matches_numpy_raycast(pts):
    got = [r["id"] for r in spatial.polygon_contains_query(pts, _WKT).collect()]
    rows = pts.collect()
    edges = spatial._polygon_edges(spatial.parse_wkt_polygon(_WKT))
    px = np.array([r["lon"] for r in rows])
    py = np.array([r["lat"] for r in rows])
    mask = spatial._pip_mask(px, py, edges)
    expect = sorted(rows[i]["id"] for i in range(len(rows)) if mask[i])
    assert got == expect and got


def test_polygon_hole_excludes_interior(pts, spark):
    """A point in the hole is inside the shell but must not match."""
    df = spark.createDataFrame(
        [(1, 0.0001, 0.0001), (2, -25.0001, -40.0001), (3, 80.0, 0.0)],
        "id long, lat double, lon double",
    )  # 1 = in hole, 2 = in shell, 3 = outside bbox
    got = [r["id"] for r in spatial.polygon_contains_query(df, _WKT).collect()]
    assert got == [2]


def test_polygon_persisted_classifies_and_matches(pts, tmp_path, spark):
    path = str(tmp_path / "sp_poly")
    spatial.build_spatial_index(pts, path, zoom=3)
    inline = spatial.polygon_contains_query(pts, _WKT).collect()
    persisted = spatial.polygon_query_persisted(spark, path, _WKT, zoom=3).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in persisted]
    inside, boundary = spatial._cover_cells(spatial.parse_wkt_polygon(_WKT), 3)
    assert boundary  # the shell crosses cells at zoom 3
    assert not set(inside) & set(boundary)
