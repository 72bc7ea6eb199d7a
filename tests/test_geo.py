"""Geo box + distance queries (LatLonPoint.newBoxQuery /
newDistanceQuery analogs — round-4 verdict "what's missing #8").
Haversine values checked against an independent implementation;
box/distance membership brute-checked including antimeridian wrap.
"""

import math
import random

import pytest

from lucene_spark.ops.geo import (EARTH_MEAN_RADIUS_METERS, box_query,
                                  distance_query)


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * EARTH_MEAN_RADIUS_METERS * math.asin(min(1.0, math.sqrt(a)))


@pytest.fixture(scope="module")
def points(spark):
    rng = random.Random(17)
    rows = [(i, rng.uniform(-89.0, 89.0), rng.uniform(-180.0, 180.0))
            for i in range(400)]
    # pin a few interesting points
    rows += [(400, 0.0, 179.9), (401, 0.0, -179.9), (402, 89.5, 10.0),
             (403, 48.8566, 2.3522), (404, 48.86, 2.36)]
    return (spark.createDataFrame(rows, "id long, lat double, lon double"),
            rows)


def test_box_query_brute(spark, points):
    df, rows = points
    got = {r["id"] for r in
           box_query(df, "lat", "lon", 40.0, 50.0, 0.0, 10.0).collect()}
    want = {i for i, la, lo in rows
            if 40.0 <= la <= 50.0 and 0.0 <= lo <= 10.0}
    assert got == want and 403 in got


def test_box_query_antimeridian(spark, points):
    df, rows = points
    got = {r["id"] for r in
           box_query(df, "lat", "lon", -10.0, 10.0, 170.0, -170.0)
           .collect()}
    want = {i for i, la, lo in rows
            if -10.0 <= la <= 10.0 and (lo >= 170.0 or lo <= -170.0)}
    assert got == want and {400, 401} <= got


@pytest.mark.parametrize("center,radius", [
    ((48.8566, 2.3522), 5000.0),       # city scale
    ((0.0, 179.95), 50000.0),          # antimeridian crossing
    ((89.0, 0.0), 300000.0),           # near-pole circle
    ((-30.0, 100.0), 2000000.0),       # continental scale
])
def test_distance_query_brute(spark, points, center, radius):
    df, rows = points
    lat, lon = center
    got = {r["id"] for r in
           distance_query(df, "lat", "lon", lat, lon, radius).collect()}
    want = {i for i, la, lo in rows if _hav(la, lo, lat, lon) <= radius}
    assert got == want


def test_distance_values_match_reference_formula(spark, points):
    df, _ = points
    from lucene_spark.ops.geo import haversine_meters_expr
    r = (df.filter("id = 404")
         .select(haversine_meters_expr("lat", "lon", 48.8566, 2.3522)
                 .alias("d")).collect()[0]["d"])
    assert r == pytest.approx(_hav(48.86, 2.36, 48.8566, 2.3522),
                              rel=1e-9)


def test_distance_prefilter_is_pushed_down(spark, points, tmp_path):
    """The circle's bounding box reaches the parquet scan as
    PushedFilters (the BKD-cell pruning analog)."""
    df, _ = points
    p = str(tmp_path / "pts")
    df.write.parquet(p)
    out = distance_query(spark.read.parquet(p), "lat", "lon",
                         48.8566, 2.3522, 5000.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(lat" in plan


# ---------------------------------------------------------------------------
# polygon queries (LatLonPoint.newPolygonQuery / Polygon2D.contains)
# ---------------------------------------------------------------------------

def _winding_inside(lat, lon, vs):
    """Independent check: angle-sum winding number (a different
    algorithm from the engine's crossing count)."""
    total = 0.0
    n = len(vs)
    for i in range(n):
        y1, x1 = vs[i]
        y2, x2 = vs[(i + 1) % n]
        a1 = math.atan2(y1 - lat, x1 - lon)
        a2 = math.atan2(y2 - lat, x2 - lon)
        d = a2 - a1
        while d > math.pi:
            d -= 2 * math.pi
        while d < -math.pi:
            d += 2 * math.pi
        total += d
    return abs(total) > math.pi  # ~2*pi inside, ~0 outside


# an L-shaped (non-convex) polygon over Europe-ish coordinates
L_POLY = [(10.0, -10.0), (10.0, 30.0), (40.0, 30.0), (40.0, 10.0),
          (60.0, 10.0), (60.0, -10.0)]


def test_polygon_query_nonconvex_brute(spark, points):
    from lucene_spark.ops.geo import polygon_query
    df, rows = points
    got = {r["id"] for r in
           polygon_query(df, "lat", "lon", L_POLY).collect()}
    want = {i for i, la, lo in rows if _winding_inside(la, lo, L_POLY)}
    assert got == want
    assert want  # the fixture must actually exercise the inside branch
    # the notch (lat>40, lon>10) is excluded even though it is inside
    # the bounding box
    notch = {i for i, la, lo in rows
             if 40.0 < la < 60.0 and 10.0 < lo < 30.0}
    assert notch and not (notch & got)


def test_polygon_query_closing_vertex_and_degenerate(spark, points):
    from lucene_spark.ops.geo import polygon_query
    df, _ = points
    a = {r["id"] for r in
         polygon_query(df, "lat", "lon", L_POLY).collect()}
    b = {r["id"] for r in
         polygon_query(df, "lat", "lon", L_POLY + [L_POLY[0]]).collect()}
    assert a == b
    with pytest.raises(ValueError):
        polygon_query(df, "lat", "lon", [(0.0, 0.0), (1.0, 1.0)])


def test_polygon_is_pure_catalyst(spark, points):
    """No Python UDF in the plan: the crossing test must be codegen."""
    from lucene_spark.ops.geo import polygon_query
    df, _ = points
    plan = (polygon_query(df, "lat", "lon", L_POLY)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_geo_distance_feature_matches_reference_formula(spark, points):
    # LatLonPointDistanceFeatureQuery.java:130 —
    # boost * pivot / (pivot + haversine)
    from lucene_spark.ops.geo import geo_distance_feature_score
    df, rows = points
    origin, pivot, w = (48.8566, 2.3522), 50_000.0, 3.0
    got = {r["id"]: r["s"] for r in df.select(
        "id", geo_distance_feature_score(
            "lat", "lon", origin[0], origin[1], pivot, w).alias("s"))
        .collect()}
    for i, la, lo in rows:
        want = w * pivot / (pivot + _hav(la, lo, *origin))
        assert got[i] == pytest.approx(want, rel=1e-9), i
    # the origin point itself scores the full weight
    assert got[403] == pytest.approx(
        w * pivot / (pivot + _hav(48.8566, 2.3522, *origin)), rel=1e-9)
    assert got[403] > 2.999  # distance ~0 -> ~weight
    # NULL coordinates do not match -> 0
    null_df = spark.createDataFrame([(0, None, None)],
                                    "id long, lat double, lon double")
    out = null_df.select(geo_distance_feature_score(
        "lat", "lon", 0.0, 0.0, 1000.0).alias("s")).collect()
    assert out[0]["s"] == 0.0
    with pytest.raises(ValueError):
        geo_distance_feature_score("lat", "lon", 0.0, 0.0, 0.0)
