"""Geo point queries: bounding box + distance (LatLonPoint analogs).

Reference surfaces: LatLonPoint.newBoxQuery / newDistanceQuery
(core:document/LatLonPoint.java:160,199). The reference executes these
as BKD-tree range intersections plus a haversine post-filter; the
Spark-first equivalent is a pushed-down min/max predicate on native
lat/lon DOUBLE columns (parquet min/max stats prune row groups the way
BKD cells prune) with the exact haversine distance evaluated inside
whole-stage codegen — no UDF, no shuffle.

Distance queries prefilter with the bounding box of the query circle
(the reference's LatLonPointDistanceQuery does exactly this before
haversine verification), including the longitude wrap at the
antimeridian and the pole-crossing degenerate case. Distances use the
mean earth radius 6371008.7714 m (the reference's
GeoUtils.EARTH_MEAN_RADIUS_METERS, util/SloppyMath.haversinMeters'
calibration) on the exact haversine formula — values match the
reference within double rounding of its sloppy-sin approximation
(documented: SloppyMath trades ~1e-6 relative error for speed; exact
trig is free inside codegen).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["EARTH_MEAN_RADIUS_METERS", "haversine_meters_expr",
           "box_query", "distance_query", "polygon_query",
           "geo_distance_feature_score"]

EARTH_MEAN_RADIUS_METERS = 6371008.7714  # GeoUtils.EARTH_MEAN_RADIUS_METERS


def haversine_meters_expr(lat_col: str, lon_col: str,
                          lat: float, lon: float) -> Column:
    """Exact haversine distance (meters) from each row's point to
    (lat, lon) — a pure Catalyst expression (codegen, no UDF)."""
    return F.expr(
        f"2.0 * {EARTH_MEAN_RADIUS_METERS} * asin(least(1.0, sqrt("
        f"pow(sin(radians({lat_col} - ({lat})) / 2), 2) + "
        f"cos(radians({lat_col})) * cos(radians({lat})) * "
        f"pow(sin(radians({lon_col} - ({lon})) / 2), 2))))")


def box_query(docs: DataFrame, lat_col: str, lon_col: str,
              min_lat: float, max_lat: float,
              min_lon: float, max_lon: float) -> DataFrame:
    """LatLonPoint.newBoxQuery: points inside the (inclusive) box.
    min_lon > max_lon means the box crosses the antimeridian and splits
    into two pushed-down ranges (the reference's dateline handling)."""
    lat_ok = (F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
    if min_lon <= max_lon:
        lon_ok = (F.col(lon_col) >= min_lon) & (F.col(lon_col) <= max_lon)
    else:
        lon_ok = (F.col(lon_col) >= min_lon) | (F.col(lon_col) <= max_lon)
    return docs.filter(lat_ok & lon_ok)


def distance_query(docs: DataFrame, lat_col: str, lon_col: str,
                   lat: float, lon: float, radius_m: float) -> DataFrame:
    """LatLonPoint.newDistanceQuery: points within radius_m meters of
    (lat, lon). A circle-bounding-box prefilter pushes to the scan
    (LatLonPointDistanceQuery's BKD cell rejection); the exact
    haversine runs only on box survivors."""
    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_METERS)
    min_lat, max_lat = lat - dlat, lat + dlat
    if min_lat <= -90.0 or max_lat >= 90.0:
        # circle crosses a pole: every longitude qualifies
        pre = docs.filter((F.col(lat_col) >= max(min_lat, -90.0))
                          & (F.col(lat_col) <= min(max_lat, 90.0)))
    else:
        dlon = math.degrees(math.asin(min(
            1.0, math.sin(radius_m / EARTH_MEAN_RADIUS_METERS)
            / max(1e-12, math.cos(math.radians(lat))))))
        lo, hi = lon - dlon, lon + dlon
        if lo < -180.0:
            lon_ok = (F.col(lon_col) >= lo + 360.0) | (F.col(lon_col) <= hi)
        elif hi > 180.0:
            lon_ok = (F.col(lon_col) >= lo) | (F.col(lon_col) <= hi - 360.0)
        else:
            lon_ok = (F.col(lon_col) >= lo) & (F.col(lon_col) <= hi)
        pre = docs.filter((F.col(lat_col) >= min_lat)
                          & (F.col(lat_col) <= max_lat) & lon_ok)
    dist = haversine_meters_expr(lat_col, lon_col, lat, lon)
    return pre.filter(dist <= radius_m)


def polygon_query(docs: DataFrame, lat_col: str, lon_col: str,
                  vertices: list) -> DataFrame:
    """LatLonPoint.newPolygonQuery (core:document/LatLonPoint.java:224;
    geo/Polygon2D.java contains): points inside a simple polygon given
    as [(lat, lon), ...] (closing vertex optional; no holes).

    The reference intersects BKD cells against an edge tree and
    even-odd ray-casts the survivors. Spark-first: the polygon's
    bounding box is a pushed-down min/max prefilter (parquet row-group
    pruning, the analog of cell rejection), and the crossing-number
    test is a FIXED-SIZE Catalyst expression — one conditional per
    non-horizontal edge summed and tested for odd parity, all inside
    whole-stage codegen. No UDF, no shuffle, O(edges) per row.

    Boundary semantics are even-odd half-open (a point exactly on an
    edge may fall either side); the reference's Polygon2D treats
    boundary points as contained — documented deviation, irrelevant
    for continuous coordinates.
    """
    vs = [(float(la), float(lo)) for la, lo in vertices]
    if len(vs) > 1 and vs[0] == vs[-1]:
        vs = vs[:-1]
    if len(vs) < 3:
        raise ValueError("polygon needs >= 3 distinct vertices")
    lats = [v[0] for v in vs]
    lons = [v[1] for v in vs]
    pre = docs.filter(
        (F.col(lat_col) >= min(lats)) & (F.col(lat_col) <= max(lats))
        & (F.col(lon_col) >= min(lons)) & (F.col(lon_col) <= max(lons)))
    y, x = F.col(lat_col), F.col(lon_col)
    crossings = F.lit(0)
    for i in range(len(vs)):
        y1, x1 = vs[i]
        y2, x2 = vs[(i + 1) % len(vs)]
        if y1 == y2:
            continue  # a horizontal edge never crosses the +x ray
        # ray from (x, y) toward +lon: edge crosses iff it spans y and
        # its x at height y lies to the right of the point
        spans = (F.lit(y1) > y) != (F.lit(y2) > y)
        x_at = (F.lit((x2 - x1) / (y2 - y1)) * (y - F.lit(y1))
                + F.lit(x1))
        crossings = crossings + F.when(spans & (x < x_at), 1).otherwise(0)
    return pre.filter(crossings % 2 == 1)


def geo_distance_feature_score(lat_col: str, lon_col: str,
                               origin_lat: float, origin_lon: float,
                               pivot_m: float,
                               weight: float = 1.0) -> Column:
    """LatLonPoint.newDistanceFeatureQuery score
    (core:document/LatLonPointDistanceFeatureQuery.java:130):

        weight * pivot / (pivot + haversine_m(point, origin))

    — the geo twin of the Long distance feature
    (``ops.features.distance_feature_score``): boost hits near an
    origin point, half the weight at ``pivot_m`` meters. The reference
    requires pivotDistance > 0 (:58-60) and skips docs without the
    field: NULL coordinates score 0. Compose as a SHOULD clause beside
    text clauses (score addition over the match stream), exactly like
    ``boost_by_distance``."""
    if pivot_m <= 0:
        raise ValueError(f"pivotDistance must be > 0, got {pivot_m}")
    dist = haversine_meters_expr(lat_col, lon_col, origin_lat, origin_lon)
    s = F.lit(float(weight)) * F.lit(float(pivot_m)) / (F.lit(float(pivot_m)) + dist)
    # explicit NULL guard: least(1.0, NULL) is 1.0 in Spark SQL (least
    # skips NULLs), so a NULL coordinate would otherwise score as an
    # antipodal-distance match instead of not matching at all
    has_point = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    return F.when(has_point, s).otherwise(F.lit(0.0))
