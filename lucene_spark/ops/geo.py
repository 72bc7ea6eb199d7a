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
           "box_query", "distance_query"]

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
