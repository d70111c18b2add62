"""Geo kernels: haversine distance + radius predicate.

The reference stores GeoJSON points with a 2dsphere index
(models.js:21-24, 34) but never runs a geo query; the engine exposes the
distance math the index implies (SURVEY §1.4: "geo predicates via
Haversine expression ... partition pruning/Z-order is the analogue of the
2dsphere index"). Pure sin/cos/atan2 column expressions — codegen'd,
no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in km between two (lat, lng) pairs in
    degrees."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlng = F.radians(lng2 - lng1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng) * F.sin(dlng)
    return F.lit(2 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def within_radius_km(
    lat1: Column, lng1: Column, lat2: Column, lng2: Column, radius_km: float
) -> Column:
    """Geo predicate: true when the two points are within radius_km.
    At scale, pre-filter with a cheap bounding box (degrees ≈ km/111) so
    the trig only runs on candidates — the expression below is exact."""
    return haversine_km(lat1, lng1, lat2, lng2) <= F.lit(radius_km)


def gps_point(lng: Column, lat: Column) -> Column:
    """GeoJSON-shaped point struct (models.js:21-24: [lng, lat] order)."""
    return F.struct(F.lit("Point").alias("type"), F.array(lng, lat).alias("coordinates"))
