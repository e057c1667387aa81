"""Great-circle distance semantics.

The reference computes geographic-CRS distances as a great-circle
("Vincenty formula") between the *nearest coordinate pair* of the two
geometries (GeometryWrapper.java:596-640 in
/root/reference/src/main/io/github/galbiston/geosparql_jena/implementation/).
The exact constants were recovered from the reference's golden test
DistanceSphereTest.java:36 (`7269372.186370237` for the fixture pair):
spherical Vincenty/haversine with the IUGG mean Earth radius
R = 6371008.7714 m reproduces it to <2e-9 m.

All functions are numpy-vectorized; coordinates are lon/lat degrees
(CRS84 axis order: x=lon, y=lat).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.7714  # IUGG mean radius, matches reference fixtures


def haversine_m(lon1, lat1, lon2, lat2, radius=EARTH_RADIUS_M):
    """Great-circle distance in meters, vectorized over numpy arrays."""
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return radius * 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))


def vincenty_sphere_m(lon1, lat1, lon2, lat2, radius=EARTH_RADIUS_M):
    """Spherical Vincenty (numerically robust atan2 form); equals haversine
    on a sphere but stable for antipodal points."""
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlon = lon2 - lon1
    num = np.sqrt((np.cos(lat2) * np.sin(dlon)) ** 2
                  + (np.cos(lat1) * np.sin(lat2)
                     - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)) ** 2)
    den = np.sin(lat1) * np.sin(lat2) + np.cos(lat1) * np.cos(lat2) * np.cos(dlon)
    return radius * np.arctan2(num, den)


def geom_distance_sphere(a, b) -> float:
    """Reference `geof:distance` semantics for geographic CRS: great-circle
    between the euclidean-nearest coordinate pair."""
    from .algorithms import nearest_coordinate_pair
    pa, pb = nearest_coordinate_pair(a, b)
    return float(vincenty_sphere_m(pa[0], pa[1], pb[0], pb[1]))
