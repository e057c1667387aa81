"""Measure / attribute operators (reference: geometry/attribute/*,
geometry/relation/Distance*, point/attribute/*, polygon/attribute/* —
Appendix A of SURVEY.md). Each op takes pyarrow columns, returns a
pyarrow array; vectorized point fast paths where the math allows."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..geom import algorithms as alg
from ..geom.greatcircle import geom_distance_sphere, vincenty_sphere_m
from .kernels import (binary_bool, binary_float, decode_geoms,
                      decode_points_fast, unary_bool, unary_float, unary_geom)
from .registry import register_op


@register_op("st_area", 1, "measure")
def st_area(col):
    """Planar area (Area.java:31; JTS Geometry#getArea)."""
    return unary_float(col, alg.area, point_fn=lambda x, y: np.zeros(len(x)))


@register_op("st_length", 1, "measure")
def st_length(col):
    """Length of linear components (Length.java:24)."""
    return unary_float(col, alg.length, point_fn=lambda x, y: np.zeros(len(x)))


@register_op("st_perimeter", 1, "measure")
def st_perimeter(col):
    """Perimeter of areal components (Perimeter.java:24)."""
    return unary_float(col, alg.perimeter, point_fn=lambda x, y: np.zeros(len(x)))


@register_op("st_x", 1, "measure")
def st_x(col):
    """X of point (point/attribute/X.java:28)."""
    return unary_float(col, lambda g: float(g.coords[0]) if g.type == 1 and not g.is_empty else math.nan,
                       point_fn=lambda x, y: x)


@register_op("st_y", 1, "measure")
def st_y(col):
    """Y of point (point/attribute/Y.java:28)."""
    return unary_float(col, lambda g: float(g.coords[1]) if g.type == 1 and not g.is_empty else math.nan,
                       point_fn=lambda x, y: y)


@register_op("st_xmin", 1, "measure")
def st_xmin(col):
    return unary_float(col, lambda g: g.bounds()[0], point_fn=lambda x, y: x)


@register_op("st_ymin", 1, "measure")
def st_ymin(col):
    return unary_float(col, lambda g: g.bounds()[1], point_fn=lambda x, y: y)


@register_op("st_xmax", 1, "measure")
def st_xmax(col):
    return unary_float(col, lambda g: g.bounds()[2], point_fn=lambda x, y: x)


@register_op("st_ymax", 1, "measure")
def st_ymax(col):
    return unary_float(col, lambda g: g.bounds()[3], point_fn=lambda x, y: y)


@register_op("st_z", 1, "measure")
def st_z(col):
    return unary_float(col, lambda g: float(g.coords[2])
                       if g.type == 1 and g.has_z and not g.is_empty else math.nan)


@register_op("st_npoints", 1, "measure")
def st_npoints(col):
    """NumPoints.java:24."""
    return unary_float(col, alg.num_points, point_fn=lambda x, y: np.ones(len(x)))


@register_op("st_numgeometries", 1, "measure")
def st_numgeometries(col):
    return unary_float(col, alg.num_geometries, point_fn=lambda x, y: np.ones(len(x)))


@register_op("st_dimension", 1, "measure")
def st_dimension(col):
    return unary_float(col, alg.dimension, point_fn=lambda x, y: np.zeros(len(x)))


@register_op("st_geometrytype", 1, "measure")
def st_geometrytype(col):
    out = [g.type_name if g is not None else None for g in decode_geoms(col)]
    return pa.array(out, type=pa.string())


@register_op("st_isempty", 1, "measure")
def st_isempty(col):
    return unary_bool(col, lambda g: g.is_empty)


@register_op("st_isvalid", 1, "measure")
def st_isvalid(col):
    return unary_bool(col, alg.is_valid)


@register_op("st_issimple", 1, "measure")
def st_issimple(col):
    return unary_bool(col, alg.is_simple)


@register_op("st_centroid", 1, "measure")
def st_centroid(col):
    """Centroid as WKB point (Centroid.java:35)."""
    from ..geom import Geometry

    def f(g):
        cx, cy = alg.centroid(g)
        return Geometry.point(cx, cy, srid=g.srid)
    return unary_geom(col, f)


@register_op("st_centroid_xy", 1, "measure")
def st_centroid_xy(col):
    """Centroid as a struct<x,y> (avoids WKB round-trip in aggregations)."""
    gs = decode_geoms(col)
    xs = np.full(len(gs), np.nan)
    ys = np.full(len(gs), np.nan)
    for i, g in enumerate(gs):
        if g is not None:
            xs[i], ys[i] = alg.centroid(g)
    return pa.StructArray.from_arrays([pa.array(xs), pa.array(ys)], ["x", "y"])


@register_op("st_envelope", 1, "measure")
def st_envelope(col):
    return unary_geom(col, alg.envelope_polygon)


@register_op("st_convexhull", 1, "measure")
def st_convexhull(col):
    """ConvexHull.java:12."""
    return unary_geom(col, alg.convex_hull)


@register_op("st_boundingdiagonal", 1, "measure")
def st_boundingdiagonal(col):
    from ..geom import Geometry

    def f(g):
        x0, y0, x1, y1 = g.bounds()
        return Geometry.linestring([[x0, y0], [x1, y1]], srid=g.srid)
    return unary_geom(col, f)


@register_op("st_minimumboundingradius", 1, "measure")
def st_minimumboundingradius(col):
    return unary_float(col, lambda g: alg.minimum_bounding_circle(g)[2])


@register_op("st_minimumboundingcircle", 1, "measure")
def st_minimumboundingcircle(col):
    from ..geom.algorithms import buffer_point

    def f(g):
        cx, cy, r = alg.minimum_bounding_circle(g)
        if r == 0:
            from ..geom import Geometry
            return Geometry.point(cx, cy, srid=g.srid)
        return buffer_point(cx, cy, r, srid=g.srid)
    return unary_geom(col, f)


@register_op("st_minimumclearance", 1, "measure")
def st_minimumclearance(col):
    """MinimumClearance.java:19 (golden 0.00032)."""
    return unary_float(col, lambda g: alg.minimum_clearance(g)[0])


@register_op("st_minimumclearanceline", 1, "measure")
def st_minimumclearanceline(col):
    """MinimumClearanceLine.java:21."""
    from ..geom import Geometry

    def f(g):
        _, pts = alg.minimum_clearance(g)
        if pts is None:     # degenerate input: clearance undefined
            return Geometry.empty(2, g.srid)
        return Geometry.linestring(np.array(pts), srid=g.srid)
    return unary_geom(col, f)


@register_op("st_circularity", 1, "measure")
def st_circularity(col):
    """4πA/P² (polygon/attribute/CircularityIndex.java:12; golden value
    0.5440126910331675 at CircularityIndexTest.java:21)."""
    def f(g):
        a = alg.area(g)
        p = alg.perimeter(g)
        if p == 0:
            return 0.0
        return 4.0 * math.pi * a / (p * p)
    return unary_float(col, f)


@register_op("st_compactnessratio", 1, "measure")
def st_compactnessratio(col):
    """sqrt(area / area-of-circle-with-same-perimeter)
    (geometry/attribute/CompactnessRatio.java:15)."""
    def f(g):
        a = alg.area(g)
        p = alg.perimeter(g)
        if p == 0:
            return math.nan
        circle_area = p * p / (4.0 * math.pi)
        return math.sqrt(a / circle_area) if circle_area > 0 else math.nan
    return unary_float(col, f)


@register_op("st_distance", 2, "measure")
def st_distance(col_a, col_b):
    """Planar distance (Distance.java:19-57; DistanceTest golden
    69.9400386045075)."""
    pa_pts = decode_points_fast(col_a)
    pb_pts = decode_points_fast(col_b)
    if pa_pts is not None and pb_pts is not None:
        dx = pa_pts[0] - pb_pts[0]
        dy = pa_pts[1] - pb_pts[1]
        # sqrt(dx*dx + dy*dy) — same IEEE op sequence as the SQL oracle
        # (np.hypot is more accurate but not bit-identical to sqrt-of-sum)
        d = np.sqrt(dx * dx + dy * dy)
        return pa.array(d, type=pa.float64())
    return binary_float(col_a, col_b, alg.distance)


@register_op("st_distancesphere", 2, "measure")
def st_distancesphere(col_a, col_b):
    """Great-circle distance between nearest coordinate pair
    (DistanceSphere.java:29-50; golden 7269372.186370237)."""
    pa_pts = decode_points_fast(col_a)
    pb_pts = decode_points_fast(col_b)
    if pa_pts is not None and pb_pts is not None:
        d = vincenty_sphere_m(pa_pts[0], pa_pts[1], pb_pts[0], pb_pts[1])
        return pa.array(d, type=pa.float64())
    return binary_float(col_a, col_b, geom_distance_sphere)


@register_op("st_maxdistance", 2, "measure")
def st_maxdistance(col_a, col_b):
    """MaxDistance.java:16."""
    return binary_float(col_a, col_b, alg.max_distance)


@register_op("st_hausdorffdistance", 2, "measure")
def st_hausdorffdistance(col_a, col_b):
    """HausdorffDistance.java:29."""
    return binary_float(col_a, col_b, alg.hausdorff_distance)


@register_op("st_centroiddistance", 2, "measure")
def st_centroiddistance(col_a, col_b):
    """CentroidDistance.java:15."""
    def f(a, b):
        ax, ay = alg.centroid(a)
        bx, by = alg.centroid(b)
        return math.hypot(ax - bx, ay - by)
    return binary_float(col_a, col_b, f)


@register_op("st_azimuth", 2, "measure")
def st_azimuth(col_a, col_b):
    """point/Azimuth.java:33 — clockwise from north, radians."""
    pa_pts = decode_points_fast(col_a)
    pb_pts = decode_points_fast(col_b)
    if pa_pts is not None and pb_pts is not None:
        a = np.arctan2(pb_pts[0] - pa_pts[0], pb_pts[1] - pa_pts[1])
        return pa.array(np.where(a < 0, a + 2 * np.pi, a), type=pa.float64())
    return binary_float(col_a, col_b, alg.azimuth)


@register_op("st_shortestline", 2, "measure")
def st_shortestline(col_a, col_b):
    """ShortestLine.java:31."""
    from ..geom import Geometry
    from .kernels import binary_geom

    def f(a, b):
        p, q = alg.closest_points(a, b)
        return Geometry.linestring([p, q], srid=a.srid)
    return binary_geom(col_a, col_b, f)


@register_op("st_closestpoint", 2, "measure")
def st_closestpoint(col_a, col_b):
    """ClosestPoint.java:27 — point on A closest to B."""
    from ..geom import Geometry
    from .kernels import binary_geom

    def f(a, b):
        p, _ = alg.closest_points(a, b)
        return Geometry.point(p[0], p[1], srid=a.srid)
    return binary_geom(col_a, col_b, f)


@register_op("st_areasimilarity", 2, "measure")
def st_areasimilarity(col_a, col_b):
    """min(areaA, areaB) / max(areaA, areaB)
    (geometry/relation/AreaSimilarity.java:16)."""
    def f(a, b):
        aa, ab = alg.area(a), alg.area(b)
        if max(aa, ab) == 0:
            return 1.0 if aa == ab else 0.0
        return min(aa, ab) / max(aa, ab)
    return binary_float(col_a, col_b, f)


@register_op("st_dwithin", 3, "measure")
def st_dwithin(col_a, col_b, dist):
    """DWithin: distance(a,b) <= d."""
    pa_pts = decode_points_fast(col_a)
    pb_pts = decode_points_fast(col_b)
    if pa_pts is not None and pb_pts is not None:
        d = np.hypot(pa_pts[0] - pb_pts[0], pa_pts[1] - pb_pts[1])
        return pa.array(d <= dist, type=pa.bool_())
    return binary_bool(col_a, col_b, lambda a, b: alg.distance(a, b) <= dist)
