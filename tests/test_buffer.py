"""True buffer (capsule-union Minkowski sum on the overlay engine) —
replaces the round-1 hull-of-discs approximation. Validated against the
analytic inscribed-polygon areas and a brute-force distance oracle
(any sampled point is in buffer(g, d) iff dist(point, g) ≤ d up to the
32-gon discretization band)."""

import math

import numpy as np

from geoflow.geom import algorithms as alg
from geoflow.geom.types import Geometry
from geoflow.geom.wkt import from_wkt

# inscribed 32-gon of the unit disc (quadsegs=8) has area 16·sin(π/16)
_DISC32 = 0.5 * 32 * math.sin(2 * math.pi / 32)


def test_line_buffer_area_exact():
    L = from_wkt("LINESTRING(0 0, 10 0)")
    b = alg.buffer(L, 1.0)
    # band 2·len·d + two half 32-gon caps
    assert abs(alg.area(b) - (20.0 + _DISC32)) < 1e-9


def test_polyline_buffer_distance_oracle():
    L = from_wkt("LINESTRING(0 0, 4 0, 4 4, 8 4)")
    d = 0.75
    b = alg.buffer(L, d)
    rng = np.random.default_rng(3)
    xs = rng.uniform(-2, 10, 4000)
    ys = rng.uniform(-2, 6, 4000)
    inb = alg.points_in_polygon(xs, ys, b)
    dd = np.array([alg.distance(Geometry.point(x, y), L)
                   for x, y in zip(xs, ys)])
    assert ((dd < d - 0.01) & ~inb).sum() == 0
    assert ((dd > d + 0.01) & inb).sum() == 0


def test_concave_polygon_buffer_distance_oracle():
    P = from_wkt("POLYGON((0 0,4 0,4 2,2 2,2 4,0 4,0 0))")
    d = 0.5
    b = alg.buffer(P, d)
    rng = np.random.default_rng(1)
    xs = rng.uniform(-1, 5, 4000)
    ys = rng.uniform(-1, 5, 4000)
    inb = alg.points_in_polygon(xs, ys, b)
    dd = np.array([alg.distance(Geometry.point(x, y), P)
                   for x, y in zip(xs, ys)])
    assert ((dd < d - 0.01) & ~inb).sum() == 0
    assert ((dd > d + 0.01) & inb).sum() == 0


def test_negative_buffer_erosion():
    S = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert alg.area(alg.buffer(S, -1.0)) == 4.0
    e = alg.buffer(S, -2.5)   # erosion annihilates
    assert e.is_empty or alg.area(e) < 1e-9
    # L-shape: 2-wide arms eroded by 0.5 → 1-wide arms, area 5 (+ tiny
    # convex-corner arc excess from the 32-gon discretization)
    P = from_wkt("POLYGON((0 0,4 0,4 2,2 2,2 4,0 4,0 0))")
    a = alg.area(alg.buffer(P, -0.5))
    assert 5.0 <= a < 5.06


def test_buffer_zero_and_lowdim():
    S = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert alg.area(alg.buffer(S, 0.0)) == 16.0
    L = from_wkt("LINESTRING(0 0,1 1)")
    assert alg.buffer(L, 0.0).is_empty
    assert alg.buffer(L, -1.0).is_empty


def test_point_buffer_unchanged():
    p = from_wkt("POINT(2 3)")
    b = alg.buffer(p, 2.0)
    assert abs(alg.area(b) - 4.0 * _DISC32) < 1e-9


def test_multipolygon_buffer_merges_close_parts():
    m = from_wkt("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),"
                 "((1.5 0,2.5 0,2.5 1,1.5 1,1.5 0)))")
    b = alg.buffer(m, 0.3)   # gap 0.5 < 2·0.3 → parts fuse
    assert b.type == 3
    assert alg.area(b) > 2.0
