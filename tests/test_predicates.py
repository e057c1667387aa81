"""Topological predicate semantics + property-based consistency with a
sampling oracle."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from geoflow.geom import Geometry, from_wkt
from geoflow.geom import algorithms as alg

SQ = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
SQ_HOLE = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
                   " (4 4, 6 4, 6 6, 4 6, 4 4))")


@pytest.mark.parametrize("wkt,inside", [
    ("POINT(5 5)", True),
    ("POINT(15 5)", False),
    ("POINT(0 5)", True),      # boundary counts for intersects
    ("POINT(10 10)", True),    # corner
])
def test_point_polygon_intersects(wkt, inside):
    assert alg.intersects(from_wkt(wkt), SQ) == inside
    assert alg.intersects(SQ, from_wkt(wkt)) == inside


def test_hole_semantics():
    assert not alg.intersects(from_wkt("POINT(5 5)"), SQ_HOLE)
    assert alg.intersects(from_wkt("POINT(2 2)"), SQ_HOLE)
    # point on hole boundary still intersects the polygon (closure)
    assert alg.intersects(from_wkt("POINT(4 5)"), SQ_HOLE)
    assert not alg.contains(SQ_HOLE, from_wkt("POINT(5 5)"))


def test_contains_within_duality():
    inner = from_wkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert alg.contains(SQ, inner)
    assert alg.within(inner, SQ)
    assert not alg.contains(inner, SQ)
    assert alg.covers(SQ, inner)
    assert alg.covered_by(inner, SQ)


def test_contains_boundary_not_contained():
    # geometry fully on the boundary: covered but not contained (JTS)
    edge = from_wkt("LINESTRING(0 0, 0 10)")
    assert alg.covers(SQ, edge)
    assert not alg.contains(SQ, edge)


def test_overlaps_touches_crosses():
    shifted = from_wkt("POLYGON((5 5, 15 5, 15 15, 5 15, 5 5))")
    assert alg.overlaps(SQ, shifted)
    adjacent = from_wkt("POLYGON((10 0, 20 0, 20 10, 10 10, 10 0))")
    assert alg.touches(SQ, adjacent)
    assert not alg.overlaps(SQ, adjacent)
    line = from_wkt("LINESTRING(-5 5, 15 5)")
    assert alg.crosses(line, SQ)
    assert not alg.crosses(from_wkt("LINESTRING(1 1, 2 2)"), SQ)


def test_equals_topo_ring_rotation():
    rot = from_wkt("POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))")
    assert alg.equals_topo(SQ, rot)
    assert not alg.equals_topo(SQ, SQ_HOLE)


def test_disjoint():
    far = from_wkt("POLYGON((100 100, 101 100, 101 101, 100 101, 100 100))")
    assert alg.disjoint(SQ, far)
    assert not alg.intersects(SQ, far)


@settings(max_examples=60, deadline=None)
@given(st.floats(-12, 22, allow_nan=False), st.floats(-12, 22, allow_nan=False))
def test_pip_matches_area_oracle(x, y):
    """PIP against an independent oracle: point is inside the square iff
    0<=x<=10 and 0<=y<=10. Points within the boundary-snap epsilon
    (~1e-12, deliberate tolerance in _points_on_segments) may go either
    way."""
    eps = 1e-11
    near_boundary = (min(abs(x - 0), abs(x - 10)) < eps and -eps <= y <= 10 + eps) \
        or (min(abs(y - 0), abs(y - 10)) < eps and -eps <= x <= 10 + eps)
    if near_boundary:
        return
    got = alg.points_in_polygon(np.array([x]), np.array([y]), SQ)[0]
    assert got == (0 <= x <= 10 and 0 <= y <= 10)


@settings(max_examples=30, deadline=None)
@given(st.integers(3, 10), st.integers(0, 10**6))
def test_convex_polygon_pip_consistency(nv, seed):
    """Random convex polygon: centroid inside; far point outside; distance
    to contained point is 0."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    r = rng.uniform(0.5, 3.0)
    xs, ys = 5 + r * np.cos(ang), 5 + r * np.sin(ang)
    ring = np.column_stack([xs, ys])
    ring = np.vstack([ring, ring[:1]])
    poly = Geometry.polygon([ring])
    cx, cy = alg.centroid(poly)
    assert alg.points_in_polygon(np.array([cx]), np.array([cy]), poly)[0]
    assert not alg.points_in_polygon(np.array([100.0]), np.array([100.0]), poly)[0]
    pt = Geometry.point(cx, cy)
    assert alg.distance(pt, poly) == 0.0
    assert alg.contains(poly, pt)


def test_relate_de9im_matrices():
    from geoflow.geom.relate import relate_match, relate_matrix
    assert relate_matrix(from_wkt("POINT(5 5)"), SQ) == "0FFFFF212"
    assert relate_matrix(SQ, SQ) == "2FFF1FFF2"
    assert relate_matrix(SQ, from_wkt(
        "POLYGON((5 5,15 5,15 15,5 15,5 5))")) == "212101212"
    assert relate_matrix(SQ, from_wkt(
        "POLYGON((10 0,20 0,20 10,10 10,10 0))")) == "FF2F11212"
    assert relate_matrix(from_wkt("LINESTRING(-5 5, 15 5)"), SQ) == "101FF0212"
    assert relate_matrix(from_wkt("LINESTRING(0 0, 10 10)"),
                         from_wkt("LINESTRING(0 10, 10 0)")) == "0F1FF0102"
    # matches: overlaps pattern
    assert relate_match("212101212", "T*T***T**")
    assert not relate_match("FF2FF1212", "T*T***T**")


def test_relate_generic_overlap_bb_digit():
    """Generic (non-axis-aligned-sample) polygon overlap: ring segments
    properly cross at points that are not ring vertices/midpoints, so
    the B/B digit must come from the proper-cross test (JTS returns
    212101212 for these)."""
    from geoflow.geom.relate import relate_matrix
    a = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    b = from_wkt("POLYGON((1 1,9 1,9 9,1 9,1 1))")
    assert relate_matrix(a, b) == "212101212"
    assert relate_matrix(b, a) == "212101212"
    # skewed overlap — crossing points at non-rational sample positions
    c = from_wkt("POLYGON((2 -1,7 2,4 7,-1 4,2 -1))")
    assert relate_matrix(a, c) == "212101212"
    # corner touch keeps B/B = 0 with empty I/I
    d = from_wkt("POLYGON((4 4,6 4,6 6,4 6,4 4))")
    assert relate_matrix(a, d) == "FF2F01212"
    # strict containment unaffected
    e = from_wkt("POLYGON((1 1,2 1,2 2,1 2,1 1))")
    assert relate_matrix(a, e) == "212FF1FF2"
