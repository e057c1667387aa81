"""Node / Polygonize / OffsetCurve (JTS semantics; Node.java:15,
Polygonize.java:26, linestring/transform/OffsetCurve.java)."""

import numpy as np
import pyarrow as pa

from geoflow.geom import algorithms as alg
from geoflow.geom.wkb import from_wkb, to_wkb
from geoflow.geom.wkt import from_wkt, to_wkt
from geoflow.ops import get_op


def _col(*wkts):
    return pa.array([to_wkb(from_wkt(w)) for w in wkts], type=pa.binary())


def test_node_crossing_lines():
    n = from_wkb(get_op("st_node").fn(
        _col("MULTILINESTRING((0 0,2 2),(0 2,2 0))"))[0].as_py())
    assert n.type == 5 and len(n.parts) == 4
    wkts = {to_wkt(p) for p in n.parts}
    assert wkts == {"LINESTRING (0 0, 1 1)", "LINESTRING (1 1, 2 2)",
                    "LINESTRING (0 2, 1 1)", "LINESTRING (1 1, 2 0)"}


def test_node_t_junction():
    n = from_wkb(get_op("st_node").fn(
        _col("MULTILINESTRING((0 0,4 0),(2 -1,2 0))"))[0].as_py())
    wkts = {to_wkt(p) for p in n.parts}
    assert "LINESTRING (0 0, 2 0)" in wkts
    assert "LINESTRING (2 0, 4 0)" in wkts


def test_polygonize_square_ring():
    p = from_wkb(get_op("st_polygonize").fn(
        _col("LINESTRING(0 0,4 0,4 4,0 4,0 0)"))[0].as_py())
    assert p.type == 3 and alg.area(p) == 16.0


def test_polygonize_nested_rings():
    """JTS Polygonizer on nested rings: outer-with-hole + inner."""
    p = from_wkb(get_op("st_polygonize").fn(_col(
        "MULTILINESTRING((0 0,4 0,4 4,0 4,0 0),"
        "(1 1,3 1,3 3,1 3,1 1))"))[0].as_py())
    assert p.type == 6 and len(p.parts) == 2
    areas = sorted(alg.area(q) for q in p.parts)
    assert areas == [4.0, 12.0]


def test_polygonize_grid_faces():
    p = from_wkb(get_op("st_polygonize").fn(_col(
        "MULTILINESTRING((0 0,2 0,2 2,0 2,0 0),(1 0,1 2),(0 1,2 1))"))
        [0].as_py())
    assert p.type == 6 and len(p.parts) == 4
    assert alg.area(p) == 4.0


def test_offsetcurve_straight_and_sides():
    l = from_wkb(get_op("st_offsetcurve").fn(
        _col("LINESTRING(0 0,10 0)"), 1.0)[0].as_py())
    assert to_wkt(l) == "LINESTRING (0 1, 10 1)"     # positive = left
    r = from_wkb(get_op("st_offsetcurve").fn(
        _col("LINESTRING(0 0,10 0)"), -1.0)[0].as_py())
    assert to_wkt(r) == "LINESTRING (0 -1, 10 -1)"


def test_offsetcurve_corner_join():
    # left offset of an L hugging the inside corner: simple miter
    l = from_wkb(get_op("st_offsetcurve").fn(
        _col("LINESTRING(0 0,5 0,5 5)"), 1.0)[0].as_py())
    assert np.allclose(l.coords[0], [0, 1])
    assert np.allclose(l.coords[-1], [4, 5])
    # right offset rounds the outside corner with an arc
    r = from_wkb(get_op("st_offsetcurve").fn(
        _col("LINESTRING(0 0,5 0,5 5)"), -1.0)[0].as_py())
    assert len(r.coords) > 4
    # every arc point stays at distance 1 from the corner vertex
    mid = r.coords[1:-1]
    d = np.hypot(mid[:, 0] - 5, mid[:, 1] - 0)
    assert np.allclose(d, 1.0, atol=1e-9)


def test_3d_ops():
    """Distance3D / ClosestPoint3D / LineLength3D / MaxDistance3D."""
    a = _col("POINT Z(0 0 0)")
    b = _col("POINT Z(3 4 12)")
    d = get_op("st_distance3d").fn(a, b)[0].as_py()
    assert d == 13.0
    # max distance between vertex sets
    m = get_op("st_maxdistance3d").fn(
        _col("LINESTRING Z(0 0 0,1 0 0)"), _col("POINT Z(0 0 5)"))[0].as_py()
    assert abs(m - np.sqrt(26.0)) < 1e-12
    # 3D length: 3-4-12 box diagonal chain
    ll = get_op("st_length3d").fn(
        _col("LINESTRING Z(0 0 0,3 4 0,3 4 12)"))[0].as_py()
    assert ll == 5.0 + 12.0
    # NaN z → 0 (reference semantics)
    l2 = get_op("st_length3d").fn(_col("LINESTRING(0 0,3 4)"))[0].as_py()
    assert l2 == 0.0
    # closest point on a 3D segment, returned as 2D point
    cp = from_wkb(get_op("st_closestpoint3d").fn(
        _col("LINESTRING Z(0 0 0,10 0 0)"), _col("POINT Z(4 3 0)"))
        [0].as_py())
    assert to_wkt(cp) == "POINT (4 0)"
    # segment-segment: crossing skew lines at height 2
    ds = get_op("st_distance3d").fn(
        _col("LINESTRING Z(0 0 0,10 0 0)"),
        _col("LINESTRING Z(5 -5 2,5 5 2)"))[0].as_py()
    assert ds == 2.0


def test_makevalid_bowtie():
    """Self-intersecting bowtie -> valid 2-part multipolygon, total
    area = sum of the two lobes (PostGIS linework semantics)."""
    v = from_wkb(get_op("st_makevalid").fn(
        _col("POLYGON((0 0,2 2,2 0,0 2,0 0))"))[0].as_py())
    assert v.type == 6 and len(v.parts) == 2
    assert alg.is_valid(v)
    assert abs(alg.area(v) - 2.0) < 1e-12


def test_makevalid_pinched_shell():
    v = from_wkb(get_op("st_makevalid").fn(
        _col("POLYGON((0 0,4 0,4 2,2 0,0 2,0 0))"))[0].as_py())
    assert alg.is_valid(v)
    assert abs(alg.area(v) - 4.0) < 1e-12


def test_makevalid_valid_passthrough():
    w = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    v = from_wkb(get_op("st_makevalid").fn(_col(w))[0].as_py())
    assert to_wkt(v) == w
    # valid polygon WITH hole also passes through unchanged
    wh = ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
          "(1 1, 1 2, 2 2, 2 1, 1 1))")
    vh = from_wkb(get_op("st_makevalid").fn(_col(wh))[0].as_py())
    assert to_wkt(vh) == wh


def test_makevalid_double_traversal_even_region_dropped():
    """A ring that traces a sub-rectangle twice: the doubly-wound
    overlap has EVEN parity and is removed (even-odd filling)."""
    # outer rect with a re-entrant duplicate loop over [1,2]x[0,1]
    w = ("POLYGON((0 0,3 0,3 1,2 1,2 0,1 0,1 1,0 1,0 0))")
    v = from_wkb(get_op("st_makevalid").fn(_col(w))[0].as_py())
    assert alg.is_valid(v)
    # kept area: [0,1]x[0,1] and [2,3]x[0,1]; middle cell parity even
    assert abs(alg.area(v) - 2.0) < 1e-12


def test_makevalid_nonareal_passthrough():
    v = from_wkb(get_op("st_makevalid").fn(
        _col("LINESTRING (0 0, 1 1)"))[0].as_py())
    assert to_wkt(v) == "LINESTRING (0 0, 1 1)"
