"""Delaunay / Voronoi / min-rectangle / tesselate / hull tests with
geometric-invariant oracles."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.geom import algorithms as alg, from_wkb, from_wkt, to_wkb
from geoflow.geom.triangulate import delaunay, minimum_rotated_rectangle
from geoflow.ops import get_op


def _col(*wkts):
    return pa.array([to_wkb(from_wkt(w)) for w in wkts], type=pa.binary())


def test_delaunay_square():
    tris = delaunay(np.array([[0, 0], [1, 0], [1, 1], [0, 1]]))
    assert len(tris) == 2  # square splits into exactly 2 triangles


def test_delaunay_area_invariant():
    """Triangles of a point cloud tile its convex hull: areas sum to the
    hull area, and the empty-circumcircle count matches n points."""
    rng = np.random.default_rng(8)
    pts = rng.uniform(0, 10, (40, 2))
    tris = delaunay(pts)
    total = 0.0
    for (i, j, k) in tris:
        a, b, c = pts[i], pts[j], pts[k]
        total += abs((b[0] - a[0]) * (c[1] - a[1])
                     - (c[0] - a[0]) * (b[1] - a[1])) / 2
    from geoflow.geom import Geometry
    hull = alg.convex_hull(Geometry.multi(4, [
        Geometry.point(x, y) for x, y in pts]))
    assert total == pytest.approx(alg.area(hull), rel=1e-9)


def test_delaunay_op():
    col = _col("MULTIPOINT((0 0),(4 0),(2 3),(2 1))")
    out = from_wkb(get_op("st_delaunaytriangles").fn(col).to_pylist()[0])
    assert out.type == 6 and len(out.parts) == 3


def test_voronoi_cells_contain_sites():
    col = _col("MULTIPOINT((0 0),(4 0),(2 3),(5 5),(1 4))")
    out = from_wkb(get_op("st_voronoipolygons").fn(col).to_pylist()[0])
    assert out.type == 6 and len(out.parts) == 5
    sites = np.array([[0, 0], [4, 0], [2, 3], [5, 5], [1, 4]], dtype=float)
    # each site is inside exactly one cell, and nearest-site property holds
    # for the cell centroids
    for cell in out.parts:
        cx, cy = alg.centroid(cell)
        d = np.hypot(sites[:, 0] - cx, sites[:, 1] - cy)
        owner = sites[np.argmin(d)]
        assert alg.points_in_polygon(np.array([owner[0]]),
                                     np.array([owner[1]]), cell)[0]


def test_minimum_rectangle_rotated():
    # a 45°-rotated 2x1 rectangle: min rect area must be ~2, not the
    # axis-aligned bbox area (~4.5)
    g = from_wkt("POLYGON((0 0, 1.41421356 1.41421356, "
                 "0.70710678 2.12132034, -0.70710678 0.70710678, 0 0))")
    rect, width, dia = minimum_rotated_rectangle(g)
    assert alg.area(rect) == pytest.approx(2.0, rel=1e-6)
    assert width == pytest.approx(1.0, rel=1e-6)


def test_minimumdiameter_op():
    col = _col("POLYGON((0 0,10 0,10 2,0 2,0 0))")
    assert get_op("st_minimumdiameter").fn(col).to_pylist()[0] == pytest.approx(2.0)
    rect = from_wkb(get_op("st_minimumrectangle").fn(col).to_pylist()[0])
    assert alg.area(rect) == pytest.approx(20.0, rel=1e-9)


def test_tesselate_area_preserved():
    col = _col("POLYGON((0 0,4 0,4 4,2 6,0 4,0 0))")
    out = from_wkb(get_op("st_tesselate").fn(col).to_pylist()[0])
    total = sum(alg.area(p) for p in out.parts)
    assert total == pytest.approx(20.0, rel=1e-9)


def test_concavehull_smaller_than_convex():
    # C-shaped point set: concave hull area < convex hull area
    rng = np.random.default_rng(9)
    t = rng.uniform(0, 1.5 * np.pi, 200)
    r = rng.uniform(4, 5, 200)
    pts = ", ".join(f"({r_ * np.cos(a)!r} {r_ * np.sin(a)!r})"
                    for a, r_ in zip(t, r))
    col = _col(f"MULTIPOINT({pts})")
    concave = from_wkb(get_op("st_concavehull").fn(col, 0.9).to_pylist()[0])
    hull = from_wkb(get_op("st_convexhull").fn(col).to_pylist()[0])
    assert sum(alg.area(p) for p in concave.parts) < alg.area(hull) * 0.9


def test_collect_agg(ray_session):
    import ray
    from geoflow.ops.tessellation import collect_agg
    from geoflow.geom.wkb import points_to_wkb
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = np.zeros(4)
    t = pa.table({"g": pa.array([0, 0, 1, 1]),
                  "geom_wkb": pa.array(points_to_wkb(x, y), type=pa.binary())})
    out = ray.data.from_arrow(t).groupby("g").aggregate(collect_agg()).take_all()
    rows = {r["g"]: from_wkb(r["collect"]) for r in out}
    assert rows[0].type == 4 and len(rows[0].parts) == 2
    assert rows[1].type == 4 and len(rows[1].parts) == 2
