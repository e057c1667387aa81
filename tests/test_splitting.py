"""Subdivide / split tests — area-preservation oracles."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.geom import algorithms as alg, from_wkb, from_wkt, to_wkb
from geoflow.ops import get_op


def _col(*wkts):
    return pa.array([to_wkb(from_wkt(w)) for w in wkts], type=pa.binary())


def test_split_straight_blade():
    col = _col("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    blade = _col("LINESTRING(5 -1, 5 11)")
    out = from_wkb(get_op("st_split").fn(col, blade).to_pylist()[0])
    assert len(out.parts) == 2
    assert sorted(alg.area(p) for p in out.parts) == [50.0, 50.0]


def test_split_diagonal():
    col = _col("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    blade = _col("LINESTRING(-1 -1, 11 11)")
    out = from_wkb(get_op("st_split").fn(col, blade).to_pylist()[0])
    areas = sorted(alg.area(p) for p in out.parts)
    assert areas == pytest.approx([50.0, 50.0])


def test_subdivide_preserves_area():
    # a 16-vertex convex polygon
    ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    ring = ", ".join(f"{5 + 3 * np.cos(a)!r} {5 + 3 * np.sin(a)!r}"
                     for a in ang)
    first = f"{5 + 3 * np.cos(0)!r} {5 + 3 * np.sin(0)!r}"
    col = _col(f"POLYGON(({ring}, {first}))")
    orig_area = alg.area(from_wkb(col[0].as_py()))
    out = from_wkb(get_op("st_subdivide").fn(col, 8).to_pylist()[0])
    assert len(out.parts) > 1
    assert sum(alg.area(p) for p in out.parts) == pytest.approx(orig_area, rel=1e-9)
    for p in out.parts:
        assert sum(len(r) for r in p.rings) <= 8 + 4  # clip can add corners


def test_subdivide_min_vertices_terminates():
    col = _col("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    out = from_wkb(get_op("st_subdivide").fn(col, 1).to_pylist()[0])
    assert sum(alg.area(p) for p in out.parts) == pytest.approx(100.0)


def test_split_general_polyline_blade():
    """General (multi-segment) blades via noding+polygonize: an L-cut
    from boundary to boundary yields two exact pieces; non-crossing
    blades leave the input unchanged."""
    import pyarrow as pa
    from geoflow.geom.wkb import from_wkb, to_wkb
    from geoflow.ops import get_op

    def col(*w):
        return pa.array([to_wkb(from_wkt(x)) for x in w], type=pa.binary())

    sq = "POLYGON((0 0,4 0,4 4,0 4,0 0))"
    r = from_wkb(get_op("st_split").fn(
        col(sq), col("LINESTRING(2 -1,2 2,5 2)"))[0].as_py())
    areas = sorted(round(alg.area(p), 9) for p in r.parts)
    assert areas == [4.0, 12.0]
    # diagonal blade still exact
    r2 = from_wkb(get_op("st_split").fn(
        col(sq), col("LINESTRING(-1 -1,5 5)"))[0].as_py())
    assert sorted(alg.area(p) for p in r2.parts) == [8.0, 8.0]
    # non-crossing blade: unchanged geometry
    r3 = from_wkb(get_op("st_split").fn(
        col(sq), col("LINESTRING(10 10,12 12)"))[0].as_py())
    assert alg.area(r3) == 16.0
