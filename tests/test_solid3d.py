"""Convex-solid 3D booleans (geom/solid3d.py + ops/solids.py):
box-arithmetic oracles, prism volume = area x height, the
vol(P∩Q) + vol(P\\Q) = vol(P) invariant, and WKB round-trips through
the op layer."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.geom.solid3d import (ConvexSolid, difference_faces,
                                  faces_volume, intersect_solids,
                                  solid_faces_geometry, solid_from_box,
                                  solid_from_faces, solid_from_prism)


def _box_overlap(a, b):
    dx = max(0.0, min(a[3], b[3]) - max(a[0], b[0]))
    dy = max(0.0, min(a[4], b[4]) - max(a[1], b[1]))
    dz = max(0.0, min(a[5], b[5]) - max(a[2], b[2]))
    return dx * dy * dz


def _box_vol(a):
    return (a[3] - a[0]) * (a[4] - a[1]) * (a[5] - a[2])


class TestSolidMath:
    def test_unit_box(self):
        s = solid_from_box(0, 0, 0, 1, 1, 1)
        g = solid_faces_geometry(s)
        assert len(g.parts) == 6
        assert faces_volume(g) == pytest.approx(1.0, rel=1e-9)

    def test_box_intersection_fuzz(self):
        rng = np.random.default_rng(4)
        for _ in range(200):
            a = np.sort(rng.integers(-8, 9, size=(3, 2)), axis=1)
            b = np.sort(rng.integers(-8, 9, size=(3, 2)), axis=1)
            a = (a[0, 0], a[1, 0], a[2, 0],
                 a[0, 1] + 1, a[1, 1] + 1, a[2, 1] + 1)
            b = (b[0, 0], b[1, 0], b[2, 0],
                 b[0, 1] + 1, b[1, 1] + 1, b[2, 1] + 1)
            inter = intersect_solids(solid_from_box(*a),
                                     solid_from_box(*b))
            got = faces_volume(solid_faces_geometry(inter))
            assert got == pytest.approx(_box_overlap(a, b), abs=1e-7)

    def test_box_difference_invariant_fuzz(self):
        rng = np.random.default_rng(9)
        for _ in range(100):
            av = np.sort(rng.integers(-6, 7, size=(3, 2)), axis=1)
            bv = np.sort(rng.integers(-6, 7, size=(3, 2)), axis=1)
            a = (av[0, 0], av[1, 0], av[2, 0],
                 av[0, 1] + 1, av[1, 1] + 1, av[2, 1] + 1)
            b = (bv[0, 0], bv[1, 0], bv[2, 0],
                 bv[0, 1] + 1, bv[1, 1] + 1, bv[2, 1] + 1)
            p, q = solid_from_box(*a), solid_from_box(*b)
            diff_vol = faces_volume(difference_faces(p, q))
            assert diff_vol == pytest.approx(
                _box_vol(a) - _box_overlap(a, b), abs=1e-7)

    def test_prism_volume_is_area_times_height(self):
        rng = np.random.default_rng(7)
        for _ in range(50):
            n = int(rng.integers(3, 9))
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(1.0, 5.0)
            ring = np.column_stack([np.cos(ang), np.sin(ang)]) * rad
            z0, z1 = sorted(rng.uniform(-3, 3, 2))
            if z1 - z0 < 1e-3:
                continue
            s = solid_from_prism(ring, z0, z1)
            x, y = ring[:, 0], ring[:, 1]
            area = 0.5 * abs(np.dot(x, np.roll(y, -1))
                             - np.dot(np.roll(x, -1), y))
            got = faces_volume(solid_faces_geometry(s))
            assert got == pytest.approx(area * (z1 - z0), rel=1e-6)

    def test_prism_intersection_invariant(self):
        """Convex-prism pairs: vol(P∩Q) + vol(P\\Q) == vol(P)."""
        rng = np.random.default_rng(11)
        for _ in range(40):
            def prism():
                n = int(rng.integers(3, 7))
                ang = np.sort(rng.uniform(0, 2 * np.pi, n))
                c = rng.uniform(-2, 2, 2)
                ring = (np.column_stack([np.cos(ang), np.sin(ang)])
                        * rng.uniform(1, 3) + c)
                z0, z1 = sorted(rng.uniform(-2, 2, 2))
                return solid_from_prism(ring, z0, z1 + 0.5)
            p, q = prism(), prism()
            vp = faces_volume(solid_faces_geometry(p))
            vi = faces_volume(solid_faces_geometry(intersect_solids(p, q)))
            vd = faces_volume(difference_faces(p, q))
            assert vi + vd == pytest.approx(vp, rel=1e-6, abs=1e-8)

    def test_empty_intersection(self):
        p = solid_from_box(0, 0, 0, 1, 1, 1)
        q = solid_from_box(5, 5, 5, 6, 6, 6)
        inter = intersect_solids(p, q)
        assert inter.is_empty()
        g = solid_faces_geometry(inter)
        assert faces_volume(g) == 0.0
        # difference of disjoint solids keeps all of P
        assert faces_volume(difference_faces(p, q)) == \
            pytest.approx(1.0, rel=1e-9)

    def test_faces_roundtrip(self):
        """MULTIPOLYGON Z faces → half-spaces → identical volume."""
        s = solid_from_box(-2, -1, 0, 3, 4, 5)
        g = solid_faces_geometry(s)
        s2 = solid_from_faces(g)
        assert faces_volume(solid_faces_geometry(s2)) == \
            pytest.approx(_box_vol((-2, -1, 0, 3, 4, 5)), rel=1e-9)


class TestSolidOps:
    def _rect_wkb(self, x0, y0, x1, y1):
        from geoflow.geom import Geometry, to_wkb
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1],
                         [x0, y0]], dtype=np.float64)
        return to_wkb(Geometry(3, rings=[ring]))

    def test_extrude_intersect_volume_chain(self):
        from geoflow.ops.registry import get_op
        a = pa.array([self._rect_wkb(0, 0, 4, 3)], type=pa.binary())
        b = pa.array([self._rect_wkb(2, 1, 6, 5)], type=pa.binary())
        sa = get_op("st_extrude").fn(a, 0.0, 2.0)
        sb = get_op("st_extrude").fn(b, 1.0, 3.0)
        inter = get_op("st_intersection3d").fn(sa, sb)
        vol = get_op("st_volume").fn(inter).to_pylist()
        # overlap rect 2..4 x 1..3 (area 4), z overlap 1..2 → 4
        assert vol[0] == pytest.approx(4.0, rel=1e-9)
        diff = get_op("st_difference3d").fn(sa, sb)
        dvol = get_op("st_volume").fn(diff).to_pylist()
        assert dvol[0] == pytest.approx(4 * 3 * 2 - 4.0, rel=1e-9)

    def test_null_propagation(self):
        from geoflow.ops.registry import get_op
        a = pa.array([None], type=pa.binary())
        assert get_op("st_volume").fn(a).to_pylist() == [None]


class TestPrismFastPath:
    def test_fast_equals_general(self):
        """prism_faces_geometry == enumeration path: same volume and
        same face vertex sets on random convex rings."""
        from geoflow.geom.solid3d import prism_faces_geometry

        def face_keys(g):
            keys = set()
            for f in g.parts:
                r = np.asarray(f.rings[0])[:-1]
                keys.add(tuple(sorted(map(tuple, np.round(r, 9)))))
            return keys

        rng = np.random.default_rng(21)
        for _ in range(30):
            n = int(rng.integers(3, 8))
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            ring = np.column_stack([np.cos(ang), np.sin(ang)]) \
                * rng.uniform(1, 4)
            z0, z1 = sorted(rng.uniform(-2, 2, 2))
            z1 += 0.5
            fast = prism_faces_geometry(ring, z0, z1)
            gen = solid_faces_geometry(solid_from_prism(ring, z0, z1))
            assert faces_volume(fast) == pytest.approx(
                faces_volume(gen), rel=1e-9)
            assert face_keys(fast) == face_keys(gen)


class TestBoxFastPath:
    """Axis-aligned fast path (ops dispatch) vs the general
    enumeration path: identical volumes on random integer boxes,
    including containment and face-touching cases."""

    def test_fast_equals_general_volumes(self):
        from geoflow.geom.solid3d import (axis_box_bounds,
                                          box_difference_geometry,
                                          box_intersection_geometry)
        rng = np.random.default_rng(31)
        for _ in range(150):
            av = np.sort(rng.integers(-5, 6, size=(3, 2)), axis=1)
            bv = np.sort(rng.integers(-5, 6, size=(3, 2)), axis=1)
            a = (av[0, 0], av[1, 0], av[2, 0],
                 av[0, 1] + 1, av[1, 1] + 1, av[2, 1] + 1)
            b = (bv[0, 0], bv[1, 0], bv[2, 0],
                 bv[0, 1] + 1, bv[1, 1] + 1, bv[2, 1] + 1)
            p, q = solid_from_box(*a), solid_from_box(*b)
            assert axis_box_bounds(p) == pytest.approx(a)
            fast_i = faces_volume(box_intersection_geometry(
                np.asarray(a, float), np.asarray(b, float)))
            gen_i = faces_volume(solid_faces_geometry(
                intersect_solids(p, q)))
            assert fast_i == pytest.approx(gen_i, abs=1e-7)
            fast_d = faces_volume(box_difference_geometry(
                np.asarray(a, float), np.asarray(b, float)))
            gen_d = faces_volume(difference_faces(p, q))
            assert fast_d == pytest.approx(gen_d, abs=1e-7)

    def test_containment(self):
        from geoflow.geom.solid3d import box_difference_geometry
        # Q swallows P entirely -> empty difference
        a = np.asarray((0, 0, 0, 2, 2, 2), float)
        b = np.asarray((-1, -1, -1, 3, 3, 3), float)
        assert faces_volume(box_difference_geometry(a, b)) == 0.0
        # outer minus inner -> hollow shell, volume 4^3 - 2^3
        assert faces_volume(box_difference_geometry(b, a)) == \
            pytest.approx(4 ** 3 - 2 ** 3, rel=1e-9)

    def test_non_axis_pair_uses_general(self):
        """A rotated prism falls back to the enumeration path through
        the ops (smoke: correct intersection volume)."""
        from geoflow.geom import Geometry, to_wkb
        from geoflow.ops.registry import get_op
        c, s = np.cos(0.3), np.sin(0.3)
        sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
        rot = sq @ np.array([[c, s], [-s, c]])
        a = pa.array([to_wkb(Geometry(3, rings=[rot]))], pa.binary())
        sa = get_op("st_extrude").fn(a, 0.0, 1.0)
        inter = get_op("st_intersection3d").fn(sa, sa)
        vol = get_op("st_volume").fn(inter).to_pylist()[0]
        assert vol == pytest.approx(4.0, rel=1e-6)


def test_faces_volume_many_matches_scalar():
    from geoflow.geom.solid3d import faces_volume_many
    rng = np.random.default_rng(41)
    geoms = [None]
    for _ in range(25):
        n = int(rng.integers(3, 7))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        ring = np.column_stack([np.cos(ang), np.sin(ang)]) \
            * rng.uniform(1, 3)
        z0, z1 = sorted(rng.uniform(-2, 2, 2))
        p = solid_from_prism(ring, z0, z1 + 0.5)
        q = solid_from_box(*np.sort(rng.integers(-3, 4, (3, 2)),
                                    axis=1).T.ravel())
        geoms.append(solid_faces_geometry(p))
        geoms.append(difference_faces(p, q))
    many = faces_volume_many(geoms)
    assert many[0] is None
    for g, v in zip(geoms[1:], many[1:]):
        assert v == pytest.approx(faces_volume(g), rel=1e-12, abs=1e-12)
