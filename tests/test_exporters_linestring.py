"""Exporter/constructor/linestring/polygon op tests (golden vectors where
public ones exist)."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.geom import from_wkb, from_wkt, to_wkb, to_wkt
from geoflow.ops import get_op


def _col(*wkts):
    return pa.array([to_wkb(from_wkt(w)) for w in wkts], type=pa.binary())


def test_encoded_polyline_google_vector():
    # the published polyline-5 reference vector
    line = _col("LINESTRING(-120.2 38.5,-120.95 40.7,-126.453 43.252)")
    enc = get_op("st_asencodedpolyline").fn(line).to_pylist()[0]
    assert enc == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    dec = from_wkb(get_op("st_linefromencodedpolyline")
                   .fn(pa.array([enc])).to_pylist()[0])
    assert to_wkt(dec) == "LINESTRING (-120.2 38.5, -120.95 40.7, -126.453 43.252)"


def test_geohash_known_value():
    # geohash of central London starts with gcpv
    col = _col("POINT(-0.1275 51.5072)")
    gh = get_op("st_geohash").fn(col, 9).to_pylist()[0]
    assert gh.startswith("gcpv")
    back = from_wkb(get_op("st_pointfromgeohash")
                    .fn(pa.array([gh])).to_pylist()[0])
    assert back.coords[0] == pytest.approx(-0.1275, abs=1e-3)
    assert back.coords[1] == pytest.approx(51.5072, abs=1e-3)


def test_kml_gml_svg_gpx_shapes():
    col = _col("POINT(1 2)")
    assert "coordinates>1.0,2.0<" in get_op("st_askml").fn(col).to_pylist()[0]
    assert "gml:pos>1.0 2.0<" in get_op("st_asgml").fn(col).to_pylist()[0]
    assert 'lat="2.0"' in get_op("st_asgpx").fn(col).to_pylist()[0]
    line = _col("LINESTRING(0 0, 1 1)")
    assert get_op("st_assvg").fn(line).to_pylist()[0].startswith("M 0")
    assert get_op("st_asgeouri").fn(col).to_pylist()[0] == "geo:2.0,1.0"


def test_latlon_text():
    col = _col("POINT(-0.5 51.25)")
    s = get_op("st_aslatlontext").fn(col).to_pylist()[0]
    assert s.startswith("51°15'") and s.endswith("W")
    assert "N" in s


def test_dump():
    col = _col("MULTIPOINT((1 1),(2 2))")
    parts = get_op("st_dump").fn(col).to_pylist()[0]
    assert [to_wkt(from_wkb(p)) for p in parts] == ["POINT (1 1)", "POINT (2 2)"]
    pts = get_op("st_dumppoints").fn(_col("LINESTRING(0 0,1 1)")).to_pylist()[0]
    assert len(pts) == 2


def test_linemerge_and_ring_ops():
    col = _col("MULTILINESTRING((0 0,1 1),(1 1,2 2),(5 5,6 6))")
    merged = from_wkb(get_op("st_linemerge").fn(col).to_pylist()[0])
    assert merged.type == 5 and len(merged.parts) == 2
    ring = _col("LINESTRING(0 0,1 0,1 1,0 0)")
    assert get_op("st_isclosed").fn(ring).to_pylist() == [True]
    assert get_op("st_isring").fn(ring).to_pylist() == [True]
    assert get_op("st_isclosed").fn(_col("LINESTRING(0 0,1 1)")).to_pylist() == [False]
    poly = from_wkb(get_op("st_makepolygon").fn(ring).to_pylist()[0])
    assert poly.type == 3


def test_editors():
    line = _col("LINESTRING(0 0,2 2)")
    pt = _col("POINT(1 1)")
    added = from_wkb(get_op("st_addpoint").fn(line, pt, 1).to_pylist()[0])
    assert to_wkt(added) == "LINESTRING (0 0, 1 1, 2 2)"
    removed = from_wkb(get_op("st_removepoint").fn(
        pa.array([to_wkb(added)], type=pa.binary()), 1).to_pylist()[0])
    assert to_wkt(removed) == "LINESTRING (0 0, 2 2)"
    setp = from_wkb(get_op("st_setpoint").fn(line, _col("POINT(9 9)"), 0).to_pylist()[0])
    assert to_wkt(setp) == "LINESTRING (9 9, 2 2)"


def test_polygon_ring_attrs():
    p = _col("POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,3 2,3 3,2 3,2 2))")
    assert get_op("st_numinteriorrings").fn(p).to_pylist() == [1.0]
    assert get_op("st_nrings").fn(p).to_pylist() == [2.0]
    ring = from_wkb(get_op("st_interiorringn").fn(p, 1).to_pylist()[0])
    assert ring.type == 2 and len(ring.coords) == 5


def test_orientation_ops():
    ccw = _col("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    cw = _col("POLYGON((0 0,0 10,10 10,10 0,0 0))")
    assert get_op("st_ispolygonccw").fn(ccw).to_pylist() == [True]
    assert get_op("st_ispolygoncw").fn(cw).to_pylist() == [True]
    forced = from_wkb(get_op("st_forcepolygoncw").fn(ccw).to_pylist()[0])
    assert get_op("st_ispolygoncw").fn(
        pa.array([to_wkb(forced)], type=pa.binary())).to_pylist() == [True]


def test_triangles():
    right = _col("POLYGON((0 0,3 0,0 4,0 0))")
    equi = _col(f"POLYGON((0 0,1 0,0.5 {np.sqrt(3)/2!r},0 0))")
    assert get_op("st_istriangle").fn(right).to_pylist() == [True]
    assert get_op("st_isrighttriangle").fn(right).to_pylist() == [True]
    assert get_op("st_isequilateraltriangle").fn(equi).to_pylist() == [True]
    assert get_op("st_isisoscelestriangle").fn(equi).to_pylist() == [True]
    sq = _col("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    assert get_op("st_istriangle").fn(sq).to_pylist() == [False]


def test_angle_and_median():
    a = _col("POINT(1 0)")
    b = _col("POINT(0 0)")
    c = _col("POINT(0 1)")
    assert get_op("st_angle").fn(a, b, c).to_pylist()[0] == pytest.approx(np.pi / 2)
    mp = _col("MULTIPOINT((0 0),(2 0),(1 1))")
    med = from_wkb(get_op("st_geometricmedian").fn(mp).to_pylist()[0])
    assert 0 < med.coords[0] < 2 and 0 <= med.coords[1] < 1


def test_generatepoints_deterministic_inside():
    poly = _col("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    pts1 = get_op("st_generatepoints").fn(poly, 20, 7).to_pylist()[0]
    pts2 = get_op("st_generatepoints").fn(poly, 20, 7).to_pylist()[0]
    assert pts1 == pts2 and len(pts1) == 20
    for p in pts1:
        g = from_wkb(p)
        assert 0 <= g.coords[0] <= 10 and 0 <= g.coords[1] <= 10


def test_frechet():
    a = _col("LINESTRING(0 0,10 0)")
    b = _col("LINESTRING(0 1,10 1)")
    assert get_op("st_frechetdistance").fn(a, b).to_pylist() == [1.0]


def test_collectionextract_and_multi():
    gc = _col("GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(0 0,1 1),POLYGON((0 0,1 0,1 1,0 0)))")
    pts = from_wkb(get_op("st_collectionextract").fn(gc, 1).to_pylist()[0])
    assert pts.type == 1
    m = from_wkb(get_op("st_multi").fn(_col("POINT(1 1)")).to_pylist()[0])
    assert m.type == 4
