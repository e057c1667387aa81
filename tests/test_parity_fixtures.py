"""Golden-value parity with the reference's JUnit tests (FIXTURES.md §3;
exact assertEquals semantics — DistanceTest.java etc.)."""

import math

import pyarrow as pa
import pytest

from geoflow.geom import from_wkt, to_wkb
from geoflow.geom import algorithms as alg
from geoflow.geom.greatcircle import geom_distance_sphere
from geoflow.ops import get_op

A_LINE = "LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)"
B_LINE = "LINESTRING(5 5 ,10 10)"


def _wkb_col(*wkts):
    return pa.array([to_wkb(from_wkt(w)) for w in wkts], type=pa.binary())


def test_distance_self_zero():
    # DistanceTest.java:22-29
    assert alg.distance(from_wkt(A_LINE), from_wkt(A_LINE)) == 0.0


def test_distance_planar_golden():
    # DistanceTest.java:36
    assert alg.distance(from_wkt(A_LINE), from_wkt(B_LINE)) == 69.9400386045075


def test_distance_sphere_golden():
    # DistanceSphereTest.java:36 — great-circle over nearest coordinate pair
    assert geom_distance_sphere(from_wkt(A_LINE), from_wkt(B_LINE)) \
        == 7269372.186370237


def test_area_golden():
    # AreaTest.java:32
    p = from_wkt("POLYGON((743238 2967416,743238 2967450,743265 2967450,"
                 "743265.625 2967416,743238 2967416))")
    assert alg.area(p) == 928.625


def test_circularity_golden():
    # CircularityIndexTest.java:21
    col = _wkb_col("POLYGON((8 2, 11 13, 2 6, 8 2))")
    assert get_op("st_circularity").fn(col).to_pylist() == [0.5440126910331675]


def test_circularity_degenerate():
    # CircularityIndexTest.java:31 — zero-area polygon → 0.0
    col = _wkb_col("POLYGON((1 2, 3 4, 5 6, 1 2))")
    assert get_op("st_circularity").fn(col).to_pylist() == [0.0]


def test_reverse_golden():
    # ReverseTest.java:18-29
    col = _wkb_col("LINESTRING(1 2,1 10)")
    out = get_op("st_astext").fn(get_op("st_reverse").fn(col)).to_pylist()
    assert out == ["LINESTRING (1 10, 1 2)"]


def test_foot_to_meter_golden():
    # FootToMeterTest.java:16
    out = get_op("foot_to_meter").fn(pa.array([1.0])).to_pylist()
    assert out == [0.30480370641307]


def test_all_unit_factors_invertible():
    # X_to_meter(meter_to_X(v)) ≈ v for every paired conversion
    pairs = [("meter_to_foot", "foot_to_meter"),
             ("meter_to_yard", "yard_to_meter"),
             ("meter_to_mile", "mile_to_meter"),
             ("meter_to_inch", "inch_to_meter"),
             ("meter_to_chain", "chain_to_meter"),
             ("meter_to_fathom", "fathom_to_meter"),
             ("meter_to_link", "link_to_meter"),
             ("meter_to_nauticalmile", "nauticalmile_to_meter"),
             ("meter_to_usfoot", "usfoot_to_meter"),
             ("meter_to_usmile", "usmile_to_meter"),
             ("meter_to_usyard", "usyard_to_meter"),
             ("meter_to_kilometer", "kilometer_to_meter"),
             ("meter_to_centimeter", "centimeter_to_meter"),
             ("meter_to_decimeter", "decimeter_to_meter"),
             ("meter_to_millimeter", "millimeter_to_meter")]
    v = pa.array([123.456])
    for fwd, back in pairs:
        out = get_op(back).fn(get_op(fwd).fn(v)).to_pylist()[0]
        assert out == pytest.approx(123.456, rel=1e-12), (fwd, back)


def test_azimuth():
    # due north = 0, due east = pi/2 (Azimuth.java:33 / PostGIS)
    a = _wkb_col("POINT(0 0)")
    b = _wkb_col("POINT(0 1)")
    assert get_op("st_azimuth").fn(a, b).to_pylist() == [0.0]
    e = _wkb_col("POINT(1 0)")
    assert get_op("st_azimuth").fn(a, e).to_pylist()[0] == pytest.approx(math.pi / 2)


def test_compactness_circle_is_one():
    # near-circle polygon → compactness ≈ 1, circularity ≈ 1
    import numpy as np
    ang = np.linspace(0, 2 * math.pi, 721)
    ring = ", ".join(f"{math.cos(t)!r} {math.sin(t)!r}" for t in ang)
    col = _wkb_col(f"POLYGON(({ring}))")
    assert get_op("st_circularity").fn(col).to_pylist()[0] == pytest.approx(1.0, abs=1e-4)
    assert get_op("st_compactnessratio").fn(col).to_pylist()[0] == pytest.approx(1.0, abs=1e-4)


def test_hausdorff_maxdist():
    a = from_wkt("LINESTRING(0 0, 10 0)")
    b = from_wkt("LINESTRING(0 3, 10 3)")
    assert alg.hausdorff_distance(a, b) == 3.0
    assert alg.max_distance(a, b) == math.hypot(10, 3)


def test_centroid_polygon():
    g = from_wkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert alg.centroid(g) == (1.0, 1.0)


def test_length_perimeter_golden():
    # LengthTest.java / PerimeterTest.java: 122.63074400009504
    line = from_wkt("LINESTRING(743238 2967416,743238 2967450,"
                    "743265 2967450, 743265.625 2967416,743238 2967416)")
    assert alg.length(line) == 122.63074400009504
    poly = from_wkt("POLYGON((743238 2967416,743238 2967450,"
                    "743265 2967450, 743265.625 2967416,743238 2967416))")
    assert alg.perimeter(poly) == 122.63074400009504


def test_centroid_golden():
    # CentroidTest.java: POINT(0.8331201364460079 0.33322680311267455)
    g = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))")
    cx, cy = alg.centroid(g)
    assert cx == pytest.approx(0.8331201364460079, rel=1e-14)
    assert cy == pytest.approx(0.33322680311267455, rel=1e-14)


def test_minimum_bounding_radius_golden():
    # MinimumBoundingRadiusTest.java: 247.4360455914027
    g = from_wkt("POLYGON((26426 65078,26531 65242,26075 65136,"
                 "26096 65427,26426 65078))")
    _, _, r = alg.minimum_bounding_circle(g)
    assert r == pytest.approx(247.4360455914027, rel=1e-12)


def test_minimum_clearance_golden():
    # MinimumClearanceTest.java: 0.00032
    g = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))")
    v, _ = alg.minimum_clearance(g)
    assert v == pytest.approx(0.00032, rel=1e-12)


def test_hausdorff_golden():
    # HausdorffDistanceTest.java: line vs multipoint → 1.0
    a = from_wkt("LINESTRING (0 0, 2 0)")
    b = from_wkt("MULTIPOINT ((0 1), (1 0), (2 1))")
    assert alg.hausdorff_distance(a, b) == 1.0


def test_maxdistance_golden():
    # MaxDistanceTest.java: 76.37541489249011
    a = from_wkt(A_LINE)
    b = from_wkt(B_LINE)
    assert alg.max_distance(a, b) == 76.37541489249011


def test_envelope_and_boundingdiagonal():
    col = _wkb_col("LINESTRING(1 2, 5 8)")
    env = get_op("st_astext").fn(get_op("st_envelope").fn(col)).to_pylist()[0]
    assert env == "POLYGON ((1 2, 5 2, 5 8, 1 8, 1 2))"


def test_minimum_bounding_circle():
    g = from_wkt("MULTIPOINT((0 0),(2 0),(1 1))")
    cx, cy, r = alg.minimum_bounding_circle(g)
    assert (cx, cy) == pytest.approx((1.0, 0.0)) and r == pytest.approx(1.0)
