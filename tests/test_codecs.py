"""WKT/WKB codec tests (reference datatype semantics: optional <srsURI>
prefix, default CRS84 — WKBDatatype.java:17-31)."""

import numpy as np
import pytest

from geoflow.geom import (from_wkb, from_wkt, points_to_wkb, to_wkb, to_wkt,
                          wkb_to_points)

ROUNDTRIP = [
    "POINT (1.5 2.5)",
    "POINT Z (1 2 3)",
    "POINT ZM (1 2 3 4)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 2))",
    "MULTIPOINT ((1 1), (2 2))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))",
    "POINT EMPTY",
    "POLYGON EMPTY",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", ROUNDTRIP)
def test_wkt_roundtrip(wkt):
    assert to_wkt(from_wkt(wkt)) == wkt


@pytest.mark.parametrize("wkt", ROUNDTRIP)
def test_wkb_roundtrip(wkt):
    g = from_wkt(wkt)
    g2 = from_wkb(to_wkb(g))
    assert to_wkt(g2) == to_wkt(g)


def test_srs_prefix():
    g = from_wkt("<http://www.opengis.net/def/crs/EPSG/0/25832> POINT (500000 5400000)")
    assert g.srid == 25832
    g2 = from_wkt("<http://www.opengis.net/def/crs/OGC/1.3/CRS84> POINT (1 2)")
    assert g2.srid == 4326
    assert from_wkt("POINT (1 2)").srid == 4326  # default CRS84


def test_scientific_notation_and_negatives():
    g = from_wkt("POINT (-1.5e2 2.5E-1)")
    assert g.coords[0] == -150.0 and g.coords[1] == 0.25


def test_point_fastpath_roundtrip():
    x = np.array([1.0, -77.5, 180.0])
    y = np.array([2.0, 29.25, -85.0])
    bufs = points_to_wkb(x, y)
    x2, y2 = wkb_to_points(bufs)
    assert np.array_equal(x, x2) and np.array_equal(y, y2)
    # fast-path bufs parse identically through the generic reader
    for i, b in enumerate(bufs):
        g = from_wkb(b)
        assert g.coords[0] == x[i] and g.coords[1] == y[i]


def test_fastpath_rejects_non_points():
    bufs = [to_wkb(from_wkt("LINESTRING (0 0, 1 1)"))]
    assert wkb_to_points(bufs) is None


def test_ewkb_z_flag():
    # EWKB Z flag (0x80000000) must parse like ISO +1000
    import struct
    iso = to_wkb(from_wkt("POINT Z (1 2 3)"))
    raw = bytearray(iso)
    raw[1:5] = struct.pack("<I", 1 | 0x80000000)
    g = from_wkb(bytes(raw))
    assert g.has_z and list(g.coords) == [1.0, 2.0, 3.0]


def test_twkb_spec_vector_and_roundtrip():
    from geoflow.geom.twkb import from_twkb, to_twkb
    # published TWKB spec example
    assert to_twkb(from_wkt("POINT(1 2)"), precision=0).hex() == "01000204"
    for w in ROUNDTRIP:
        g = from_wkt(w)
        if g.has_z or g.has_m:
            continue  # TWKB impl is 2D
        try:
            g2 = from_twkb(to_twkb(g, 7))
        except (ValueError, IndexError):
            continue
        assert to_wkt(g2) == to_wkt(g)


def test_repr_float_exact_roundtrip():
    # repr-formatted coordinates survive WKT parse exactly (corpus invariant)
    rng = np.random.default_rng(3)
    for _ in range(50):
        x, y = rng.uniform(-180, 180), rng.uniform(-85, 85)
        g = from_wkt(f"POINT({x!r} {y!r})")
        assert g.coords[0] == x and g.coords[1] == y
