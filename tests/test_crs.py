"""CRS transform tests (Web Mercator closed form, Krüger UTM)."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.geom import Geometry, algorithms as alg, crs, from_wkb, from_wkt, to_wkb
from geoflow.ops import get_op


def test_webmercator_known():
    x, y = crs.lonlat_to_webmercator(np.array([0.0]), np.array([0.0]))
    assert (x[0], y[0]) == (0.0, 0.0)
    # antimeridian: x = pi * a
    x, _ = crs.lonlat_to_webmercator(np.array([180.0]), np.array([0.0]))
    assert x[0] == pytest.approx(np.pi * 6378137.0)


def test_webmercator_roundtrip():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-84, 84, 500)
    x, y = crs.lonlat_to_webmercator(lon, lat)
    lon2, lat2 = crs.webmercator_to_lonlat(x, y)
    assert np.abs(lon2 - lon).max() < 1e-11
    assert np.abs(lat2 - lat).max() < 1e-11


def test_utm_roundtrip_submm():
    rng = np.random.default_rng(6)
    # points within zone 33 (12..18E)
    lon = rng.uniform(12.5, 17.5, 300)
    lat = rng.uniform(-80, 80, 300)
    for epsg in (32633, 32733):
        e, n = crs.lonlat_to_utm(lon, lat, epsg)
        lon2, lat2 = crs.utm_to_lonlat(e, n, epsg)
        # degrees → meters at equator ~111km
        assert np.abs(lon2 - lon).max() * 111000 < 0.01
        assert np.abs(lat2 - lat).max() * 111000 < 0.01


def test_utm_central_meridian_easting():
    # point on the central meridian → easting exactly 500000
    e, n = crs.lonlat_to_utm(np.array([15.0]), np.array([45.0]), 32633)
    assert e[0] == pytest.approx(500000.0, abs=1e-6)
    # scale at central meridian = 0.9996: 1° of latitude ≈ 110947m * 0.9996
    e1, n1 = crs.lonlat_to_utm(np.array([15.0]), np.array([45.5]), 32633)
    dist = n1[0] - n[0]
    assert dist == pytest.approx(0.9996 * 111141.8 / 2, rel=1e-3)


def test_zone_pick():
    assert crs.utm_zone_epsg(2.35, 48.86) == 32631
    assert crs.utm_zone_epsg(151.2, -33.87) == 32756
    assert crs.utm_zone_epsg(-179.9, 10) == 32601
    assert crs.utm_zone_epsg(179.9, 10) == 32660


def test_transform_op_and_srid():
    col = pa.array([to_wkb(from_wkt("POINT(2.3522 48.8566)"))],
                   type=pa.binary())
    out = get_op("st_transform").fn(col, 3857)
    g = from_wkb(out[0].as_py())
    assert g.coords[0] == pytest.approx(261848.15, rel=1e-4)
    assert get_op("st_srid").fn(col).to_pylist() == [4326]
    assert get_op("st_utmzone").fn(col).to_pylist() == [32631]


def test_buffer_meters_area():
    g = Geometry.point(2.3522, 48.8566)
    b = crs.buffer_meters(g, 1000.0, quadsegs=16)
    # area back in UTM ≈ pi r^2 within projection + n-gon error
    utm_b = crs.transform_geom(b, 32631)
    assert alg.area(utm_b) == pytest.approx(np.pi * 1e6, rel=0.01)
    # buffer contains the original point
    assert alg.points_in_polygon(np.array([2.3522]),
                                 np.array([48.8566]), b)[0]


def test_srid_uri_ops():
    uris = pa.array(["http://www.opengis.net/def/crs/EPSG/0/25832",
                     "http://www.opengis.net/def/crs/OGC/1.3/CRS84"])
    assert get_op("srid_to_epsg").fn(uris).to_pylist() == [25832, 4326]
    back = get_op("epsg_to_srid").fn(pa.array([25832])).to_pylist()[0]
    assert back.endswith("EPSG/0/25832")


def test_widened_epsg_projections():
    """Lambert-93 / LAEA Europe / CONUS Albers / polar stereographic +
    ETRS89/NAD83 UTM — exact EPSG false-origin goldens and sub-mm
    round trips through get_transformer."""
    import numpy as np
    from geoflow.geom.crs import get_transformer
    # false origins are EXACT per the EPSG definitions
    fx = get_transformer(4326, 2154)
    x, y = fx(np.array([3.0]), np.array([46.5]))
    assert abs(x[0] - 700000.0) < 1e-6 and abs(y[0] - 6600000.0) < 1e-6
    fx = get_transformer(4326, 3035)
    x, y = fx(np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6
    fx = get_transformer(4326, 5070)
    x, y = fx(np.array([-96.0]), np.array([23.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    # round trips incl. cross-CRS routing through 4326
    rng = np.random.default_rng(2)
    for code, lo, hi, la0, la1 in [(2154, -5, 9, 41, 51),
                                   (3035, -10, 30, 35, 70),
                                   (5070, -120, -75, 25, 48),
                                   (3413, -180, 180, 60, 89),
                                   (3976, -180, 180, -89, -60),
                                   (25832, 6, 12, 40, 70),
                                   (26910, -126, -120, 30, 55)]:
        lons = rng.uniform(lo, hi, 200)
        lats = rng.uniform(la0, la1, 200)
        X, Y = get_transformer(4326, code)(lons, lats)
        lo2, la2 = get_transformer(code, 4326)(X, Y)
        dl = (np.abs(lo2 - lons) + 180) % 360 - 180
        assert max(np.abs(dl).max(), np.abs(la2 - lats).max()) < 1e-7
    # chained: Lambert-93 → LAEA directly
    X, Y = get_transformer(4326, 2154)(np.array([2.35]), np.array([48.85]))
    U, V = get_transformer(2154, 3035)(X, Y)
    lo3, la3 = get_transformer(3035, 4326)(U, V)
    assert abs(lo3[0] - 2.35) < 1e-7 and abs(la3[0] - 48.85) < 1e-7
    # unknown CRS still raises cleanly
    import pytest
    with pytest.raises(ValueError):
        get_transformer(9999, 4326)
