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


# ---- round-3 widened EPSG table (embedded parameters) -----------------

_HELMERT_CODES = {27700, 2100, 31466, 31467, 31468, 31469,
                  23028, 23031, 23038, 28404, 28410, 28432,
                  28992, 21781, 2056, 5514}


def test_epsg_table_false_origin_exactness():
    """Projection origin of each newly-tabled CRS maps exactly to its
    false easting/northing (EPSG registry definitions)."""
    import numpy as np
    from geoflow.geom.projections import projection_for_epsg
    checks = [
        (2180, (19.0, 0.0), (500000.0, -5300000.0)),
        (2177, (18.0, 0.0), (6500000.0, 0.0)),
        (2193, (173.0, 0.0), (1600000.0, 10000000.0)),
        (3414, (103 + 50 / 60, 1 + 22 / 60), (28001.642, 38744.572)),
        (5179, (127.5, 38.0), (1000000.0, 2000000.0)),
        (5186, (127.0, 38.0), (200000.0, 600000.0)),
        (3006, (15.0, 0.0), (500000.0, 0.0)),
        (3067, (27.0, 0.0), (500000.0, 0.0)),
        (2451, (139 + 5 / 6, 36.0), (0.0, 0.0)),       # Japan plane IX
        (28355, (147.0, 0.0), (500000.0, 10000000.0)),  # MGA zone 55
        (7850, (117.0, 0.0), (500000.0, 10000000.0)),   # GDA2020 MGA 50
        (31982, (-51.0, 0.0), (500000.0, 10000000.0)),  # SIRGAS UTM 22S
        (3395, (0.0, 0.0), (0.0, 0.0)),
        (3577, (132.0, 0.0), (0.0, 0.0)),
        (3112, (134.0, 0.0), (0.0, 0.0)),
    ]
    for code, (lo, la), exp in checks:
        p = projection_for_epsg(code)
        x, y = p.forward(np.array([lo]), np.array([la]))
        assert abs(x[0] - exp[0]) < 1e-6, (code, x[0], exp[0])
        assert abs(y[0] - exp[1]) < 1e-6, (code, y[0], exp[1])


def test_tm_general_matches_hardcoded_utm():
    """6th-order TMGeneral == the 3rd-order hardcoded WGS84 UTM path
    within the latter's documented truncation (< 0.1 mm)."""
    import numpy as np
    from geoflow.geom.crs import lonlat_to_utm
    from geoflow.geom.projections import TMGeneral, WGS84
    rng = np.random.default_rng(1)
    for epsg, lon0 in ((32632, 9.0), (32755, 147.0)):
        tm = TMGeneral(0.0, lon0, 0.9996, 500000.0,
                       10000000.0 if epsg > 32700 else 0.0, WGS84)
        lon = rng.uniform(lon0 - 3, lon0 + 3, 1000)
        lat = rng.uniform(-80, 84, 1000)
        e1, n1 = lonlat_to_utm(lon, lat, epsg)
        e2, n2 = tm.forward(lon, lat)
        assert np.abs(e1 - e2).max() < 1e-4
        assert np.abs(n1 - n2).max() < 1e-4


def test_epsg_table_roundtrips():
    """forward∘inverse identity for the widened set: < 1e-8 deg for
    grid-free codes; < 2e-6 deg (≈0.2 m) for Helmert datum-shifted codes
    (2D height-dropping asymmetry, inherent to single-set 7-param
    shifts; the datum accuracy itself is the documented 1-10 m)."""
    import math

    import numpy as np
    from geoflow.geom.crs import get_transformer
    from geoflow.geom.projections import TMGeneral, projection_for_epsg
    rng = np.random.default_rng(7)
    codes = [3395, 27700, 2180, 2177, 3006, 3067, 3034, 2100, 31467,
             23031, 2193, 3414, 5179, 5186, 2448, 28352, 7850, 3577,
             3112, 31970, 31980, 28410, 32661, 32761, 4258, 4283,
             28992, 21781, 2056, 5514]
    for code in codes:
        fwd = get_transformer(4326, code)
        inv = get_transformer(code, 4326)
        p = projection_for_epsg(code)
        inner = getattr(p, "proj", p)
        lon0 = getattr(inner, "lon0", 0.0)
        if not isinstance(inner, TMGeneral) and abs(lon0) <= math.pi:
            lon0 = math.degrees(lon0)
        lat_rng = {32661: (60, 89), 32761: (-89, -60),
                   28352: (-45, -10), 7850: (-45, -10),
                   3577: (-45, -10), 3112: (-45, -10),
                   31970: (-30, 10), 31980: (-30, 10),
                   28992: (50, 54), 21781: (45, 48.5),
                   2056: (45, 48.5), 5514: (47.5, 51.5)}.get(code,
                                                             (-75, 75))
        lon_rng = {28992: (3, 8), 21781: (5.5, 11), 2056: (5.5, 11),
                   5514: (12, 19)}.get(code, (lon0 - 8, lon0 + 8))
        lon = rng.uniform(*lon_rng, 300)
        lat = rng.uniform(*lat_rng, 300)
        x, y = fwd(lon, lat)
        lo2, la2 = inv(x, y)
        dlon = np.abs((lo2 - lon + 180.0) % 360.0 - 180.0)
        err = max(dlon.max(), np.abs(la2 - lat).max())
        tol = 2e-6 if code in _HELMERT_CODES else 1e-8
        assert err < tol, (code, err)


def test_osgb_datum_shift_magnitude():
    """OSGB36 Helmert engages: London shifts 50-200 m vs the no-datum
    projection core, and the BNG coordinates land in the right km."""
    import numpy as np
    from geoflow.geom.projections import (AIRY1830, TMGeneral,
                                          projection_for_epsg)
    p = projection_for_epsg(27700)
    core = TMGeneral(49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
                     AIRY1830)
    x1, y1 = p.forward(np.array([-0.1276]), np.array([51.5072]))
    x0, y0 = core.forward(np.array([-0.1276]), np.array([51.5072]))
    shift = float(np.hypot(x1[0] - x0[0], y1[0] - y0[0]))
    assert 50 < shift < 200
    # Trafalgar Square vicinity: E ~530100, N ~180400 (±300 m datum tol)
    assert abs(x1[0] - 530100) < 400 and abs(y1[0] - 180400) < 400


def test_unsupported_epsg_error_names_set():
    import pytest
    from geoflow.geom.crs import get_transformer
    with pytest.raises(ValueError, match="supported EPSG set"):
        get_transformer(4326, 999999)


def test_oblique_stereo_rd_new_epsg_example():
    """EPSG Guidance Note 7-2 worked example for Oblique Stereographic
    (Amersfoort / RD New): 53°N 6°E (datum coords) → E 196105.283,
    N 557057.739; projection origin → exactly (FE, FN)."""
    import numpy as np
    from geoflow.geom.projections import BESSEL1841, ObliqueStereo
    p = ObliqueStereo(52 + 9 / 60 + 22.178 / 3600,
                      5 + 23 / 60 + 15.5 / 3600,
                      0.9999079, 155000.0, 463000.0, BESSEL1841)
    e, n = p.forward(np.array([6.0]), np.array([53.0]))
    assert abs(e[0] - 196105.283) < 1e-3
    assert abs(n[0] - 557057.739) < 1e-3
    e0, n0 = p.forward(np.array([5 + 23 / 60 + 15.5 / 3600]),
                       np.array([52 + 9 / 60 + 22.178 / 3600]))
    assert abs(e0[0] - 155000.0) < 1e-6 and abs(n0[0] - 463000.0) < 1e-6


def test_krovak_epsg_example():
    """EPSG GN7-2 Krovak worked example (S-JTSK datum coords):
    50°12'32.4416\"N 16°50'59.1790\"E → southing 1050538.643, westing
    568991.00 → East-North E=-568991.00, N=-1050538.64."""
    import numpy as np
    from geoflow.geom.projections import Krovak
    p = Krovak()
    lat = 50 + 12 / 60 + 32.4416 / 3600
    lon = 16 + 50 / 60 + 59.1790 / 3600
    e, n = p.forward(np.array([lon]), np.array([lat]))
    assert abs(e[0] - (-568991.00)) < 0.01
    assert abs(n[0] - (-1050538.64)) < 0.01
    lo, la = p.inverse(e, n)
    assert abs(lo[0] - lon) < 1e-10 and abs(la[0] - lat) < 1e-10


def test_swiss_lv03_vs_swisstopo_approx_formulas():
    """Full EPSG:21781 path (Helmert + Rosenmund projection) against
    swisstopo's published approximate WGS84→LV03 polynomial formulas
    (accuracy ~1 m; our single-set Helmert adds 1-2 m): must agree
    within 3.5 m across Switzerland, and the projection origin must map
    to exactly (600000, 200000) in datum coordinates."""
    import numpy as np
    from geoflow.geom.projections import (BESSEL1841, SwissOblique,
                                          projection_for_epsg)
    core = SwissOblique(46 + 57 / 60 + 8.66 / 3600,
                        7 + 26 / 60 + 22.5 / 3600,
                        600000.0, 200000.0, BESSEL1841)
    e0, n0 = core.forward(np.array([7 + 26 / 60 + 22.5 / 3600]),
                          np.array([46 + 57 / 60 + 8.66 / 3600]))
    assert abs(e0[0] - 600000.0) < 1e-6 and abs(n0[0] - 200000.0) < 1e-6

    def approx_lv03(lon, lat):
        ys = (lon * 3600.0 - 26782.5) / 10000.0
        xs = (lat * 3600.0 - 169028.66) / 10000.0
        E = (600072.37 + 211455.93 * ys - 10938.51 * ys * xs
             - 0.36 * ys * xs ** 2 - 44.54 * ys ** 3)
        N = (200147.07 + 308807.95 * xs + 3745.25 * ys ** 2
             + 76.63 * xs ** 2 - 194.56 * ys ** 2 * xs
             + 119.79 * xs ** 3)
        return E, N

    p = projection_for_epsg(21781)
    pts = [(8.5417, 47.3769), (6.1432, 46.2044), (7.4474, 46.9480),
           (8.9511, 46.0037), (9.8355, 46.4908), (7.0, 46.0),
           (9.0, 47.5)]
    for lon, lat in pts:
        e, n = p.forward(np.array([lon]), np.array([lat]))
        ea, na = approx_lv03(lon, lat)
        assert abs(e[0] - ea) < 3.5, (lon, lat, e[0], ea)
        assert abs(n[0] - na) < 3.5, (lon, lat, n[0], na)
