"""EPSGToWKT / SRIDToWKT (reference stubs — geometry/srid/EPSGToWKT
.java:8, SRIDToWKT.java:10): WKT1 emission consistency with the
embedded projection set."""

import re

import pyarrow as pa
import pytest

from geoflow.geom import crs
from geoflow.geom.crswkt import epsg_to_wkt, supported_wkt_codes
from geoflow.ops.registry import get_op

WGS84_WKT = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
             '6378137,298.257223563,AUTHORITY["EPSG","7030"]]],'
             'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
             'AUTHORITY["EPSG","4326"]]')


def test_wgs84_golden():
    assert epsg_to_wkt(4326) == WGS84_WKT


def test_osgb_golden_params():
    w = epsg_to_wkt(27700)
    assert w.startswith('PROJCS["OSGB36 / British National Grid"')
    assert 'PROJECTION["Transverse_Mercator"]' in w
    assert 'PARAMETER["latitude_of_origin",49]' in w
    assert 'PARAMETER["central_meridian",-2]' in w
    assert 'PARAMETER["scale_factor",0.9996012717]' in w
    assert 'PARAMETER["false_easting",400000]' in w
    assert 'PARAMETER["false_northing",-100000]' in w
    assert 'TOWGS84[-446.448,125.157,-542.06' in w
    assert w.endswith('AUTHORITY["EPSG","27700"]]')


def test_utm_zone_formula():
    w = epsg_to_wkt(32633)   # UTM 33N: lon0 = 15
    assert 'PARAMETER["central_meridian",15]' in w
    assert 'PARAMETER["false_northing",0]' in w
    s = epsg_to_wkt(32733)
    assert 'PARAMETER["false_northing",10000000]' in s


def test_every_code_resolves_and_balances():
    codes = supported_wkt_codes()
    assert len(codes) > 250
    from geoflow.geom.crswkt import _GEOGRAPHIC_ALIASES
    for c in codes:
        w = epsg_to_wkt(c)
        assert w.count("[") == w.count("]"), c
        if c not in _GEOGRAPHIC_ALIASES:
            assert w.endswith(f'"{c}"]]'), c
        # alias codes (e.g. 4170 SIRGAS95) emit their datum-equivalent
        # canonical geographic CRS — the factory treats them as one
        # the WKT must describe a CRS st_transform can actually reach
        crs.get_transformer(4326, c)


def test_authority_matches_code():
    for c in (3857, 2154, 5514, 2056, 28992, 3577):
        w = epsg_to_wkt(c)
        m = re.findall(r'AUTHORITY\["EPSG","(\d+)"\]\]$', w)
        assert m and int(m[0]) == c


def test_unsupported_raises_with_description():
    with pytest.raises(ValueError, match="embedded table"):
        epsg_to_wkt(31370)   # Belgian Lambert — not in the set


def test_ops_null_for_unsupported():
    out = get_op("st_epsgtowkt").fn(
        pa.array([4326, 31370, None], type=pa.int32()))
    vals = out.to_pylist()
    assert vals[0] == WGS84_WKT and vals[1] is None and vals[2] is None


def test_sridtowkt_uri():
    out = get_op("st_sridtowkt").fn(pa.array(
        ["<http://www.opengis.net/def/crs/EPSG/0/4326>"],
        type=pa.string()))
    assert out[0].as_py() == WGS84_WKT
