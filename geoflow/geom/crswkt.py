"""OGC WKT1 emission for the engine's embedded EPSG set.

geometry/srid/EPSGToWKT.java:8 and SRIDToWKT.java:10 are *stubs* in the
reference (SURVEY.md Appendix A); semantics follow the public OGC
WKT1 / EPSG registry conventions. The table below is DECLARATIVE: one
entry per supported projected/geographic CRS carrying the defining
parameters (the projection objects in projections.py store derived
constants only, so WKT is emitted from this table, and a consistency
test asserts every tabled code is resolvable by projection_for_epsg —
tests/test_crswkt.py).

Datum-shift note: TOWGS84 values are the engine's single-set Helmert
parameters (projections.py _H_* — published values, 1-10 m class), so
the WKT describes exactly what st_transform computes.
"""

from __future__ import annotations

__all__ = ["epsg_to_wkt", "supported_wkt_codes"]


def _num(v) -> str:
    # repr = shortest string that round-trips the double (PEP 3101)
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


_SPHEROIDS = {
    "WGS 84": (6378137.0, 298.257223563, "7030"),
    "GRS 1980": (6378137.0, 298.257222101, "7019"),
    "Airy 1830": (6377563.396, 299.3249646, "7001"),
    "Bessel 1841": (6377397.155, 299.1528128, "7004"),
    "International 1924": (6378388.0, 297.0, "7022"),
    "Krassowsky 1940": (6378245.0, 298.3, "7024"),
}

# geogcs key -> (display name, datum name, spheroid key, towgs84|None,
#                EPSG code of the geographic CRS)
_GEOGCS = {
    "WGS84": ("WGS 84", "WGS_1984", "WGS 84", None, 4326),
    "ETRS89": ("ETRS89", "European_Terrestrial_Reference_System_1989",
               "GRS 1980", (0, 0, 0, 0, 0, 0, 0), 4258),
    "NAD83": ("NAD83", "North_American_Datum_1983", "GRS 1980",
              (0, 0, 0, 0, 0, 0, 0), 4269),
    "GDA94": ("GDA94", "Geocentric_Datum_of_Australia_1994", "GRS 1980",
              (0, 0, 0, 0, 0, 0, 0), 4283),
    "GDA2020": ("GDA2020", "Geocentric_Datum_of_Australia_2020",
                "GRS 1980", (0, 0, 0, 0, 0, 0, 0), 7844),
    "NZGD2000": ("NZGD2000", "New_Zealand_Geodetic_Datum_2000",
                 "GRS 1980", (0, 0, 0, 0, 0, 0, 0), 4167),
    "JGD2000": ("JGD2000", "Japanese_Geodetic_Datum_2000", "GRS 1980",
                (0, 0, 0, 0, 0, 0, 0), 4612),
    "Korea2000": ("Korea 2000", "Geocentric_datum_of_Korea", "GRS 1980",
                  (0, 0, 0, 0, 0, 0, 0), 4737),
    "SIRGAS2000": ("SIRGAS 2000",
                   "Sistema_de_Referencia_Geocentrico_para_las_"
                   "AmericaS_2000", "GRS 1980",
                   (0, 0, 0, 0, 0, 0, 0), 4674),
    "RGF93": ("RGF93", "Reseau_Geodesique_Francais_1993", "GRS 1980",
              (0, 0, 0, 0, 0, 0, 0), 4171),
    "OSGB36": ("OSGB 1936", "OSGB_1936", "Airy 1830",
               (-446.448, 125.157, -542.060, -0.1502, -0.2470, -0.8421,
                20.4894), 4277),
    "Amersfoort": ("Amersfoort", "Amersfoort", "Bessel 1841",
                   (565.417, 50.3319, 465.552, -0.398957, 0.343988,
                    -1.8774, 4.0725), 4289),
    "CH1903": ("CH1903", "CH1903", "Bessel 1841",
               (674.374, 15.056, 405.346, 0, 0, 0, 0), 4149),
    "CH1903+": ("CH1903+", "CH1903_Plus", "Bessel 1841",
                (674.374, 15.056, 405.346, 0, 0, 0, 0), 4150),
    "SJTSK": ("S-JTSK", "System_Jednotne_Trigonometricke_Site_Katastralni",
              "Bessel 1841",
              (570.8, 85.7, 462.8, 4.998, 1.587, 5.261, 3.56), 4156),
    "DHDN": ("DHDN", "Deutsches_Hauptdreiecksnetz", "Bessel 1841",
             (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7), 4314),
    "ED50": ("ED50", "European_Datum_1950", "International 1924",
             (-87.0, -98.0, -121.0, 0, 0, 0, 0), 4230),
    "Pulkovo42": ("Pulkovo 1942", "Pulkovo_1942", "Krassowsky 1940",
                  (28.0, -130.0, -95.0, 0, 0, 0, 0), 4284),
    "GGRS87": ("GGRS87", "Greek_Geodetic_Reference_System_1987",
               "GRS 1980", (-199.87, 74.79, 246.62, 0, 0, 0, 0), 4121),
    "CGCS2000": ("China Geodetic Coordinate System 2000",
                 "China_2000", "GRS 1980", (0, 0, 0, 0, 0, 0, 0), 4490),
}


def _geogcs_wkt(key: str) -> str:
    name, datum, sph_key, towgs84, geo_code = _GEOGCS[key]
    a, rf, sph_auth = _SPHEROIDS[sph_key]
    tw = ""
    if towgs84 is not None:
        tw = ",TOWGS84[" + ",".join(_num(v) for v in towgs84) + "]"
    return (f'GEOGCS["{name}",DATUM["{datum}",'
            f'SPHEROID["{sph_key}",{_num(a)},{_num(rf)},'
            f'AUTHORITY["EPSG","{sph_auth}"]]{tw}],'
            f'PRIMEM["Greenwich",0],'
            f'UNIT["degree",0.0174532925199433],'
            f'AUTHORITY["EPSG","{geo_code}"]]')


def _projcs(code, name, geogcs_key, method, params) -> str:
    pp = "".join(f',PARAMETER["{k}",{_num(v)}]' for k, v in params)
    return (f'PROJCS["{name}",{_geogcs_wkt(geogcs_key)},'
            f'PROJECTION["{method}"]{pp},'
            f'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
            f'AUTHORITY["EPSG","{code}"]]')


def _tm(lat0, lon0, k0, fe, fn):
    return ("Transverse_Mercator",
            [("latitude_of_origin", lat0), ("central_meridian", lon0),
             ("scale_factor", k0), ("false_easting", fe),
             ("false_northing", fn)])


# code -> (name, geogcs key, method, [(param, value), ...])
_META: dict = {}


def _add(code, name, geogcs, method_params):
    _META[code] = (name, geogcs, method_params[0], method_params[1])


def _build():
    # world
    _add(3857, "WGS 84 / Pseudo-Mercator", "WGS84",
         ("Mercator_1SP",
          [("central_meridian", 0), ("scale_factor", 1),
           ("false_easting", 0), ("false_northing", 0)]))
    _add(3395, "WGS 84 / World Mercator", "WGS84",
         ("Mercator_1SP",
          [("central_meridian", 0), ("scale_factor", 1),
           ("false_easting", 0), ("false_northing", 0)]))
    for z in range(1, 61):
        lon0 = z * 6 - 183
        _add(32600 + z, f"WGS 84 / UTM zone {z}N", "WGS84",
             _tm(0, lon0, 0.9996, 500000, 0))
        _add(32700 + z, f"WGS 84 / UTM zone {z}S", "WGS84",
             _tm(0, lon0, 0.9996, 500000, 10000000))
    _add(32661, "WGS 84 / UPS North (N,E)", "WGS84",
         ("Polar_Stereographic",
          [("latitude_of_origin", 90), ("central_meridian", 0),
           ("scale_factor", 0.994), ("false_easting", 2000000),
           ("false_northing", 2000000)]))
    _add(32761, "WGS 84 / UPS South (N,E)", "WGS84",
         ("Polar_Stereographic",
          [("latitude_of_origin", -90), ("central_meridian", 0),
           ("scale_factor", 0.994), ("false_easting", 2000000),
           ("false_northing", 2000000)]))
    _add(3413, "WGS 84 / NSIDC Sea Ice Polar Stereographic North",
         "WGS84", ("Polar_Stereographic",
                   [("latitude_of_origin", 70), ("central_meridian", -45),
                    ("scale_factor", 1), ("false_easting", 0),
                    ("false_northing", 0)]))
    _add(3976, "WGS 84 / NSIDC Sea Ice Polar Stereographic South",
         "WGS84", ("Polar_Stereographic",
                   [("latitude_of_origin", -70), ("central_meridian", 0),
                    ("scale_factor", 1), ("false_easting", 0),
                    ("false_northing", 0)]))
    # Europe
    for z in range(28, 39):
        _add(25800 + z, f"ETRS89 / UTM zone {z}N", "ETRS89",
             _tm(0, z * 6 - 183, 0.9996, 500000, 0))
    _add(27700, "OSGB36 / British National Grid", "OSGB36",
         _tm(49, -2, 0.9996012717, 400000, -100000))
    _add(2154, "RGF93 / Lambert-93", "RGF93",
         ("Lambert_Conformal_Conic_2SP",
          [("standard_parallel_1", 44), ("standard_parallel_2", 49),
           ("latitude_of_origin", 46.5), ("central_meridian", 3),
           ("false_easting", 700000), ("false_northing", 6600000)]))
    _add(3035, "ETRS89-extended / LAEA Europe", "ETRS89",
         ("Lambert_Azimuthal_Equal_Area",
          [("latitude_of_center", 52), ("longitude_of_center", 10),
           ("false_easting", 4321000), ("false_northing", 3210000)]))
    _add(3034, "ETRS89-extended / LCC Europe", "ETRS89",
         ("Lambert_Conformal_Conic_2SP",
          [("standard_parallel_1", 35), ("standard_parallel_2", 65),
           ("latitude_of_origin", 52), ("central_meridian", 10),
           ("false_easting", 4000000), ("false_northing", 2800000)]))
    _add(2180, "ETRS89 / Poland CS92", "ETRS89",
         _tm(0, 19, 0.9993, 500000, -5300000))
    for z in range(5, 9):
        _add(2176 + z - 5, f"ETRS89 / Poland CS2000 zone {z}", "ETRS89",
             _tm(0, z * 3, 0.999923, z * 1e6 + 500000, 0))
    _add(3006, "SWEREF99 TM", "ETRS89", _tm(0, 15, 0.9996, 500000, 0))
    _add(3067, "ETRS89 / TM35FIN(E,N)", "ETRS89",
         _tm(0, 27, 0.9996, 500000, 0))
    _add(2100, "GGRS87 / Greek Grid", "GGRS87",
         _tm(0, 24, 0.9996, 500000, 0))
    _add(28992, "Amersfoort / RD New", "Amersfoort",
         ("Oblique_Stereographic",
          [("latitude_of_origin", 52.15616055555555),
           ("central_meridian", 5.38763888888889),
           ("scale_factor", 0.9999079), ("false_easting", 155000),
           ("false_northing", 463000)]))
    for code, fe, fn, nm, geo in ((21781, 600000, 200000,
                                   "CH1903 / LV03", "CH1903"),
                                  (2056, 2600000, 1200000,
                                   "CH1903+ / LV95", "CH1903+")):
        _add(code, nm, geo,
             ("Hotine_Oblique_Mercator_Azimuth_Center",
              [("latitude_of_center", 46.95240555555556),
               ("longitude_of_center", 7.439583333333333),
               ("azimuth", 90), ("rectified_grid_angle", 90),
               ("scale_factor", 1), ("false_easting", fe),
               ("false_northing", fn)]))
    _add(5514, "S-JTSK / Krovak East North", "SJTSK",
         ("Krovak",
          [("latitude_of_center", 49.5),
           ("longitude_of_center", 24.83333333333333),
           ("azimuth", 30.28813972222222),
           ("pseudo_standard_parallel_1", 78.5),
           ("scale_factor", 0.9999), ("false_easting", 0),
           ("false_northing", 0)]))
    for z in range(2, 6):
        _add(31466 + z - 2, f"DHDN / 3-degree Gauss-Kruger zone {z}",
             "DHDN", _tm(0, z * 3, 1, z * 1e6 + 500000, 0))
    for z in range(28, 39):
        _add(23000 + z, f"ED50 / UTM zone {z}N", "ED50",
             _tm(0, z * 6 - 183, 0.9996, 500000, 0))
    # Asia / Pacific
    _add(2193, "NZGD2000 / New Zealand Transverse Mercator 2000",
         "NZGD2000", _tm(0, 173, 0.9996, 1600000, 10000000))
    _add(3414, "SVY21 / Singapore TM", "WGS84",
         _tm(1.366666666666667, 103.8333333333333, 1,
             28001.642, 38744.572))
    _add(5179, "Korea 2000 / Unified CS", "Korea2000",
         _tm(38, 127.5, 0.9996, 1000000, 2000000))
    _add(5186, "Korea 2000 / Central Belt 2010", "Korea2000",
         _tm(38, 127, 1, 200000, 600000))
    from .projections import _JAPAN_PLANE
    for i, (lat0, lon0) in enumerate(_JAPAN_PLANE):
        _add(2443 + i, f"JGD2000 / Japan Plane Rectangular CS {i + 1}",
             "JGD2000", _tm(lat0, lon0, 0.9999, 0, 0))
    for z in range(48, 59):
        _add(28300 + z, f"GDA94 / MGA zone {z}", "GDA94",
             _tm(0, z * 6 - 183, 0.9996, 500000, 10000000))
    for z in range(46, 60):
        _add(7800 + z, f"GDA2020 / MGA zone {z}", "GDA2020",
             _tm(0, z * 6 - 183, 0.9996, 500000, 10000000))
    _add(3577, "GDA94 / Australian Albers", "GDA94",
         ("Albers_Conic_Equal_Area",
          [("standard_parallel_1", -18), ("standard_parallel_2", -36),
           ("latitude_of_center", 0), ("longitude_of_center", 132),
           ("false_easting", 0), ("false_northing", 0)]))
    _add(3112, "GDA94 / Geoscience Australia Lambert", "GDA94",
         ("Lambert_Conformal_Conic_2SP",
          [("standard_parallel_1", -18), ("standard_parallel_2", -36),
           ("latitude_of_origin", 0), ("central_meridian", 134),
           ("false_easting", 0), ("false_northing", 0)]))
    # Americas
    _add(5070, "NAD83 / Conus Albers", "NAD83",
         ("Albers_Conic_Equal_Area",
          [("standard_parallel_1", 29.5), ("standard_parallel_2", 45.5),
           ("latitude_of_center", 23), ("longitude_of_center", -96),
           ("false_easting", 0), ("false_northing", 0)]))
    for z in range(11, 23):
        _add(31954 + z, f"SIRGAS 2000 / UTM zone {z}N", "SIRGAS2000",
             _tm(0, z * 6 - 183, 0.9996, 500000, 0))
    for z in range(17, 26):
        _add(31960 + z, f"SIRGAS 2000 / UTM zone {z}S", "SIRGAS2000",
             _tm(0, z * 6 - 183, 0.9996, 500000, 10000000))
    # Russia / CIS
    for z in range(4, 33):
        _add(28400 + z, f"Pulkovo 1942 / Gauss-Kruger zone {z}",
             "Pulkovo42", _tm(0, z * 6 - 183, 1, z * 1e6 + 500000, 0))


_build()

_GEOGRAPHIC_ALIASES = {4326: "WGS84", 4258: "ETRS89", 4269: "NAD83",
                       4283: "GDA94", 4490: "CGCS2000", 4167: "NZGD2000",
                       4619: "ETRS89", 4759: "NAD83", 4170: "SIRGAS2000",
                       4674: "SIRGAS2000"}


def supported_wkt_codes():
    return sorted(set(_META) | set(_GEOGRAPHIC_ALIASES))


def epsg_to_wkt(code: int) -> str:
    """EPSG code → OGC WKT1 string; raises ValueError for codes outside
    the embedded table (naming the supported set's description)."""
    code = int(code)
    if code in _GEOGRAPHIC_ALIASES:
        return _geogcs_wkt(_GEOGRAPHIC_ALIASES[code])
    meta = _META.get(code)
    if meta is None:
        from .projections import _WIDENED_DESC
        raise ValueError(f"epsg_to_wkt: EPSG:{code} not in the embedded "
                         f"table (supported: {_WIDENED_DESC})")
    name, geogcs, method, params = meta
    return _projcs(code, name, geogcs, method, params)
