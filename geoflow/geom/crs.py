"""CRS transforms, pure numpy (no pyproj in this environment).

Implements the projections the engine actually needs:
- EPSG:4326 (CRS84 lon/lat) ↔ EPSG:3857 Web-Mercator (exact closed form)
- EPSG:4326 ↔ UTM zones 326xx/327xx via the Krüger series for the
  transverse Mercator (standard published 3rd-order coefficients in n;
  ~mm forward / sub-cm inverse accuracy within a zone)

The reference auto-selects a UTM zone from the WGS84 centroid for
metric buffering (GeometryWrapper.java:456-476, buffer :409-450);
`utm_zone_epsg` + `buffer_meters` reproduce that behavior.

Transformers are cached per worker process (`get_transformer`), matching
the reference's JVM-global MathTransform cache (SURVEY.md §2.3).
"""

from __future__ import annotations

import math

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)
_K0 = 0.9996
_E0 = 500000.0

# Krüger series coefficients (3rd order in n)
_A_BAR = _A / (1 + _N) * (1 + _N ** 2 / 4 + _N ** 4 / 64)
_ALPHA = (_N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16,
          13 * _N ** 2 / 48 - 3 * _N ** 3 / 5,
          61 * _N ** 3 / 240)
_BETA = (_N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96,
         _N ** 2 / 48 + _N ** 3 / 15,
         17 * _N ** 3 / 480)
_DELTA = (2 * _N - 2 * _N ** 2 / 3 - 2 * _N ** 3,
          7 * _N ** 2 / 3 - 8 * _N ** 3 / 5,
          56 * _N ** 3 / 15)

_MAX_MERC_LAT = 85.051128779806604


def lonlat_to_webmercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64),
                  -_MAX_MERC_LAT, _MAX_MERC_LAT)
    x = _A * np.radians(lon)
    y = _A * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def webmercator_to_lonlat(x, y):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / _A)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64)
                                          / _A)) - np.pi / 2)
    return lon, lat


def utm_zone_epsg(lon: float, lat: float) -> int:
    """EPSG code of the UTM zone containing (lon, lat) — the reference's
    centroid-based zone pick (GeometryWrapper.java:456-476)."""
    zone = int((lon + 180.0) // 6.0) + 1
    zone = min(60, max(1, zone))
    return (32600 if lat >= 0 else 32700) + zone


def _utm_central_meridian(epsg: int) -> float:
    zone = epsg % 100
    return -183.0 + 6.0 * zone


def lonlat_to_utm(lon, lat, epsg: int):
    """Krüger forward transverse Mercator, vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam0 = math.radians(_utm_central_meridian(epsg))
    phi = np.radians(lat)
    lam = np.radians(lon) - lam0
    sphi = np.sin(phi)
    e = math.sqrt(_F * (2 - _F))
    t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    easting = _E0 + _K0 * _A_BAR * eta
    northing = _K0 * _A_BAR * xi
    if epsg >= 32700:
        northing = northing + 10000000.0
    return easting, northing


def utm_to_lonlat(e_coord, n_coord, epsg: int):
    """Krüger inverse, vectorized."""
    e_coord = np.asarray(e_coord, dtype=np.float64)
    n_coord = np.asarray(n_coord, dtype=np.float64)
    if epsg >= 32700:
        n_coord = n_coord - 10000000.0
    xi = n_coord / (_K0 * _A_BAR)
    eta = (e_coord - _E0) / (_K0 * _A_BAR)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = np.degrees(lam) + _utm_central_meridian(epsg)
    return lon, np.degrees(phi)


_TRANSFORMERS: dict = {}


def _widened(code: int):
    from .projections import projection_for_epsg
    return projection_for_epsg(code)


def _crs_known(code: int) -> bool:
    return (code in (4326, 3857) or 32600 < code < 32761
            or _widened(code) is not None
            or _datum_utm_zone(code) is not None)


def _datum_utm_zone(code: int):
    """ETRS89 / NAD83 UTM codes → equivalent WGS84 UTM EPSG (or None)."""
    if 25828 <= code <= 25838:          # ETRS89 / UTM 28N..38N
        return 32600 + (code - 25800)
    if 26901 <= code <= 26923:          # NAD83 / UTM 1N..23N
        return 32600 + (code - 26900)
    return None


def get_transformer(src: int, dst: int):
    """(src_epsg, dst_epsg) → vectorized fn(x, y) -> (x', y'); cached per
    worker process."""
    key = (src, dst)
    fn = _TRANSFORMERS.get(key)
    if fn is not None:
        return fn
    if src == dst:
        fn = lambda x, y: (np.asarray(x, dtype=np.float64),
                           np.asarray(y, dtype=np.float64))
    elif src == 4326 and dst == 3857:
        fn = lonlat_to_webmercator
    elif src == 3857 and dst == 4326:
        fn = webmercator_to_lonlat
    elif src == 4326 and 32600 < dst < 32761:
        fn = lambda x, y, _d=dst: lonlat_to_utm(x, y, _d)
    elif 32600 < src < 32761 and dst == 4326:
        fn = lambda x, y, _s=src: utm_to_lonlat(x, y, _s)
    elif src == 4326 and _widened(dst) is not None:
        fn = _widened(dst).forward
    elif dst == 4326 and _widened(src) is not None:
        fn = _widened(src).inverse
    elif src == 4326 and _datum_utm_zone(dst):
        # ETRS89 (258xx) / NAD83 (269xx) UTM: same Krüger series; the
        # GRS80-vs-WGS84 flattening difference is sub-mm (documented
        # no-datum-grid treatment)
        fn = lambda x, y, _z=_datum_utm_zone(dst): lonlat_to_utm(x, y, _z)
    elif dst == 4326 and _datum_utm_zone(src):
        fn = lambda x, y, _z=_datum_utm_zone(src): utm_to_lonlat(x, y, _z)
    elif src != 4326 and _crs_known(src) and _crs_known(dst):
        # route through 4326
        to_geo = get_transformer(src, 4326)
        geo_to = get_transformer(4326, dst)
        fn = lambda x, y: geo_to(*to_geo(x, y))
    else:
        from .projections import _WIDENED_DESC
        raise ValueError(
            f"unsupported CRS pair {src}->{dst} "
            f"(supported EPSG set: {_WIDENED_DESC})")
    _TRANSFORMERS[key] = fn
    return fn


def transform_geom(g, dst_epsg: int):
    """Geometry → new Geometry in dst CRS (operand SRS honored, matching
    checkTransformSRS — GeometryWrapper.java:207-219)."""
    fn = get_transformer(g.srid, dst_epsg)

    def apply(c):
        out = c.copy()
        x, y = fn(c[:, 0], c[:, 1])
        out[:, 0] = x
        out[:, 1] = y
        return out

    out = g.map_coords(apply)

    def set_srid(x):
        x.srid = dst_epsg
        if x.parts is not None:
            for p in x.parts:
                set_srid(p)
    set_srid(out)
    return out


def buffer_meters(g, dist_m: float, quadsegs: int = 8):
    """Metric buffer via UTM round-trip — the reference's unit-mismatch
    path (GeometryWrapper.java:409-450): transform to the centroid's UTM
    zone, buffer there in meters, transform back."""
    from . import algorithms as alg
    if g.srid != 4326:
        raise ValueError("buffer_meters expects a geographic (4326) input")
    cx, cy = alg.centroid(g)
    epsg = utm_zone_epsg(cx, cy)
    utm = transform_geom(g, epsg)
    buffered = alg.buffer(utm, dist_m, quadsegs)
    buffered.srid = epsg
    return transform_geom(buffered, 4326)
