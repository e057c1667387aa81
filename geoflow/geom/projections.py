"""Additional map projections, pure numpy closed forms (Snyder, *Map
Projections — A Working Manual*, USGS PP 1395; all formulas public).

Widens st_transform beyond 4326/3857/UTM with the common continental
CRS families:
- Lambert Conformal Conic 2SP  (Snyder §15)    e.g. EPSG:2154 Lambert-93
- Lambert Azimuthal Equal Area (Snyder §24)    e.g. EPSG:3035 ETRS89-LAEA
- Albers Equal Area Conic      (Snyder §14)    e.g. EPSG:5070 NAD83 CONUS
- Polar Stereographic variant B (Snyder §21)   e.g. EPSG:3413 / 3976
- ETRS89 / NAD83 UTM zones (258xx / 269xx) on the GRS80 ellipsoid

Datum note: ETRS89/NAD83/RGF93 are treated as coincident with WGS84 at
the coordinate level (no datum-shift grids in this environment; the
offset is < 1-2 m, the standard no-grid assumption). The GRS80
ellipsoid parameters ARE used where the CRS defines them.

Accuracy: forward/inverse round-trips < 1e-9 deg (mm-level); iterative
inverses (conformal latitude / conic) run fixed Newton iterations —
deterministic across workers.
"""

from __future__ import annotations

import math

import numpy as np

# ellipsoids
WGS84 = (6378137.0, 1.0 / 298.257223563)
GRS80 = (6378137.0, 1.0 / 298.257222101)


def _e2(f):
    return f * (2 - f)




def _wrap_lon_deg(lon):
    """Canonical [-180, 180) wrap for inverse-projection longitudes."""
    return (lon + 180.0) % 360.0 - 180.0


# ---------------------------------------------------------------------------
# Lambert Conformal Conic, 2 standard parallels (Snyder 15-1..15-11)
# ---------------------------------------------------------------------------

class LCC2SP:
    def __init__(self, lat1, lat2, lat0, lon0, x0, y0, ellps=GRS80):
        a, f = ellps
        e2 = _e2(f)
        e = math.sqrt(e2)
        self.a, self.e, self.e2 = a, e, e2
        self.lon0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0
        p1 = math.radians(lat1)
        p2 = math.radians(lat2)
        p0 = math.radians(lat0)

        def m(p):
            return math.cos(p) / math.sqrt(1 - e2 * math.sin(p) ** 2)

        def t(p):
            es = e * math.sin(p)
            return math.tan(math.pi / 4 - p / 2) / (
                (1 - es) / (1 + es)) ** (e / 2)

        self.n = (math.log(m(p1)) - math.log(m(p2))) / (
            math.log(t(p1)) - math.log(t(p2)))
        self.F = m(p1) / (self.n * t(p1) ** self.n)
        self.rho0 = a * self.F * t(p0) ** self.n

    def _t_arr(self, phi):
        es = self.e * np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / (
            (1 - es) / (1 + es)) ** (self.e / 2)

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        t = self._t_arr(phi)
        rho = self.a * self.F * t ** self.n
        th = self.n * (lon - self.lon0)
        return (self.x0 + rho * np.sin(th),
                self.y0 + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.sign(self.n) * np.hypot(x, y)
        th = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * y)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        # conformal latitude inverse, fixed-point (Snyder 7-9)
        phi = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):
            es = self.e * np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                t * ((1 - es) / (1 + es)) ** (self.e / 2))
        lon = th / self.n + self.lon0
        return _wrap_lon_deg(np.degrees(lon)), np.degrees(phi)


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal Area (Snyder 24-2..24-16, ellipsoidal)
# ---------------------------------------------------------------------------

class LAEA:
    def __init__(self, lat0, lon0, x0, y0, ellps=GRS80):
        a, f = ellps
        e2 = _e2(f)
        e = math.sqrt(e2)
        self.a, self.e, self.e2 = a, e, e2
        self.lon0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0
        p0 = math.radians(lat0)
        self.qp = self._q(np.array([math.pi / 2]))[0]
        q0 = self._q(np.array([p0]))[0]
        self.beta0 = math.asin(q0 / self.qp)
        self.Rq = a * math.sqrt(self.qp / 2.0)
        self.D = a * (math.cos(p0) / math.sqrt(1 - e2 * math.sin(p0) ** 2)) \
            / (self.Rq * math.cos(self.beta0))

    def _q(self, phi):
        s = np.sin(phi)
        e = self.e
        return (1 - self.e2) * (s / (1 - self.e2 * s * s)
                                - (1 / (2 * e)) * np.log(
                                    (1 - e * s) / (1 + e * s)))

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        q = self._q(phi)
        beta = np.arcsin(np.clip(q / self.qp, -1, 1))
        lam = lon - self.lon0
        b0 = self.beta0
        B = self.Rq * np.sqrt(
            2.0 / (1 + np.sin(b0) * np.sin(beta)
                   + np.cos(b0) * np.cos(beta) * np.cos(lam)))
        x = B * self.D * np.cos(beta) * np.sin(lam)
        y = (B / self.D) * (np.cos(b0) * np.sin(beta)
                            - np.sin(b0) * np.cos(beta) * np.cos(lam))
        return self.x0 + x, self.y0 + y

    def inverse(self, x, y):
        x = (np.asarray(x, dtype=np.float64) - self.x0) / self.D
        y = (np.asarray(y, dtype=np.float64) - self.y0) * self.D
        rho = np.hypot(x, y)
        ce = 2 * np.arcsin(np.clip(rho / (2 * self.Rq), -1, 1))
        b0 = self.beta0
        with np.errstate(invalid="ignore", divide="ignore"):
            beta = np.arcsin(np.clip(
                np.cos(ce) * np.sin(b0)
                + (y * np.sin(ce) * np.cos(b0)) / np.where(rho == 0, 1, rho),
                -1, 1))
            lam = np.arctan2(
                x * np.sin(ce),
                rho * np.cos(b0) * np.cos(ce)
                - y * np.sin(b0) * np.sin(ce))
        beta = np.where(rho == 0, b0, beta)
        lam = np.where(rho == 0, 0.0, lam)
        # authalic → geodetic latitude (Snyder 3-18, series)
        e2 = self.e2
        e4, e6 = e2 * e2, e2 * e2 * e2
        phi = beta + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) \
            * np.sin(2 * beta) \
            + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta) \
            + (761 * e6 / 45360) * np.sin(6 * beta)
        return np.degrees(lam + self.lon0), np.degrees(phi)


# ---------------------------------------------------------------------------
# Albers Equal Area Conic 2SP (Snyder 14-1..14-21)
# ---------------------------------------------------------------------------

class AlbersEAC:
    def __init__(self, lat1, lat2, lat0, lon0, x0, y0, ellps=GRS80):
        a, f = ellps
        e2 = _e2(f)
        self.a, self.e2 = a, e2
        self.e = math.sqrt(e2)
        self.lon0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0
        p0, p1, p2 = (math.radians(v) for v in (lat0, lat1, lat2))

        def m(p):
            return math.cos(p) / math.sqrt(1 - e2 * math.sin(p) ** 2)

        def q(p):
            s = math.sin(p)
            e = self.e
            return (1 - e2) * (s / (1 - e2 * s * s)
                               - (1 / (2 * e)) * math.log(
                                   (1 - e * s) / (1 + e * s)))

        self.n = (m(p1) ** 2 - m(p2) ** 2) / (q(p2) - q(p1))
        self.C = m(p1) ** 2 + self.n * q(p1)
        self.rho0 = a * math.sqrt(self.C - self.n * q(p0)) / self.n
        self._qfn = q

    def _q_arr(self, phi):
        s = np.sin(phi)
        e = self.e
        return (1 - self.e2) * (s / (1 - self.e2 * s * s)
                                - (1 / (2 * e)) * np.log(
                                    (1 - e * s) / (1 + e * s)))

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        q = self._q_arr(phi)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * (lon - self.lon0)
        return (self.x0 + rho * np.sin(th),
                self.y0 + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.hypot(x, y)
        # southern standard parallels → n < 0: reverse x/y signs for the
        # polar angle (Snyder §14, note after 14-11)
        th = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * y)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        # Newton for phi (Snyder 3-16)
        phi = np.arcsin(np.clip(q / 2, -1, 1))
        e2 = self.e2
        for _ in range(8):
            s = np.sin(phi)
            denom = (1 - e2 * s * s)
            phi = phi + denom ** 2 / (2 * np.cos(phi) + 1e-300) * (
                q / (1 - e2)
                - s / denom
                + (1 / (2 * self.e)) * np.log(
                    (1 - self.e * s) / (1 + self.e * s)))
        return _wrap_lon_deg(np.degrees(th / self.n + self.lon0)), np.degrees(phi)


# ---------------------------------------------------------------------------
# Polar Stereographic variant B (Snyder 21-30..21-40; EPSG 9829)
# ---------------------------------------------------------------------------

class PolarStereo:
    def __init__(self, lat_ts, lon0, x0, y0, south=False, ellps=WGS84):
        a, f = ellps
        e2 = _e2(f)
        self.a, self.e2 = a, e2
        self.e = math.sqrt(e2)
        self.lon0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0
        self.south = south
        pts = math.radians(abs(lat_ts))
        e = self.e
        tf = math.tan(math.pi / 4 - pts / 2) / (
            (1 - e * math.sin(pts)) / (1 + e * math.sin(pts))) ** (e / 2)
        mf = math.cos(pts) / math.sqrt(1 - e2 * math.sin(pts) ** 2)
        self.rho_f = a * mf / tf

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        if self.south:
            phi = -phi
            lon = -lon
        e = self.e
        es = e * np.sin(phi)
        t = np.tan(np.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (e / 2)
        rho = self.rho_f * t
        lam = lon - (self.lon0 if not self.south else -self.lon0)
        x = rho * np.sin(lam)
        y = -rho * np.cos(lam)
        if self.south:
            x, y = -x, -y
        return self.x0 + x, self.y0 + y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        if self.south:
            x, y = -x, -y
        rho = np.hypot(x, y)
        t = rho / self.rho_f
        phi = np.pi / 2 - 2 * np.arctan(t)
        e = self.e
        for _ in range(8):
            es = e * np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                t * ((1 - es) / (1 + es)) ** (e / 2))
        lam = np.arctan2(x, -y)
        lon = lam + (self.lon0 if not self.south else -self.lon0)
        if self.south:
            phi = -phi
            lon = -lon
        return _wrap_lon_deg(np.degrees(lon)), np.degrees(phi)


# ---------------------------------------------------------------------------
# EPSG parameter registry for the widened set (public EPSG definitions)
# ---------------------------------------------------------------------------

_PROJ_CACHE: dict = {}


def projection_for_epsg(code: int):
    """Projection object for a widened EPSG code, or None."""
    p = _PROJ_CACHE.get(code)
    if p is not None:
        return p
    if code == 2154:       # RGF93 / Lambert-93 (France)
        p = LCC2SP(44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0, GRS80)
    elif code == 3035:     # ETRS89-extended / LAEA Europe
        p = LAEA(52.0, 10.0, 4321000.0, 3210000.0, GRS80)
    elif code == 5070:     # NAD83 / Conus Albers
        p = AlbersEAC(29.5, 45.5, 23.0, -96.0, 0.0, 0.0, GRS80)
    elif code == 3413:     # WGS84 / NSIDC Sea Ice Polar Stereographic North
        p = PolarStereo(70.0, -45.0, 0.0, 0.0, south=False, ellps=WGS84)
    elif code == 3976:     # WGS84 / NSIDC Sea Ice Polar Stereographic South
        p = PolarStereo(70.0, 0.0, 0.0, 0.0, south=True, ellps=WGS84)
    elif code == 102039:
        p = AlbersEAC(29.5, 45.5, 23.0, -96.0, 0.0, 0.0, GRS80)
    else:
        p = _epsg_factory(code)   # embedded EPSG parameter table
        if p is None:
            return None
    _PROJ_CACHE[code] = p
    return p


# ---------------------------------------------------------------------------
# General Transverse Mercator (Karney-Krüger series, arbitrary ellipsoid)
# ---------------------------------------------------------------------------

AIRY1830 = (6377563.396, 1.0 / 299.3249646)
BESSEL1841 = (6377397.155, 1.0 / 299.1528128)
INTL1924 = (6378388.0, 1.0 / 297.0)
KRASSOWSKY1940 = (6378245.0, 1.0 / 298.3)
CLARKE1866 = (6378206.4, 1.0 / 294.978698214)


def _krueger_series(n: float):
    """alpha/beta/delta series coefficients in the third flattening n
    (Karney 2011, 'Transverse Mercator with an accuracy of a few
    nanometers' — public; 6 terms, error ≪ 1 nm for |f| < 1/150)."""
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    alpha = (
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180
        - 127 * n5 / 288 + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
        + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400)
    beta = (
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
        - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480
        + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800)
    delta = (
        2 * n - 2 * n2 / 3 - 2 * n3 + 116 * n4 / 45 + 26 * n5 / 45
        - 2854 * n6 / 675,
        7 * n2 / 3 - 8 * n3 / 5 - 227 * n4 / 45 + 2704 * n5 / 315
        + 2323 * n6 / 945,
        56 * n3 / 15 - 136 * n4 / 35 - 1262 * n5 / 105
        + 73814 * n6 / 2835,
        4279 * n4 / 630 - 332 * n5 / 35 - 399572 * n6 / 14175,
        4174 * n5 / 315 - 144838 * n6 / 6237,
        601676 * n6 / 22275)
    return alpha, beta, delta


class TMGeneral:
    """Transverse Mercator, arbitrary ellipsoid / origin / scale — the
    Krüger-series form the hardcoded WGS84 UTM path uses, generalized.
    Covers UTM on other ellipsoids, national TM grids (OSGB, NZTM,
    Poland, Korea, Japan plane CS, Gauss-Krüger...)."""

    def __init__(self, lat0, lon0, k0, x0, y0, ellps=WGS84):
        a, f = ellps
        self.e2 = _e2(f)
        self.e = math.sqrt(self.e2)
        n = f / (2.0 - f)
        self.A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
        self.alpha, self.beta, self.delta = _krueger_series(n)
        self.k0 = k0
        self.lon0 = lon0
        self.x0, self.y0 = x0, y0
        # meridian distance of the latitude origin (xi at the central
        # meridian), scaled — subtracted so lat0 maps to northing y0
        self.m0 = 0.0
        if lat0 != 0.0:
            _, n0 = self._forward_core(np.array([lon0]),
                                       np.array([float(lat0)]))
            self.m0 = float(n0[0])

    def _conformal(self, phi):
        es = self.e * np.sin(phi)
        return np.sinh(np.arctanh(np.sin(phi)) - self.e * np.arctanh(es))

    def _forward_core(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64)) \
            - math.radians(self.lon0)
        # wrap to [-pi, pi] so zones near the antimeridian stay finite
        lam = (lam + np.pi) % (2 * np.pi) - np.pi
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        tau = self._conformal(phi)
        xi_p = np.arctan2(tau, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.hypot(tau, np.cos(lam)))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, aj in enumerate(self.alpha, start=1):
            xi += aj * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += aj * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return self.k0 * self.A * eta, self.k0 * self.A * xi

    def forward(self, lon, lat):
        e_raw, n_raw = self._forward_core(lon, lat)
        return self.x0 + e_raw, self.y0 - self.m0 + n_raw

    def inverse(self, x, y):
        eta = (np.asarray(x, dtype=np.float64) - self.x0) \
            / (self.k0 * self.A)
        xi = (np.asarray(y, dtype=np.float64) - self.y0 + self.m0) \
            / (self.k0 * self.A)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, bj in enumerate(self.beta, start=1):
            xi_p -= bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1, 1))
        phi = chi.copy()
        for j, dj in enumerate(self.delta, start=1):
            phi += dj * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return _wrap_lon_deg(np.degrees(lam) + self.lon0), np.degrees(phi)


class MercatorEll:
    """Ellipsoidal Mercator (Snyder 7-7/7-8) — EPSG:3395 World
    Mercator."""

    def __init__(self, lon0=0.0, x0=0.0, y0=0.0, ellps=WGS84):
        a, f = ellps
        self.a = a
        self.e = math.sqrt(_e2(f))
        self.lon0, self.x0, self.y0 = lon0, x0, y0

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        es = self.e * np.sin(phi)
        y = self.a * (np.arctanh(np.sin(phi)) - self.e * np.arctanh(es))
        x = self.a * np.radians(lon - self.lon0)
        return self.x0 + x, self.y0 + y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        psi = y / self.a
        phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
        for _ in range(8):
            es = self.e * np.sin(phi)
            phi = 2 * np.arctan(
                np.exp(psi + self.e * np.arctanh(es))) - np.pi / 2
        return _wrap_lon_deg(np.degrees(x / self.a) + self.lon0), np.degrees(phi)


class Identity:
    """Geographic CRS treated as coincident with WGS84 at the coordinate
    level (ETRS89 / NAD83 / GDA94 / CGCS2000 / NZGD2000 / SWEREF99 —
    the standard no-datum-grid assumption, offsets < 1-2 m)."""

    def forward(self, lon, lat):
        return (np.asarray(lon, dtype=np.float64),
                np.asarray(lat, dtype=np.float64))

    inverse = forward


class ObliqueStereo:
    """Oblique (double) Stereographic, EPSG method 9809 — the Dutch
    RD New grid (EPSG:28992). Formulas from EPSG Guidance Note 7-2
    (public): conformal-sphere mapping (n, c, R from the ellipsoid at
    the origin), then spherical oblique stereographic."""

    def __init__(self, lat0, lon0, k0, x0, y0, ellps=WGS84):
        a, f = ellps
        self.e2 = _e2(f)
        self.e = math.sqrt(self.e2)
        p0 = math.radians(lat0)
        sp0 = math.sin(p0)
        rho0 = a * (1 - self.e2) / (1 - self.e2 * sp0 ** 2) ** 1.5
        nu0 = a / math.sqrt(1 - self.e2 * sp0 ** 2)
        self.R = math.sqrt(rho0 * nu0)
        self.n = math.sqrt(1 + self.e2 * math.cos(p0) ** 4 / (1 - self.e2))
        S1 = (1 + sp0) / (1 - sp0)
        S2 = (1 - self.e * sp0) / (1 + self.e * sp0)
        w1 = (S1 * S2 ** self.e) ** self.n
        sin_chi0 = (w1 - 1) / (w1 + 1)
        self.c = ((self.n + sp0) * (1 - sin_chi0)
                  / ((self.n - sp0) * (1 + sin_chi0)))
        w2 = self.c * w1
        self.chi0 = math.asin((w2 - 1) / (w2 + 1))
        self.lam0 = math.radians(lon0)
        self.k0, self.x0, self.y0 = k0, x0, y0

    def _chi_lam(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        sp = np.sin(phi)
        Sa = (1 + sp) / (1 - sp)
        Sb = (1 - self.e * sp) / (1 + self.e * sp)
        w = self.c * (Sa * Sb ** self.e) ** self.n
        chi = np.arcsin((w - 1) / (w + 1))
        Lam = self.n * (lam - self.lam0) + self.lam0
        return chi, Lam

    def forward(self, lon, lat):
        chi, Lam = self._chi_lam(lon, lat)
        dl = Lam - self.lam0
        B = (1 + np.sin(chi) * math.sin(self.chi0)
             + np.cos(chi) * math.cos(self.chi0) * np.cos(dl))
        g = 2 * self.R * self.k0
        E = self.x0 + g * np.cos(chi) * np.sin(dl) / B
        N = self.y0 + g * (np.sin(chi) * math.cos(self.chi0)
                           - np.cos(chi) * math.sin(self.chi0)
                           * np.cos(dl)) / B
        return E, N

    def inverse(self, x, y):
        Ep = np.asarray(x, dtype=np.float64) - self.x0
        Np = np.asarray(y, dtype=np.float64) - self.y0
        g = 2 * self.R * self.k0 * math.tan(math.pi / 4 - self.chi0 / 2)
        h = 4 * self.R * self.k0 * math.tan(self.chi0) + g
        i = np.arctan2(Ep, h + Np)
        j = np.arctan2(Ep, g - Np) - i
        chi = self.chi0 + 2 * np.arctan(
            (Np - Ep * np.tan(j / 2)) / (2 * self.R * self.k0))
        Lam = j + 2 * i + self.lam0
        lam = (Lam - self.lam0) / self.n + self.lam0
        # conformal -> geodetic latitude via isometric-latitude iteration
        psi = 0.5 * np.log((1 + np.sin(chi))
                           / (self.c * (1 - np.sin(chi)))) / self.n
        phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
        for _ in range(12):
            es = self.e * np.sin(phi)
            psi_i = np.log(np.tan(phi / 2 + np.pi / 4)
                           * ((1 - es) / (1 + es)) ** (self.e / 2))
            phi = phi - (psi_i - psi) * np.cos(phi) \
                * (1 - es ** 2) / (1 - self.e2)
        return _wrap_lon_deg(np.degrees(lam)), np.degrees(phi)


class SwissOblique:
    """Swiss Oblique Cylindrical (Rosenmund, EPSG method 9814) —
    CH1903/LV03 (EPSG:21781) and CH1903+/LV95 (EPSG:2056). Rigorous
    formulas from the public swisstopo projection publication:
    ellipsoid -> conformal sphere -> pseudo-equator rotation ->
    spherical Mercator."""

    def __init__(self, lat0, lon0, x0, y0, ellps=BESSEL1841):
        a, f = ellps
        self.e2 = _e2(f)
        self.e = math.sqrt(self.e2)
        p0 = math.radians(lat0)
        sp0 = math.sin(p0)
        self.alpha = math.sqrt(
            1 + self.e2 / (1 - self.e2) * math.cos(p0) ** 4)
        self.R = a * math.sqrt(1 - self.e2) / (1 - self.e2 * sp0 ** 2)
        self.b0 = math.asin(sp0 / self.alpha)
        self.K = (math.log(math.tan(math.pi / 4 + self.b0 / 2))
                  - self.alpha * math.log(math.tan(math.pi / 4 + p0 / 2))
                  + self.alpha * self.e / 2
                  * math.log((1 + self.e * sp0) / (1 - self.e * sp0)))
        self.lam0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        es = self.e * np.sin(phi)
        S = (self.alpha * np.log(np.tan(np.pi / 4 + phi / 2))
             - self.alpha * self.e / 2 * np.log((1 + es) / (1 - es))
             + self.K)
        b = 2 * (np.arctan(np.exp(S)) - np.pi / 4)
        ell = self.alpha * (lam - self.lam0)
        cb, sb = np.cos(b), np.sin(b)
        sb_bar = (math.cos(self.b0) * sb
                  - math.sin(self.b0) * cb * np.cos(ell))
        b_bar = np.arcsin(np.clip(sb_bar, -1.0, 1.0))
        l_bar = np.arctan2(cb * np.sin(ell),
                           math.cos(self.b0) * cb * np.cos(ell)
                           + math.sin(self.b0) * sb)
        E = self.x0 + self.R * l_bar
        N = self.y0 + self.R * np.log(np.tan(np.pi / 4 + b_bar / 2))
        return E, N

    def inverse(self, x, y):
        l_bar = (np.asarray(x, dtype=np.float64) - self.x0) / self.R
        b_bar = 2 * (np.arctan(np.exp(
            (np.asarray(y, dtype=np.float64) - self.y0) / self.R))
            - np.pi / 4)
        cb, sb = np.cos(b_bar), np.sin(b_bar)
        sinb = (math.cos(self.b0) * sb
                + math.sin(self.b0) * cb * np.cos(l_bar))
        b = np.arcsin(np.clip(sinb, -1.0, 1.0))
        ell = np.arctan2(cb * np.sin(l_bar),
                         math.cos(self.b0) * cb * np.cos(l_bar)
                         - math.sin(self.b0) * sb)
        lam = self.lam0 + ell / self.alpha
        # invert the conformal-latitude mapping by fixed point on S
        S = np.log(np.tan(np.pi / 4 + b / 2))
        psi = (S - self.K) / self.alpha       # isometric latitude
        phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
        for _ in range(12):
            es = self.e * np.sin(phi)
            psi_i = np.log(np.tan(phi / 2 + np.pi / 4)) \
                - self.e / 2 * np.log((1 + es) / (1 - es))
            phi = phi - (psi_i - psi) * np.cos(phi) \
                * (1 - es ** 2) / (1 - self.e2)
        return _wrap_lon_deg(np.degrees(lam)), np.degrees(phi)


class Krovak:
    """Krovak oblique conformal conic (EPSG method 9819) — S-JTSK
    (EPSG:5514, East-North variant: E = -westing, N = -southing).
    Formulas from EPSG Guidance Note 7-2 (public)."""

    def __init__(self, lat_c=49.5, lon0=24.0 + 50.0 / 60.0,
                 alpha_c=30.0 + 17.0 / 60.0 + 17.3031 / 3600.0,
                 lat_p=78.5, k_p=0.9999, x0=0.0, y0=0.0,
                 ellps=BESSEL1841):
        a, f = ellps
        self.e2 = _e2(f)
        self.e = math.sqrt(self.e2)
        pc = math.radians(lat_c)
        spc = math.sin(pc)
        self.A = a * math.sqrt(1 - self.e2) / (1 - self.e2 * spc ** 2)
        self.B = math.sqrt(
            1 + self.e2 * math.cos(pc) ** 4 / (1 - self.e2))
        self.g0 = math.asin(spc / self.B)
        self.t0 = (math.tan(math.pi / 4 + self.g0 / 2)
                   * ((1 + self.e * spc) / (1 - self.e * spc))
                   ** (self.e * self.B / 2)
                   / math.tan(math.pi / 4 + pc / 2) ** self.B)
        self.alpha_c = math.radians(alpha_c)
        pp = math.radians(lat_p)
        self.n = math.sin(pp)
        self.r0 = k_p * self.A / math.tan(pp)
        self.tan_pp = math.tan(math.pi / 4 + pp / 2)
        self.lam0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        es = self.e * np.sin(phi)
        U = 2 * (np.arctan(
            self.t0 * np.tan(phi / 2 + np.pi / 4) ** self.B
            / ((1 + es) / (1 - es)) ** (self.e * self.B / 2))
            - np.pi / 4)
        V = self.B * (self.lam0 - lam)
        cU, sU = np.cos(U), np.sin(U)
        sT = (math.cos(self.alpha_c) * sU
              + math.sin(self.alpha_c) * cU * np.cos(V))
        T = np.arcsin(np.clip(sT, -1.0, 1.0))
        D = np.arcsin(np.clip(cU * np.sin(V) / np.cos(T), -1.0, 1.0))
        theta = self.n * D
        r = self.r0 * self.tan_pp ** self.n \
            / np.tan(T / 2 + np.pi / 4) ** self.n
        Xp = r * np.cos(theta)       # southing
        Yp = r * np.sin(theta)       # westing
        return self.x0 - Yp, self.y0 - Xp   # East-North variant

    def inverse(self, x, y):
        Yp = self.x0 - np.asarray(x, dtype=np.float64)
        Xp = self.y0 - np.asarray(y, dtype=np.float64)
        r = np.hypot(Xp, Yp)
        theta = np.arctan2(Yp, Xp)
        D = theta / self.n
        T = 2 * (np.arctan((self.r0 * self.tan_pp ** self.n / r)
                           ** (1.0 / self.n)) - np.pi / 4)
        U = np.arcsin(np.clip(
            math.cos(self.alpha_c) * np.sin(T)
            - math.sin(self.alpha_c) * np.cos(T) * np.cos(D), -1.0, 1.0))
        V = np.arcsin(np.clip(np.cos(T) * np.sin(D) / np.cos(U),
                              -1.0, 1.0))
        lam = self.lam0 - V / self.B
        # invert U(phi) by Newton-free fixed point (EPSG iteration)
        phi = U.copy()
        for _ in range(12):
            es = self.e * np.sin(phi)
            phi = 2 * (np.arctan(
                self.t0 ** (-1.0 / self.B)
                * np.tan(U / 2 + np.pi / 4) ** (1.0 / self.B)
                * ((1 + es) / (1 - es)) ** (self.e / 2)) - np.pi / 4)
        return _wrap_lon_deg(np.degrees(lam)), np.degrees(phi)


# ---------------------------------------------------------------------------
# 7-parameter Helmert datum shifts (position-vector convention, to WGS84)
# ---------------------------------------------------------------------------

class Helmert7:
    """Single-set Helmert transform between a legacy datum and WGS84
    (published EPSG parameter sets; accuracy 1-10 m — the grid-free
    approximation, documented). Position-vector rotation convention."""

    def __init__(self, dx, dy, dz, rx_as=0.0, ry_as=0.0, rz_as=0.0,
                 ppm=0.0, ellps=WGS84):
        self.t = np.array([dx, dy, dz])
        as2r = math.pi / (180.0 * 3600.0)
        self.r = np.array([rx_as * as2r, ry_as * as2r, rz_as * as2r])
        self.s = 1.0 + ppm * 1e-6
        self.src = ellps

    @staticmethod
    def _geodetic_to_xyz(lon, lat, ellps):
        a, f = ellps
        e2 = _e2(f)
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        cp = np.cos(phi)
        return (nu * cp * np.cos(lam), nu * cp * np.sin(lam),
                nu * (1 - e2) * np.sin(phi))

    @staticmethod
    def _xyz_to_geodetic(X, Y, Z, ellps):
        a, f = ellps
        e2 = _e2(f)
        lam = np.arctan2(Y, X)
        p = np.hypot(X, Y)
        phi = np.arctan2(Z, p * (1 - e2))
        for _ in range(10):
            nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
            phi = np.arctan2(Z + e2 * nu * np.sin(phi), p)
        return np.degrees(lam), np.degrees(phi)

    def to_wgs84(self, lon, lat):
        X, Y, Z = self._geodetic_to_xyz(lon, lat, self.src)
        rx, ry, rz = self.r
        X2 = self.s * (X - rz * Y + ry * Z) + self.t[0]
        Y2 = self.s * (rz * X + Y - rx * Z) + self.t[1]
        Z2 = self.s * (-ry * X + rx * Y + Z) + self.t[2]
        return self._xyz_to_geodetic(X2, Y2, Z2, WGS84)

    def from_wgs84(self, lon, lat):
        X, Y, Z = self._geodetic_to_xyz(lon, lat, WGS84)
        rx, ry, rz = self.r
        Xs = (X - self.t[0]) / self.s
        Ys = (Y - self.t[1]) / self.s
        Zs = (Z - self.t[2]) / self.s
        X2 = Xs + rz * Ys - ry * Zs
        Y2 = -rz * Xs + Ys + rx * Zs
        Z2 = ry * Xs - rx * Ys + Zs
        return self._xyz_to_geodetic(X2, Y2, Z2, self.src)


class DatumProjected:
    """Projection on a legacy datum: WGS84 lon/lat ↔ datum lon/lat
    (Helmert) ↔ projected coordinates."""

    def __init__(self, proj, helmert: Helmert7):
        self.proj = proj
        self.helmert = helmert

    def forward(self, lon, lat):
        lo, la = self.helmert.from_wgs84(lon, lat)
        return self.proj.forward(lo, la)

    def inverse(self, x, y):
        lo, la = self.proj.inverse(x, y)
        return self.helmert.to_wgs84(lo, la)


# ---------------------------------------------------------------------------
# embedded EPSG parameter table (public EPSG registry definitions)
# ---------------------------------------------------------------------------

_H_OSGB36 = lambda: Helmert7(-446.448, 125.157, -542.060, -0.1502,
                             -0.2470, -0.8421, 20.4894, AIRY1830)
_H_DHDN = lambda: Helmert7(598.1, 73.7, 418.2, 0.202, 0.045, -2.455,
                           6.7, BESSEL1841)
_H_ED50 = lambda: Helmert7(-87.0, -98.0, -121.0, ellps=INTL1924)
_H_GGRS87 = lambda: Helmert7(-199.87, 74.79, 246.62, ellps=GRS80)
_H_PULKOVO42 = lambda: Helmert7(28.0, -130.0, -95.0,
                                ellps=KRASSOWSKY1940)
_H_AMERSFOORT = lambda: Helmert7(565.417, 50.3319, 465.552, -0.398957,
                                 0.343988, -1.8774, 4.0725, BESSEL1841)
_H_CH1903 = lambda: Helmert7(674.374, 15.056, 405.346, ellps=BESSEL1841)
_H_SJTSK = lambda: Helmert7(570.8, 85.7, 462.8, 4.998, 1.587, 5.261,
                            3.56, BESSEL1841)

# Japan Plane Rectangular CS I..XIX (EPSG 2443..2461, JGD2000/GRS80,
# k0=0.9999, x0=y0=0): (lat0, lon0) per zone — EPSG registry values
_JAPAN_PLANE = [
    (33.0, 129.5), (33.0, 131.0), (36.0, 132.0 + 1 / 6),
    (33.0, 133.5), (36.0, 134.0 + 1 / 3), (36.0, 136.0),
    (36.0, 137.0 + 1 / 6), (36.0, 138.5), (36.0, 139.0 + 5 / 6),
    (40.0, 140.0 + 5 / 6), (44.0, 140.25), (44.0, 142.25),
    (44.0, 144.25), (26.0, 142.0), (26.0, 127.5), (26.0, 124.0),
    (26.0, 131.0), (20.0, 136.0), (26.0, 154.0)]


def _epsg_factory(code: int):
    """Factory for the widened EPSG table. Returns a projection object
    (forward: WGS84 lon/lat → CRS coords; inverse: back) or None."""
    # --- geographic aliases of WGS84 (no-grid treatment) ---
    if code in (4258, 4269, 4283, 4490, 4167, 4619, 4759, 4170, 4674):
        return Identity()   # ETRS89 NAD83 GDA94 CGCS2000 NZGD2000
    # SWEREF99 / NAD83(2007) / SIRGAS95 / SIRGAS2000 geographic
    # --- world ---
    if code == 3395:
        return MercatorEll(ellps=WGS84)
    if code in (32661, 32761):  # UPS North/South (variant A via ts≈lat
        # of true scale for k0=0.994: ts = 81.11451786859362 deg)
        return PolarStereo(81.11451786859362, 0.0, 2000000.0, 2000000.0,
                           south=(code == 32761), ellps=WGS84)
    # --- Europe ---
    if code == 27700:           # OSGB36 / British National Grid
        return DatumProjected(
            TMGeneral(49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
                      AIRY1830), _H_OSGB36())
    if code == 2180:            # ETRS89 / Poland CS92
        return TMGeneral(0.0, 19.0, 0.9993, 500000.0, -5300000.0, GRS80)
    if 2176 <= code <= 2179:    # ETRS89 / Poland CS2000 zones 5..8
        z = code - 2176 + 5
        return TMGeneral(0.0, z * 3.0, 0.999923, z * 1e6 + 500000.0,
                         0.0, GRS80)
    if code == 3006:            # SWEREF99 TM
        return TMGeneral(0.0, 15.0, 0.9996, 500000.0, 0.0, GRS80)
    if code == 3067:            # ETRS89 / TM35FIN
        return TMGeneral(0.0, 27.0, 0.9996, 500000.0, 0.0, GRS80)
    if code == 3034:            # ETRS89-extended / LCC Europe
        return LCC2SP(35.0, 65.0, 52.0, 10.0, 4000000.0, 2800000.0,
                      GRS80)
    if code == 2100:            # GGRS87 / Greek Grid
        return DatumProjected(
            TMGeneral(0.0, 24.0, 0.9996, 500000.0, 0.0, GRS80),
            _H_GGRS87())
    if code == 28992:           # Amersfoort / RD New (double stereo)
        return DatumProjected(
            ObliqueStereo(52.0 + 9.0 / 60.0 + 22.178 / 3600.0,
                          5.0 + 23.0 / 60.0 + 15.5 / 3600.0,
                          0.9999079, 155000.0, 463000.0, BESSEL1841),
            _H_AMERSFOORT())
    if code in (21781, 2056):   # CH1903 / LV03 and CH1903+ / LV95
        fe, fn = (600000.0, 200000.0) if code == 21781 \
            else (2600000.0, 1200000.0)
        return DatumProjected(
            SwissOblique(46.0 + 57.0 / 60.0 + 8.66 / 3600.0,
                         7.0 + 26.0 / 60.0 + 22.5 / 3600.0, fe, fn,
                         BESSEL1841), _H_CH1903())
    if code == 5514:            # S-JTSK / Krovak East North
        return DatumProjected(Krovak(), _H_SJTSK())
    if 31466 <= code <= 31469:  # DHDN / Gauss-Krüger zones 2..5
        z = code - 31466 + 2
        return DatumProjected(
            TMGeneral(0.0, z * 3.0, 1.0, z * 1e6 + 500000.0, 0.0,
                      BESSEL1841), _H_DHDN())
    if 23028 <= code <= 23038:  # ED50 / UTM zones 28N..38N
        z = code - 23000
        return DatumProjected(
            TMGeneral(0.0, z * 6.0 - 183.0, 0.9996, 500000.0, 0.0,
                      INTL1924), _H_ED50())
    # --- Asia / Pacific ---
    if code == 2193:            # NZGD2000 / NZTM2000
        return TMGeneral(0.0, 173.0, 0.9996, 1600000.0, 10000000.0,
                         GRS80)
    if code == 3414:            # SVY21 / Singapore TM
        return TMGeneral(1.0 + 22.0 / 60.0, 103.0 + 50.0 / 60.0, 1.0,
                         28001.642, 38744.572, WGS84)
    if code == 5179:            # Korea 2000 / Unified CS
        return TMGeneral(38.0, 127.5, 0.9996, 1000000.0, 2000000.0,
                         GRS80)
    if code == 5186:            # Korea 2000 / Central Belt 2010
        return TMGeneral(38.0, 127.0, 1.0, 200000.0, 600000.0, GRS80)
    if 2443 <= code <= 2461:    # JGD2000 / Japan Plane CS I..XIX
        lat0, lon0 = _JAPAN_PLANE[code - 2443]
        return TMGeneral(lat0, lon0, 0.9999, 0.0, 0.0, GRS80)
    if 28348 <= code <= 28358:  # GDA94 / MGA zones 48..58
        z = code - 28300
        return TMGeneral(0.0, z * 6.0 - 183.0, 0.9996, 500000.0,
                         10000000.0, GRS80)
    if 7846 <= code <= 7859:    # GDA2020 / MGA zones 46..59
        z = code - 7800
        return TMGeneral(0.0, z * 6.0 - 183.0, 0.9996, 500000.0,
                         10000000.0, GRS80)
    if code == 3577:            # GDA94 / Australian Albers
        return AlbersEAC(-18.0, -36.0, 0.0, 132.0, 0.0, 0.0, GRS80)
    if code == 3112:            # GDA94 / Geoscience Australia Lambert
        return LCC2SP(-18.0, -36.0, 0.0, 134.0, 0.0, 0.0, GRS80)
    # --- Americas ---
    if 31965 <= code <= 31976:  # SIRGAS 2000 / UTM 11N..22N
        z = code - 31954
        return TMGeneral(0.0, z * 6.0 - 183.0, 0.9996, 500000.0, 0.0,
                         GRS80)
    if 31977 <= code <= 31985:  # SIRGAS 2000 / UTM 17S..25S
        z = code - 31960
        return TMGeneral(0.0, z * 6.0 - 183.0, 0.9996, 500000.0,
                         10000000.0, GRS80)
    # --- Russia / CIS ---
    if 28404 <= code <= 28432:  # Pulkovo 1942 / Gauss-Krüger 4..32
        z = code - 28400
        return DatumProjected(
            TMGeneral(0.0, z * 6.0 - 183.0, 1.0, z * 1e6 + 500000.0,
                      0.0, KRASSOWSKY1940), _H_PULKOVO42())
    return None


_WIDENED_DESC = ("4326, 3857, 3395, UTM 326xx/327xx/258xx/269xx, UPS "
                 "32661/32761, 2154, 3035, 5070, 3413, 3976, 27700, "
                 "2176-2180, 3006, 3034, 3067, 2100, 28992, 21781, "
                 "2056, 5514, 31466-69, "
                 "23028-38, 2193, 3414, 5179, 5186, 2443-61, 28348-58, "
                 "7846-59, 3577, 3112, 31965-85, 28404-32, and "
                 "geographic aliases 4258/4269/4283/4490/4167/4619/"
                 "4759/4170/4674")
