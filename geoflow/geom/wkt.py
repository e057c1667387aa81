"""WKT reader/writer.

Mirrors the reference's WKT datatype semantics
(/root/reference/src/main/io/github/galbiston/geosparql_jena/implementation/datatype/geometry/WKBDatatype.java:17-31
documents the shared literal convention): an optional leading ``<srsURI>``
prefix followed by WKT text; default CRS84 when the prefix is absent.

Supports 2D/3D/4D (Z / M / ZM tags), EMPTY, nested collections.
"""

from __future__ import annotations

import re

import numpy as np

from .types import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING,
                    MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, DEFAULT_SRID,
                    Geometry)

_TOKEN = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")
_SRS_PREFIX = re.compile(r"^\s*<([^>]*)>\s*")
_EPSG_URI = re.compile(r"(?:EPSG/0/|EPSG[/#:])(\d+)\s*$", re.IGNORECASE)

# URIs that mean "CRS84 / WGS84 lon-lat" (Constants.java:46-52)
_CRS84_URIS = {
    "http://www.opengis.net/def/crs/OGC/1.3/CRS84",
    "urn:ogc:def:crs:OGC::CRS84",
    "CRS:84",
}


def srid_from_uri(uri: str) -> int:
    uri = uri.strip()
    if not uri or uri in _CRS84_URIS:
        return DEFAULT_SRID
    m = _EPSG_URI.search(uri)
    if m:
        return int(m.group(1))
    return DEFAULT_SRID


def uri_from_srid(srid: int) -> str:
    if srid in (4326, 0):
        return "http://www.opengis.net/def/crs/OGC/1.3/CRS84"
    return f"http://www.opengis.net/def/crs/EPSG/0/{srid}"


class _Tokens:
    __slots__ = ("toks", "i")

    def __init__(self, s: str):
        self.toks = _TOKEN.findall(s)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of WKT")
        self.i += 1
        return t

    def expect(self, tok):
        t = self.next()
        if t != tok:
            raise ValueError(f"expected {tok!r}, got {t!r}")


def _parse_dim_tag(ts: _Tokens):
    """Consume an optional Z/M/ZM tag; return (has_z, has_m)."""
    t = ts.peek()
    if t is not None and t.upper() in ("Z", "M", "ZM"):
        ts.next()
        u = t.upper()
        return "Z" in u, "M" in u
    return False, False


def _parse_coord_seq(ts: _Tokens, ndim_hint):
    """Parse '(' x y [z [m]] (',' ...)* ')' -> (n, ndim) array."""
    ts.expect("(")
    rows = []
    while True:
        row = []
        while True:
            t = ts.peek()
            if t in (",", ")"):
                break
            row.append(float(ts.next()))
        rows.append(row)
        t = ts.next()
        if t == ")":
            break
        if t != ",":
            raise ValueError(f"bad token {t!r} in coord sequence")
    n = max(len(r) for r in rows)
    if ndim_hint and ndim_hint > n:
        n = ndim_hint
    arr = np.full((len(rows), n), np.nan, dtype=np.float64)
    for i, r in enumerate(rows):
        arr[i, :len(r)] = r
    return arr


def _parse_geometry(ts: _Tokens, srid) -> Geometry:
    name = ts.next().upper()
    has_z, has_m = _parse_dim_tag(ts)
    ndim = 2 + int(has_z) + int(has_m)

    if ts.peek() is not None and ts.peek().upper() == "EMPTY":
        ts.next()
        from .types import NAME_TYPES
        g = Geometry.empty(NAME_TYPES[name], srid)
        g.has_z, g.has_m = has_z, has_m
        return g

    def finish(g):
        if not has_z and not has_m:
            # infer dims from coordinate arity when no tag given
            blocks = list(g.coord_blocks())
            if blocks and blocks[0].shape[1] == 3:
                g.has_z = True
            elif blocks and blocks[0].shape[1] == 4:
                g.has_z = g.has_m = True
        else:
            g.has_z, g.has_m = has_z, has_m
        return g

    if name == "POINT":
        seq = _parse_coord_seq(ts, ndim)
        return finish(Geometry(POINT, coords=seq[0], srid=srid))
    if name == "LINESTRING":
        return finish(Geometry(LINESTRING, coords=_parse_coord_seq(ts, ndim), srid=srid))
    if name == "POLYGON":
        ts.expect("(")
        rings = []
        while True:
            rings.append(_parse_coord_seq(ts, ndim))
            t = ts.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad token {t!r} in polygon")
        return finish(Geometry(POLYGON, rings=rings, srid=srid))
    if name == "MULTIPOINT":
        ts.expect("(")
        parts = []
        while True:
            if ts.peek() == "(":
                seq = _parse_coord_seq(ts, ndim)
                parts.append(Geometry(POINT, coords=seq[0], srid=srid))
            else:  # bare "x y" form
                row = []
                while ts.peek() not in (",", ")"):
                    row.append(float(ts.next()))
                parts.append(Geometry(POINT, coords=np.asarray(row, dtype=np.float64), srid=srid))
            t = ts.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad token {t!r} in multipoint")
        return finish(Geometry(MULTIPOINT, parts=parts, srid=srid))
    if name == "MULTILINESTRING":
        ts.expect("(")
        parts = []
        while True:
            parts.append(Geometry(LINESTRING, coords=_parse_coord_seq(ts, ndim), srid=srid))
            t = ts.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad token {t!r} in multilinestring")
        return finish(Geometry(MULTILINESTRING, parts=parts, srid=srid))
    if name == "MULTIPOLYGON":
        ts.expect("(")
        parts = []
        while True:
            ts.expect("(")
            rings = []
            while True:
                rings.append(_parse_coord_seq(ts, ndim))
                t = ts.next()
                if t == ")":
                    break
                if t != ",":
                    raise ValueError(f"bad token {t!r} in multipolygon")
            parts.append(Geometry(POLYGON, rings=rings, srid=srid))
            t = ts.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad token {t!r} in multipolygon")
        return finish(Geometry(MULTIPOLYGON, parts=parts, srid=srid))
    if name == "GEOMETRYCOLLECTION":
        ts.expect("(")
        parts = []
        while True:
            parts.append(_parse_geometry(ts, srid))
            t = ts.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad token {t!r} in collection")
        return finish(Geometry(GEOMETRYCOLLECTION, parts=parts, srid=srid))
    raise ValueError(f"unknown geometry type {name!r}")


def from_wkt(s: str) -> Geometry:
    """Parse WKT with optional leading ``<srsURI>`` literal prefix."""
    srid = DEFAULT_SRID
    m = _SRS_PREFIX.match(s)
    if m:
        srid = srid_from_uri(m.group(1))
        s = s[m.end():]
    return _parse_geometry(_Tokens(s), srid)


# ---- writer -----------------------------------------------------------

def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _fmt_seq(arr, decimals=None) -> str:
    if decimals is None:
        return ", ".join(" ".join(_fmt(v) for v in row) for row in arr)
    return ", ".join(
        " ".join(_fmt(round(v, decimals)) for v in row) for row in arr)


def _dim_tag(g: Geometry) -> str:
    if g.has_z and g.has_m:
        return " ZM"
    if g.has_z:
        return " Z"
    if g.has_m:
        return " M"
    return ""


def to_wkt(g: Geometry, decimals=None) -> str:
    t = g.type
    name = g.type_name.upper()
    tag = _dim_tag(g)
    if g.is_empty:
        return f"{name}{tag} EMPTY"
    if t == POINT:
        return f"{name}{tag} ({_fmt_seq(g.coords.reshape(1, -1), decimals)})"
    if t == LINESTRING:
        return f"{name}{tag} ({_fmt_seq(g.coords, decimals)})"
    if t == POLYGON:
        rings = ", ".join(f"({_fmt_seq(r, decimals)})" for r in g.rings)
        return f"{name}{tag} ({rings})"
    if t == MULTIPOINT:
        pts = ", ".join(f"({_fmt_seq(p.coords.reshape(1, -1), decimals)})" for p in g.parts)
        return f"{name}{tag} ({pts})"
    if t == MULTILINESTRING:
        ls = ", ".join(f"({_fmt_seq(p.coords, decimals)})" for p in g.parts)
        return f"{name}{tag} ({ls})"
    if t == MULTIPOLYGON:
        polys = ", ".join(
            "(" + ", ".join(f"({_fmt_seq(r, decimals)})" for r in p.rings) + ")"
            for p in g.parts)
        return f"{name}{tag} ({polys})"
    inner = ", ".join(to_wkt(p, decimals) for p in g.parts)
    return f"{name}{tag} ({inner})"


def to_wkt_literal(g: Geometry) -> str:
    """WKT with the ``<srsURI>`` prefix convention of the reference."""
    return f"<{uri_from_srid(g.srid)}> {to_wkt(g)}"


# ---- vectorized point fast paths (mirror of wkb.py's) -----------------

def points_to_wkt(x, y):
    """Vector-encode 2D points to a WKT string column ("POINT (x y)")
    with %.17g formatting (exact float64 round-trip) — no per-row
    Python formatting."""
    import numpy as np
    sx = np.char.mod("%.17g", np.asarray(x, dtype=np.float64))
    sy = np.char.mod("%.17g", np.asarray(y, dtype=np.float64))
    s = np.char.add(np.char.add(np.char.add("POINT (", sx), " "),
                    np.char.add(sy, ")"))
    import pyarrow as pa
    return pa.array(s.tolist(), type=pa.string())


_POINT_WKT_RE = r"^\s*POINT\s*\(\s*(?P<x>[^\s)]+)\s+(?P<y>[^\s)]+)\s*\)\s*$"


def wkt_to_points(col):
    """Vector-decode a homogeneous 2D "POINT (x y)" WKT column →
    (x, y) float64 arrays via one RE2 extraction + arrow cast
    (correctly-rounded parse). Returns None if any row doesn't match
    (caller falls back to the generic per-row parser)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(list(col), type=pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    m = pc.extract_regex(col, _POINT_WKT_RE)
    if m.null_count:
        return None
    import numpy as np
    x = pc.cast(pc.struct_field(m, "x"), pa.float64())
    y = pc.cast(pc.struct_field(m, "y"), pa.float64())
    return (x.to_numpy(zero_copy_only=False),
            y.to_numpy(zero_copy_only=False))
