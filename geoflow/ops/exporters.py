"""Geometry exporters/constructors beyond WKT/WKB/GeoJSON
(geometry/exporter/*.java, point|linestring|polygon constructors)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import Geometry, algorithms as alg
from .kernels import decode_geoms, unary_geom
from .registry import register_op

# ---------------------------------------------------------------------------
# GeoHash (PointFromGeoHash.java:20 / GeomFromGeoHash — stub in reference,
# standard public algorithm here)
# ---------------------------------------------------------------------------

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_IDX = {c: i for i, c in enumerate(_GH32)}


def geohash_encode(lon: float, lat: float, precision: int = 12) -> str:
    lat_r = [-90.0, 90.0]
    lon_r = [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            if lon >= mid:
                bits.append(1)
                lon_r[0] = mid
            else:
                bits.append(0)
                lon_r[1] = mid
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat >= mid:
                bits.append(1)
                lat_r[0] = mid
            else:
                bits.append(0)
                lat_r[1] = mid
        even = not even
    out = []
    for i in range(0, len(bits), 5):
        v = 0
        for b in bits[i:i + 5]:
            v = (v << 1) | b
        out.append(_GH32[v])
    return "".join(out)


def geohash_decode(gh: str):
    """→ (lon, lat) cell center."""
    lat_r = [-90.0, 90.0]
    lon_r = [-180.0, 180.0]
    even = True
    for c in gh:
        v = _GH_IDX[c.lower()]
        for shift in (4, 3, 2, 1, 0):
            bit = (v >> shift) & 1
            r = lon_r if even else lat_r
            mid = (r[0] + r[1]) / 2
            if bit:
                r[0] = mid
            else:
                r[1] = mid
            even = not even
    return (lon_r[0] + lon_r[1]) / 2, (lat_r[0] + lat_r[1]) / 2


@register_op("st_geohash", 2, "exporter")
def st_geohash(col, precision=12):
    """Geometry centroid → geohash string."""
    out = []
    for g in decode_geoms(col):
        if g is None or g.is_empty:
            out.append(None)
            continue
        cx, cy = alg.centroid(g)
        out.append(geohash_encode(cx, cy, precision))
    return pa.array(out, type=pa.string())


@register_op("st_pointfromgeohash", 1, "constructor")
def st_pointfromgeohash(col):
    """PointFromGeoHash.java:20."""
    from ..geom import to_wkb
    out = []
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    for s in vals:
        if s is None:
            out.append(None)
            continue
        lon, lat = geohash_decode(s)
        out.append(to_wkb(Geometry.point(lon, lat)))
    return pa.array(out, type=pa.binary())


# ---------------------------------------------------------------------------
# Encoded polyline (Google polyline-5; LineFromEncodedPolyline.java:17 /
# AsEncodedPolyline.java:16)
# ---------------------------------------------------------------------------

def polyline_encode(coords: np.ndarray, precision: int = 5) -> str:
    factor = 10 ** precision
    out = []
    prev = (0, 0)
    for x, y in coords[:, :2]:
        lat_i = round(y * factor)
        lon_i = round(x * factor)
        for v in (lat_i - prev[0], lon_i - prev[1]):
            v = ~(v << 1) if v < 0 else (v << 1)
            while v >= 0x20:
                out.append(chr((0x20 | (v & 0x1F)) + 63))
                v >>= 5
            out.append(chr(v + 63))
        prev = (lat_i, lon_i)
    return "".join(out)


def polyline_decode(s: str, precision: int = 5) -> np.ndarray:
    factor = 10 ** precision
    coords = []
    idx = lat = lon = 0
    while idx < len(s):
        for which in (0, 1):
            shift = result = 0
            while True:
                b = ord(s[idx]) - 63
                idx += 1
                result |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            delta = ~(result >> 1) if result & 1 else result >> 1
            if which == 0:
                lat += delta
            else:
                lon += delta
        coords.append((lon / factor, lat / factor))
    return np.array(coords)


@register_op("st_asencodedpolyline", 1, "exporter")
def st_asencodedpolyline(col):
    """AsEncodedPolyline.java:16."""
    out = []
    for g in decode_geoms(col):
        out.append(None if g is None else polyline_encode(g.all_coords()))
    return pa.array(out, type=pa.string())


@register_op("st_linefromencodedpolyline", 1, "constructor")
def st_linefromencodedpolyline(col):
    """LineFromEncodedPolyline.java:17."""
    from ..geom import to_wkb
    out = []
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    for s in vals:
        if s is None:
            out.append(None)
        else:
            out.append(to_wkb(Geometry.linestring(polyline_decode(s))))
    return pa.array(out, type=pa.string()).cast(pa.binary()) \
        if out and isinstance(out[0], str) else pa.array(out, type=pa.binary())


# ---------------------------------------------------------------------------
# markup exporters (KML/GML/SVG/GPX/LatLonText/OSM link/GeoURI)
# ---------------------------------------------------------------------------

def _coords_str(c, sep=",", pair_sep=" "):
    return pair_sep.join(f"{p[0]!r}{sep}{p[1]!r}" for p in c)


@register_op("st_askml", 1, "exporter")
def st_askml(col):
    """AsKML.java:14."""
    def kml(g):
        if g.type == 1:
            return (f"<Point><coordinates>{g.coords[0]!r},{g.coords[1]!r}"
                    f"</coordinates></Point>")
        if g.type == 2:
            return (f"<LineString><coordinates>{_coords_str(g.coords)}"
                    f"</coordinates></LineString>")
        if g.type == 3:
            rings = [f"<outerBoundaryIs><LinearRing><coordinates>"
                     f"{_coords_str(g.rings[0])}</coordinates></LinearRing>"
                     f"</outerBoundaryIs>"]
            for h in g.rings[1:]:
                rings.append(f"<innerBoundaryIs><LinearRing><coordinates>"
                             f"{_coords_str(h)}</coordinates></LinearRing>"
                             f"</innerBoundaryIs>")
            return f"<Polygon>{''.join(rings)}</Polygon>"
        inner = "".join(kml(p) for p in (g.parts or []))
        return f"<MultiGeometry>{inner}</MultiGeometry>"

    out = [kml(g) if g is not None else None for g in decode_geoms(col)]
    return pa.array(out, type=pa.string())


@register_op("st_asgml", 1, "exporter")
def st_asgml(col):
    """AsGML.java:15 (GML3 subset)."""
    def gml(g):
        if g.type == 1:
            return (f'<gml:Point><gml:pos>{g.coords[0]!r} {g.coords[1]!r}'
                    f'</gml:pos></gml:Point>')
        if g.type == 2:
            pos = " ".join(f"{p[0]!r} {p[1]!r}" for p in g.coords)
            return (f'<gml:LineString><gml:posList>{pos}</gml:posList>'
                    f'</gml:LineString>')
        if g.type == 3:
            ext = " ".join(f"{p[0]!r} {p[1]!r}" for p in g.rings[0])
            s = (f'<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>'
                 f'{ext}</gml:posList></gml:LinearRing></gml:exterior>')
            for h in g.rings[1:]:
                hp = " ".join(f"{p[0]!r} {p[1]!r}" for p in h)
                s += (f'<gml:interior><gml:LinearRing><gml:posList>{hp}'
                      f'</gml:posList></gml:LinearRing></gml:interior>')
            return s + "</gml:Polygon>"
        inner = "".join(gml(p) for p in (g.parts or []))
        return f"<gml:MultiGeometry>{inner}</gml:MultiGeometry>"

    out = [gml(g) if g is not None else None for g in decode_geoms(col)]
    return pa.array(out, type=pa.string())


@register_op("st_assvg", 1, "exporter")
def st_assvg(col):
    """AsSVG.java:14 — path data (y negated, SVG axis convention)."""
    def svg(g):
        if g.type == 1:
            return f"cx=\"{g.coords[0]!r}\" cy=\"{-g.coords[1]!r}\""
        def path(c, close):
            parts = [f"M {c[0][0]!r} {-c[0][1]!r}"]
            parts += [f"L {p[0]!r} {-p[1]!r}" for p in c[1:]]
            if close:
                parts.append("Z")
            return " ".join(parts)
        if g.type == 2:
            return path(g.coords, False)
        if g.type == 3:
            return " ".join(path(r[:-1], True) for r in g.rings)
        return " ".join(svg(p) for p in (g.parts or []))

    out = [svg(g) if g is not None else None for g in decode_geoms(col)]
    return pa.array(out, type=pa.string())


@register_op("st_aslatlontext", 1, "exporter")
def st_aslatlontext(col):
    """AsLatLonText.java:12 — DMS string of a point."""
    def dms(v, pos, neg):
        h = pos if v >= 0 else neg
        v = abs(v)
        d = int(v)
        m = int((v - d) * 60)
        s = (v - d - m / 60) * 3600
        return f"{d}°{m}'{s:.3f}\"{h}"

    out = []
    for g in decode_geoms(col):
        if g is None or g.type != 1 or g.is_empty:
            out.append(None)
        else:
            out.append(f"{dms(g.coords[1], 'N', 'S')} "
                       f"{dms(g.coords[0], 'E', 'W')}")
    return pa.array(out, type=pa.string())


@register_op("st_asosmlink", 1, "exporter")
def st_asosmlink(col):
    """AsOSMLink.java:13."""
    out = []
    for g in decode_geoms(col):
        if g is None or g.is_empty:
            out.append(None)
            continue
        cx, cy = alg.centroid(g)
        out.append(f"https://www.openstreetmap.org/#map=12/{cy!r}/{cx!r}")
    return pa.array(out, type=pa.string())


@register_op("st_asgeouri", 1, "exporter")
def st_asgeouri(col):
    """AsGeoURI.java:15 — RFC 5870."""
    out = []
    for g in decode_geoms(col):
        if g is None or g.is_empty:
            out.append(None)
            continue
        cx, cy = alg.centroid(g)
        out.append(f"geo:{cy!r},{cx!r}")
    return pa.array(out, type=pa.string())


@register_op("st_asgpx", 1, "exporter")
def st_asgpx(col):
    """AsGPX.java:12."""
    def gpx(g):
        if g.type == 1:
            return f'<wpt lat="{g.coords[1]!r}" lon="{g.coords[0]!r}"/>'
        if g.type == 2:
            pts = "".join(f'<trkpt lat="{p[1]!r}" lon="{p[0]!r}"/>'
                          for p in g.coords)
            return f"<trk><trkseg>{pts}</trkseg></trk>"
        pts = "".join(f'<rtept lat="{p[1]!r}" lon="{p[0]!r}"/>'
                      for p in g.all_coords())
        return f"<rte>{pts}</rte>"

    out = [gpx(g) if g is not None else None for g in decode_geoms(col)]
    return pa.array(out, type=pa.string())


@register_op("st_astwkb", 2, "exporter")
def st_astwkb(col, precision=7):
    """AsTWKB.java:19 — TWKB binary (verified vs the published spec
    vector; see geom/twkb.py)."""
    from ..geom.twkb import to_twkb
    out = [to_twkb(g, precision) if g is not None else None
           for g in decode_geoms(col)]
    return pa.array(out, type=pa.binary())


@register_op("st_geomfromtwkb", 1, "constructor")
def st_geomfromtwkb(col):
    """TWKB → geometry (TWKBDatatype in the reference)."""
    from ..geom import to_wkb
    from ..geom.twkb import from_twkb
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = [to_wkb(from_twkb(b)) if b is not None else None for b in vals]
    return pa.array(out, type=pa.binary())


@register_op("st_dump", 1, "exporter")
def st_dump(col):
    """Dump.java:28 — list<wkb> of component geometries."""
    from ..geom import to_wkb
    out = []
    for g in decode_geoms(col):
        if g is None:
            out.append(None)
        elif g.parts is not None:
            out.append([to_wkb(p) for p in g.parts])
        else:
            out.append([to_wkb(g)])
    return pa.array(out, type=pa.list_(pa.binary()))


@register_op("st_dumppoints", 1, "exporter")
def st_dumppoints(col):
    """DumpPoints.java:29 — list<wkb> of every vertex as a point."""
    from ..geom import to_wkb
    out = []
    for g in decode_geoms(col):
        if g is None:
            out.append(None)
        else:
            out.append([to_wkb(Geometry.point(c[0], c[1], srid=g.srid))
                        for c in g.all_coords()])
    return pa.array(out, type=pa.list_(pa.binary()))
