"""Geometry→geometry transform operators (geometry/transform/*.java,
geometry/editor/*.java, linestring/transform/*.java in the reference)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..geom import Geometry, algorithms as alg
from .kernels import decode_geoms, unary_geom
from .registry import register_op


@register_op("st_translate", 3, "transform")
def st_translate(col, dx, dy):
    """Translate.java:25."""
    return unary_geom(col, lambda g: alg.translate(g, dx, dy))


@register_op("st_scale", 3, "transform")
def st_scale(col, sx, sy):
    """Scale.java:28 (stub in reference; PostGIS semantics)."""
    return unary_geom(col, lambda g: alg.scale(g, sx, sy))


@register_op("st_rotate", 2, "transform")
def st_rotate(col, theta):
    """Rotate.java:25 — rotate about origin by theta radians."""
    return unary_geom(col, lambda g: alg.rotate(g, theta))


@register_op("st_affine", 7, "transform")
def st_affine(col, a, b, d, e, xoff, yoff):
    """2D affine (Affine.java:30, PostGIS ST_Affine)."""
    return unary_geom(col, lambda g: alg.affine(g, a, b, d, e, xoff, yoff))


@register_op("st_reverse", 1, "transform")
def st_reverse(col):
    """Reverse.java:28 (golden: LINESTRING(1 2,1 10) → (1 10,1 2))."""
    return unary_geom(col, alg.reverse)


@register_op("st_force2d", 1, "transform")
def st_force2d(col):
    """Force2D.java:19."""
    return unary_geom(col, alg.force_2d)


@register_op("st_normalize", 1, "transform")
def st_normalize(col):
    """Normalize.java:11."""
    return unary_geom(col, alg.normalize)


@register_op("st_simplify", 2, "transform")
def st_simplify(col, tol):
    """Simplify.java:29 — Douglas-Peucker."""
    return unary_geom(col, lambda g: alg.simplify_dp(g, tol))


@register_op("st_simplifyvw", 2, "transform")
def st_simplifyvw(col, area_tol):
    """SimplifyVW.java:17 — Visvalingam-Whyatt."""
    return unary_geom(col, lambda g: alg.simplify_vw(g, area_tol))


@register_op("st_segmentize", 2, "transform")
def st_segmentize(col, max_len):
    """Segmentize.java:36."""
    return unary_geom(col, lambda g: alg.segmentize(g, max_len))


@register_op("st_densify", 2, "transform")
def st_densify(col, frac):
    """Densify.java:14 (densify by fraction of length)."""
    return unary_geom(col, lambda g: alg.densify_by_fraction(g, frac))


@register_op("st_snaptogrid", 2, "transform")
def st_snaptogrid(col, size):
    """SnapToGrid — round coords to grid."""
    return unary_geom(col, lambda g: alg.snap_to_grid(g, size))


@register_op("st_buffer", 2, "transform")
def st_buffer(col, dist):
    """Buffer (engine GeometryWrapper.java:409-450): JTS-semantics
    Minkowski disc sum via capsule union on the overlay engine; negative
    distances erode areal geometries (see algorithms.buffer)."""
    return unary_geom(col, lambda g: alg.buffer(g, dist))


@register_op("st_clipbybox2d", 5, "transform")
def st_clipbybox2d(col, xmin, ymin, xmax, ymax):
    """ClipByBox2D.java:17 — Sutherland-Hodgman rect clip."""
    return unary_geom(col, lambda g: alg.clip_by_rect(g, xmin, ymin, xmax, ymax))


@register_op("st_lineinterpolatepoint", 2, "transform")
def st_lineinterpolatepoint(col, frac):
    """LineInterpolatePoint.java:18."""
    return unary_geom(col, lambda g: alg.line_interpolate_point(g, frac))


@register_op("st_linesubstring", 3, "transform")
def st_linesubstring(col, f0, f1):
    """LineSubstring.java:21."""
    return unary_geom(col, lambda g: alg.line_substring(g, f0, f1))


@register_op("st_linelocatepoint", 2, "transform")
def st_linelocatepoint(col_line, col_pt):
    """LineLocatePoint.java:23 → float fraction."""
    gl = decode_geoms(col_line)
    gp = decode_geoms(col_pt)
    out = np.full(len(gl), np.nan)
    for i, (l, p) in enumerate(zip(gl, gp)):
        if l is not None and p is not None:
            out[i] = alg.line_locate_point(l, p)
    return pa.array(out, type=pa.float64())


@register_op("st_startpoint", 1, "transform")
def st_startpoint(col):
    """linestring/attribute/StartPoint.java:27."""
    def f(g):
        c = g.all_coords()
        return Geometry.point(c[0, 0], c[0, 1], srid=g.srid)
    return unary_geom(col, f)


@register_op("st_endpoint", 1, "transform")
def st_endpoint(col):
    """linestring/attribute/EndPoint.java:30."""
    def f(g):
        c = g.all_coords()
        return Geometry.point(c[-1, 0], c[-1, 1], srid=g.srid)
    return unary_geom(col, f)


@register_op("st_pointn", 2, "transform")
def st_pointn(col, n):
    """PointN.java:32 — 1-based index."""
    def f(g):
        c = g.all_coords()
        return Geometry.point(c[n - 1, 0], c[n - 1, 1], srid=g.srid)
    return unary_geom(col, f)


@register_op("st_exteriorring", 1, "transform")
def st_exteriorring(col):
    """polygon/attribute/ExteriorRing.java:15."""
    def f(g):
        polys = alg._collect(g, (3,))
        if not polys or not polys[0].rings:
            return Geometry.empty(2, g.srid)
        return Geometry(2, coords=polys[0].rings[0].copy(), srid=g.srid)
    return unary_geom(col, f)


@register_op("st_makepoint", 2, "constructor")
def st_makepoint(x_col, y_col):
    """point/constructor/MakePoint.java:34 — vectorized, no Python loop."""
    from ..geom.wkb import points_to_wkb
    x = np.asarray(x_col, dtype=np.float64)
    y = np.asarray(y_col, dtype=np.float64)
    return pa.array(points_to_wkb(x, y), type=pa.binary())


@register_op("st_makeenvelope", 4, "constructor")
def st_makeenvelope(xmin, ymin, xmax, ymax):
    """envelope/constructor/MakeEnvelope.java:18 — vectorized rect WKB."""
    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    from ..geom import to_wkb
    out = []
    for i in range(len(xmin)):
        ring = np.array([[xmin[i], ymin[i]], [xmax[i], ymin[i]],
                         [xmax[i], ymax[i]], [xmin[i], ymax[i]],
                         [xmin[i], ymin[i]]])
        out.append(to_wkb(Geometry(3, rings=[ring])))
    return pa.array(out, type=pa.binary())


@register_op("st_geomfromtext", 1, "constructor")
def st_geomfromtext(col):
    """GeomFromText.java:18 — WKT string column → WKB column."""
    from ..geom import from_wkt, to_wkb
    out = []
    for s in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        if s is None:
            out.append(None)
            continue
        try:
            out.append(to_wkb(from_wkt(s)))
        except ValueError:
            out.append(None)
    return pa.array(out, type=pa.binary())


@register_op("st_astext", 1, "exporter")
def st_astext(col):
    """AsText.java:14 — WKB column → WKT strings."""
    from ..geom import to_wkt
    out = [to_wkt(g) if g is not None else None for g in decode_geoms(col)]
    return pa.array(out, type=pa.string())


@register_op("st_astextround", 2, "exporter")
def st_astextround(col, decimals):
    """AsTextRound.java:18."""
    from ..geom import to_wkt
    out = [to_wkt(g, decimals=decimals) if g is not None else None
           for g in decode_geoms(col)]
    return pa.array(out, type=pa.string())


@register_op("st_asgeojson", 1, "exporter")
def st_asgeojson(col):
    """AsGeoJSON.java:16."""
    import json

    def gj(g):
        t = g.type
        if t == 1:
            return {"type": "Point", "coordinates": list(g.coords[:2 + g.has_z])}
        if t == 2:
            return {"type": "LineString", "coordinates": g.coords.tolist()}
        if t == 3:
            return {"type": "Polygon", "coordinates": [r.tolist() for r in g.rings]}
        if t == 4:
            return {"type": "MultiPoint",
                    "coordinates": [list(p.coords[:2]) for p in g.parts]}
        if t == 5:
            return {"type": "MultiLineString",
                    "coordinates": [p.coords.tolist() for p in g.parts]}
        if t == 6:
            return {"type": "MultiPolygon",
                    "coordinates": [[r.tolist() for r in p.rings] for p in g.parts]}
        return {"type": "GeometryCollection",
                "geometries": [gj(p) for p in g.parts]}

    out = [json.dumps(gj(g)) if g is not None else None for g in decode_geoms(col)]
    return pa.array(out, type=pa.string())


@register_op("st_geomfromgeojson", 1, "constructor")
def st_geomfromgeojson(col):
    """GeomFromGeoJSON.java:16."""
    import json

    from ..geom import to_wkb

    def parse(obj):
        t = obj["type"]
        if t == "Point":
            c = obj["coordinates"]
            return Geometry.point(*c[:3]) if len(c) > 2 else Geometry.point(c[0], c[1])
        if t == "LineString":
            return Geometry.linestring(obj["coordinates"])
        if t == "Polygon":
            return Geometry.polygon(obj["coordinates"])
        if t == "MultiPoint":
            return Geometry.multi(4, [Geometry.point(*c[:2]) for c in obj["coordinates"]])
        if t == "MultiLineString":
            return Geometry.multi(5, [Geometry.linestring(c) for c in obj["coordinates"]])
        if t == "MultiPolygon":
            return Geometry.multi(6, [Geometry.polygon(c) for c in obj["coordinates"]])
        if t == "GeometryCollection":
            return Geometry.multi(7, [parse(g) for g in obj["geometries"]])
        raise ValueError(t)

    out = []
    for s in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        if s is None:
            out.append(None)
        else:
            out.append(to_wkb(parse(json.loads(s))))
    return pa.array(out, type=pa.binary())


@register_op("st_flipcoordinates", 1, "transform")
def st_flipcoordinates(col):
    """FlipCoordinates.java:34 — swap x/y."""
    def f(g):
        def flip(c):
            out = c.copy()
            out[:, 0], out[:, 1] = c[:, 1].copy(), c[:, 0].copy()
            return out
        return g.map_coords(flip)
    return unary_geom(col, f)


@register_op("st_shiftlongitude", 1, "transform")
def st_shiftlongitude(col):
    """ShiftLongitude.java:15 — lon<0 → lon+360."""
    def f(g):
        def shift(c):
            out = c.copy()
            out[:, 0] = np.where(c[:, 0] < 0, c[:, 0] + 360.0, c[:, 0])
            return out
        return g.map_coords(shift)
    return unary_geom(col, f)
