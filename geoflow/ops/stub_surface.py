"""Implementations for the reference's *stubbed* class surface.

Every class here is a stub in the reference (raises
UnsupportedOperationException / "TODO Auto-generated method stub" — see
SURVEY.md Appendix A), so there is no reference behavior to match;
semantics follow the public PostGIS / JTS / MVT / TopoJSON specs the
class names point at, the same policy used for MakeValid and the
cluster family. Reference stub locations are cited per op.

Editors / transforms
    st_wrapx                    geometry/WrapX.java:14
    st_removerepeatedpoints     geometry/editor/RemoveRepeatedPoints.java:21
    st_addmeasure               geometry/editor/AddMeasure.java:10
    st_locatebetween            geometry/LocateBetween.java:7
    st_locatebetweenelevations  geometry/LocateBetweenElevations.java:9
    st_filterbyt                geometry/temporal/FilterByT.java:18
    st_quantizecoordinates      geometry/QuantizeCoordinates.java:7
    st_seteffectivearea         geometry/SetEffectiveArea.java:18
    st_forcelhr / st_forcerhr   geometry/transform/ForceLHR.java:12
    st_forcesfs                 geometry/transform/ForceSFS.java:12
    st_expand                   envelope/transform/Expand.java:6
Predicates / measures
    st_near                     geometry/Near.java:6
    st_bboxfpintersects         envelope/relation/BBOXFPIntersects.java:16
    st_project                  geometry/transform/Project.java:22
    st_longestline3d            geometry/relation/LongestLine3D.java:11
    st_closestpointofapproach   geometry/attribute/ClosestPointOfApproach.java:16
Exporters / constructors
    st_asmvtgeom                geometry/exporter/AsMVTGeom.java:11
    st_astopojson               geometry/exporter/AsTopoJSON.java:9
    st_asdxf                    geometry/exporter/AsDXF.java:6
    st_asgeojsonld              geometry/exporter/AsGeoJSONLD.java:9
    st_geomfromgeohash          geometry/constructor/GeomFromGeoHash.java:18
"""

from __future__ import annotations

import heapq
import json
import math

import numpy as np
import pyarrow as pa

from ..geom import Geometry, algorithms as alg, to_wkb
from ..geom.greatcircle import EARTH_RADIUS_M
from ..geom.types import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING,
                          MULTIPOINT, MULTIPOLYGON, POINT, POLYGON)
from .kernels import binary_bool, decode_geoms, unary_geom
from .registry import register_op


# ---------------------------------------------------------------------------
# shared assembly helpers
# ---------------------------------------------------------------------------

def _leaves(g: Geometry) -> list:
    """Flatten to leaf (non-collection) geometries."""
    if g.parts is not None and g.type in (MULTIPOINT, MULTILINESTRING,
                                          MULTIPOLYGON, GEOMETRYCOLLECTION):
        out = []
        for p in g.parts:
            out.extend(_leaves(p))
        return out
    return [g]


def _assemble(leaves: list, srid: int) -> Geometry:
    """Leaf list → simplest geometry: single leaf as-is, homogeneous set
    as MULTI*, mixed as GEOMETRYCOLLECTION, empty set as empty
    GEOMETRYCOLLECTION."""
    leaves = [g for g in leaves if g is not None and not g.is_empty]
    if not leaves:
        return Geometry.empty(GEOMETRYCOLLECTION, srid)
    if len(leaves) == 1:
        return leaves[0]
    types = {g.type for g in leaves}
    if types == {POINT}:
        return Geometry(MULTIPOINT, parts=leaves, srid=srid,
                        has_z=leaves[0].has_z, has_m=leaves[0].has_m)
    if types == {LINESTRING}:
        return Geometry(MULTILINESTRING, parts=leaves, srid=srid,
                        has_z=leaves[0].has_z, has_m=leaves[0].has_m)
    if types == {POLYGON}:
        return Geometry(MULTIPOLYGON, parts=leaves, srid=srid,
                        has_z=leaves[0].has_z, has_m=leaves[0].has_m)
    return Geometry(GEOMETRYCOLLECTION, parts=leaves, srid=srid)


def _coord_arrays(g: Geometry):
    """Yield every coordinate array of g (points as (1, ndim))."""
    if g.type == POINT:
        if len(g.coords):
            yield g.coords[None, :]
    elif g.type == LINESTRING:
        yield g.coords
    elif g.type == POLYGON:
        yield from g.rings
    else:
        for p in (g.parts or []):
            yield from _coord_arrays(p)


# ---------------------------------------------------------------------------
# ST_WrapX — geometry/WrapX.java:14 (stub); PostGIS ST_WrapX semantics
# ---------------------------------------------------------------------------

def _wrapx_leaf(g: Geometry, wrap: float, move: float) -> list:
    """Split one leaf geometry at the vertical line x=wrap and translate
    the side PostGIS moves: x < wrap when move > 0, x > wrap when
    move < 0. Z/M are dropped on pieces that genuinely cross the line
    (the clip is 2D); untouched / wholly-moved pieces keep all dims."""
    x0, y0, x1, y1 = g.bounds()
    if not np.isfinite(x0):
        return [g]
    moves_left = move > 0          # the side that gets translated
    if (moves_left and x1 <= wrap) or (not moves_left and x0 >= wrap):
        return [alg.translate(g, move, 0.0)]
    if (moves_left and x0 >= wrap) or (not moves_left and x1 <= wrap):
        return [g]
    # crosses the line: split into left / right halves
    pad = max(1.0, (x1 - x0) + (y1 - y0))
    ly0, ly1 = y0 - pad, y1 + pad
    if g.type == POINT:             # bounds degenerate; x==wrap stays put
        return [g]
    if g.type == LINESTRING:
        from .setops import line_poly_clip
        def halfplane(lo, hi):
            ring = np.array([[lo, ly0], [hi, ly0], [hi, ly1],
                             [lo, ly1], [lo, ly0]])
            return Geometry(POLYGON, rings=[ring], srid=g.srid)
        left = line_poly_clip(g, halfplane(x0 - pad, wrap), True)
        right = line_poly_clip(g, halfplane(wrap, x1 + pad), True)
    else:                           # POLYGON
        left = alg.clip_by_rect(g, x0 - pad, ly0, wrap, ly1)
        right = alg.clip_by_rect(g, wrap, ly0, x1 + pad, ly1)
    moved, kept = (left, right) if moves_left else (right, left)
    moved = alg.translate(moved, move, 0.0)
    return _leaves(moved) + _leaves(kept)


@register_op("st_wrapx", 3, "editor")
def st_wrapx(col, wrap, move):
    """geometry/WrapX.java:14 is a reference stub; implements PostGIS
    ST_WrapX(geom, wrap, move): parts on the moving side of x=wrap are
    translated by ``move``; parts crossing the line are split first."""
    def f(g):
        if move == 0 or g.is_empty:
            return g
        out = []
        for leaf in _leaves(g):
            out.extend(_wrapx_leaf(leaf, float(wrap), float(move)))
        return _assemble(out, g.srid)
    return unary_geom(col, f)


# ---------------------------------------------------------------------------
# ST_RemoveRepeatedPoints — geometry/editor/RemoveRepeatedPoints.java:21
# ---------------------------------------------------------------------------

def _dedup_coords(c: np.ndarray, tol: float, ring: bool) -> np.ndarray:
    """Keep a vertex iff its 2D distance to the previously-kept vertex
    exceeds tol (PostGIS semantics); the final vertex of an open line is
    always kept. Collapsing below the structural minimum (2 line pts /
    4 ring pts) returns the input unchanged."""
    n = len(c)
    if n <= 2:
        return c
    t2 = tol * tol
    body = c[:-1] if ring else c
    keep = [0]
    for i in range(1, len(body)):
        d = body[i, :2] - body[keep[-1], :2]
        if d[0] * d[0] + d[1] * d[1] > t2:
            keep.append(i)
    if ring:
        out = np.concatenate([body[keep], body[keep[:1]]], axis=0)
        if len(out) < 4:
            return c
        return out
    if keep[-1] != len(body) - 1:
        keep.append(len(body) - 1)
    out = body[keep]
    return out if len(out) >= 2 else c


@register_op("st_removerepeatedpoints", 2, "editor")
def st_removerepeatedpoints(col, tol=0.0):
    """RemoveRepeatedPoints.java:21 is a reference stub; PostGIS
    semantics with a guard against collapsing below valid arity."""
    def f(g):
        if g.type == LINESTRING:
            return Geometry(LINESTRING, coords=_dedup_coords(g.coords, tol, False),
                            has_z=g.has_z, has_m=g.has_m, srid=g.srid)
        if g.type == POLYGON:
            return Geometry(POLYGON,
                            rings=[_dedup_coords(r, tol, True) for r in g.rings],
                            has_z=g.has_z, has_m=g.has_m, srid=g.srid)
        if g.parts is not None:
            # MULTIPOINT: drop later points within tol of a kept one
            if g.type == MULTIPOINT:
                kept = []
                for p in g.parts:
                    if all(math.hypot(p.coords[0] - q.coords[0],
                                      p.coords[1] - q.coords[1]) > tol
                           for q in kept):
                        kept.append(p)
                return Geometry(MULTIPOINT, parts=kept or g.parts[:1],
                                has_z=g.has_z, has_m=g.has_m, srid=g.srid)
            return Geometry(g.type, parts=[f(p) for p in g.parts],
                            has_z=g.has_z, has_m=g.has_m, srid=g.srid)
        return g
    return unary_geom(col, f)


# ---------------------------------------------------------------------------
# ST_AddMeasure — geometry/editor/AddMeasure.java:10 (stub)
# ---------------------------------------------------------------------------

@register_op("st_addmeasure", 3, "editor")
def st_addmeasure(col, m_start, m_end):
    """AddMeasure.java:10 is a reference stub; PostGIS ST_AddMeasure:
    M linearly interpolated from m_start to m_end along the cumulative
    2D length of the (Multi)LineString (existing M is replaced)."""
    def with_m(c, cum0, total):
        seg = np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1]))
        cum = cum0 + np.concatenate([[0.0], np.cumsum(seg)])
        frac = cum / total if total > 0 else np.zeros(len(c))
        m = m_start + (m_end - m_start) * frac
        return m, cum[-1]

    def f(g):
        parts = g.parts if g.type == MULTILINESTRING else [g]
        if any(p.type != LINESTRING for p in parts):
            raise ValueError("st_addmeasure expects (Multi)LineString")
        total = sum(alg.length(p) for p in parts)
        cum0 = 0.0
        new_parts = []
        for p in parts:
            m, cum0 = with_m(p.coords, cum0, total)
            ndz = 2 + int(p.has_z)
            out = np.empty((len(p.coords), ndz + 1))
            out[:, :ndz] = p.coords[:, :ndz]
            out[:, ndz] = m
            new_parts.append(Geometry(LINESTRING, coords=out, has_z=p.has_z,
                                      has_m=True, srid=g.srid))
        if g.type == MULTILINESTRING:
            return Geometry(MULTILINESTRING, parts=new_parts,
                            has_z=g.has_z, has_m=True, srid=g.srid)
        return new_parts[0]
    return unary_geom(col, f)


# ---------------------------------------------------------------------------
# ST_LocateBetween / ST_LocateBetweenElevations / ST_FilterByT
# geometry/LocateBetween.java:7, LocateBetweenElevations.java:9,
# temporal/FilterByT.java:18 — all reference stubs
# ---------------------------------------------------------------------------

def _ordinate_index(g: Geometry, which: str) -> int:
    if which == "m":
        if not g.has_m:
            raise ValueError("geometry has no M ordinate")
        return 2 + int(g.has_z)
    if not g.has_z:
        raise ValueError("geometry has no Z ordinate")
    return 2


def _locate_between_line(c: np.ndarray, oi: int, lo: float, hi: float):
    """One linestring → (pieces, points) where the tracked ordinate lies
    in [lo, hi]; segment endpoints interpolated at range boundaries."""
    pieces, points = [], []
    cur = None
    for i in range(len(c) - 1):
        v0, v1 = c[i, oi], c[i + 1, oi]
        if v0 == v1:
            t0, t1 = (0.0, 1.0) if lo <= v0 <= hi else (1.0, 0.0)
        else:
            ta = (lo - v0) / (v1 - v0)
            tb = (hi - v0) / (v1 - v0)
            t0, t1 = min(ta, tb), max(ta, tb)
            t0, t1 = max(t0, 0.0), min(t1, 1.0)
        if t1 < t0:
            cur = None
            continue
        p0 = c[i] + t0 * (c[i + 1] - c[i])
        p1 = c[i] + t1 * (c[i + 1] - c[i])
        if t1 == t0:
            points.append(p0)
            cur = None
            continue
        if cur is not None and np.array_equal(cur[-1], p0):
            cur.append(p1)
        else:
            cur = [p0, p1]
            pieces.append(cur)
    return [np.asarray(p) for p in pieces], points


def _locate_between(g: Geometry, lo: float, hi: float, which: str) -> Geometry:
    oi = _ordinate_index(g, which)
    if g.type == POINT:
        ok = lo <= g.coords[oi] <= hi
        return g if ok else Geometry.empty(GEOMETRYCOLLECTION, g.srid)
    if g.type in (MULTIPOINT, MULTILINESTRING, GEOMETRYCOLLECTION):
        return _assemble([_locate_between(p, lo, hi, which)
                          for p in g.parts], g.srid)
    if g.type != LINESTRING:
        raise ValueError("locate_between: puntal/lineal geometry expected")
    pieces, points = _locate_between_line(g.coords, oi, lo, hi)
    leaves = [Geometry(LINESTRING, coords=p, has_z=g.has_z, has_m=g.has_m,
                       srid=g.srid) for p in pieces]
    for pt in points:
        # drop isolated points already covered by a piece endpoint
        if any(np.array_equal(pt, pc[0]) or np.array_equal(pt, pc[-1])
               for pc in pieces):
            continue
        leaves.append(Geometry(POINT, coords=pt.copy(), has_z=g.has_z,
                               has_m=g.has_m, srid=g.srid))
    return _assemble(leaves, g.srid)


@register_op("st_locatebetween", 3, "editor")
def st_locatebetween(col, m_lo, m_hi):
    """LocateBetween.java:7 is a reference stub; PostGIS ST_LocateBetween
    over the M ordinate with boundary interpolation."""
    return unary_geom(col, lambda g: _locate_between(g, m_lo, m_hi, "m"))


@register_op("st_locatebetweenelevations", 3, "editor")
def st_locatebetweenelevations(col, z_lo, z_hi):
    """LocateBetweenElevations.java:9 is a reference stub; PostGIS
    ST_LocateBetweenElevations (Z ordinate)."""
    return unary_geom(col, lambda g: _locate_between(g, z_lo, z_hi, "z"))


@register_op("st_filterbyt", 3, "editor")
def st_filterbyt(col, t_lo, t_hi):
    """temporal/FilterByT.java:18 is a reference stub; with M carrying
    time this is LocateBetween on M (interpolating, unlike the
    vertex-dropping FilterByM)."""
    return unary_geom(col, lambda g: _locate_between(g, t_lo, t_hi, "m"))


# ---------------------------------------------------------------------------
# ST_QuantizeCoordinates — geometry/QuantizeCoordinates.java:7 (stub)
# ---------------------------------------------------------------------------

def _quantize_vals(v: np.ndarray, prec: int) -> np.ndarray:
    """Zero as many low-order mantissa bits as possible while keeping
    |q - v| <= 10^-prec (the documented PostGIS contract). Vectorized:
    k = floor(log2(tol / ulp(v))) bits are cleared, with a safety
    walk-down for boundary cases."""
    tol = 10.0 ** (-prec)
    v = np.asarray(v, dtype=np.float64)
    out = v.copy()
    finite = np.isfinite(v) & (v != 0.0)
    if not finite.any():
        return out
    av = np.abs(v[finite])
    ulp = np.nextafter(av, np.inf) - av
    with np.errstate(divide="ignore", over="ignore"):
        k = np.floor(np.log2(tol / ulp))
    k = np.clip(np.where(np.isfinite(k), k, 0), 0, 52).astype(np.int64)
    bits = v[finite].view(np.int64).copy()
    q = np.where(k > 0, bits & ~((np.int64(1) << k) - 1), bits).view(np.float64)
    bad = np.abs(q - v[finite]) > tol
    while bad.any():
        k = np.where(bad, np.maximum(k - 1, 0), k)
        q = np.where(k > 0, bits & ~((np.int64(1) << k) - 1),
                     bits).view(np.float64)
        bad = (np.abs(q - v[finite]) > tol) & (k > 0)
    out[finite] = q
    return out


@register_op("st_quantizecoordinates", 5, "editor")
def st_quantizecoordinates(col, prec_x, prec_y=None, prec_z=None, prec_m=None):
    """QuantizeCoordinates.java:7 is a reference stub; PostGIS
    ST_QuantizeCoordinates: truncate low mantissa bits so each ordinate
    stays within 10^-prec of its input (better compression, bounded
    error). prec_y/z/m default to prec_x."""
    py = prec_x if prec_y is None else prec_y
    pz = prec_x if prec_z is None else prec_z
    pm = prec_x if prec_m is None else prec_m

    def f(g):
        def q(c):
            c = np.asarray(c, dtype=np.float64).copy()
            c[:, 0] = _quantize_vals(c[:, 0], prec_x)
            c[:, 1] = _quantize_vals(c[:, 1], py)
            extra = [pz] if g.has_z else []
            if g.has_m:
                extra.append(pm)
            for j, p in enumerate(extra, start=2):
                c[:, j] = _quantize_vals(c[:, j], p)
            return c
        return g.map_coords(q)
    return unary_geom(col, f)


# ---------------------------------------------------------------------------
# ST_SetEffectiveArea — geometry/SetEffectiveArea.java:18 (stub)
# ---------------------------------------------------------------------------

_DBL_MAX = np.finfo(np.float64).max


def _effective_areas(c: np.ndarray, ring: bool) -> np.ndarray:
    """Visvalingam–Whyatt effective area per vertex with the monotone
    ("retirement cascade") rule PostGIS uses: a vertex's effective area
    is max(triangle area at removal, largest area retired before it).
    Endpoints (line) / the ring anchor get DBL_MAX."""
    n = len(c)
    eff = np.full(n, _DBL_MAX)
    if n < (4 if ring else 3):
        return eff
    prev = np.arange(n) - 1
    nxt = np.arange(n) + 1
    alive = np.ones(n, dtype=bool)
    if ring:
        alive[-1] = False           # duplicate closing vertex
        interior = range(1, n - 1)
    else:
        interior = range(1, n - 1)

    def tri(i):
        a, b, d = c[prev[i], :2], c[i, :2], c[nxt[i], :2]
        return 0.5 * abs((b[0] - a[0]) * (d[1] - a[1])
                         - (d[0] - a[0]) * (b[1] - a[1]))

    cur = {}
    heap = []
    for i in interior:
        cur[i] = tri(i)
        heapq.heappush(heap, (cur[i], i))
    max_so_far = 0.0
    while heap:
        a, i = heapq.heappop(heap)
        if not alive[i] or i not in cur or cur[i] != a:
            continue
        eff[i] = max(a, max_so_far)
        max_so_far = eff[i]
        alive[i] = False
        del cur[i]
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                cur[j] = tri(j)
                heapq.heappush(heap, (cur[j], j))
    if ring:
        eff[-1] = eff[0]
    return eff


@register_op("st_seteffectivearea", 3, "editor")
def st_seteffectivearea(col, threshold=0.0, set_area=1):
    """SetEffectiveArea.java:18 is a reference stub; PostGIS
    ST_SetEffectiveArea: Visvalingam effective area written into M
    (set_area=1), vertices below ``threshold`` removed (threshold>0).
    Endpoints carry DBL_MAX and always survive."""
    def one(c, has_z, ring):
        c = np.asarray(c)
        eff = _effective_areas(c, ring)
        nd = 2 + int(has_z)
        keep = eff >= threshold if threshold > 0 else np.ones(len(c), bool)
        keep[0] = keep[-1] = True
        if ring and keep.sum() < 4:   # don't collapse a ring below arity
            keep[:] = True
        cc = c[keep]
        if set_area:
            out = np.empty((len(cc), nd + 1))
            out[:, :nd] = cc[:, :nd]
            out[:, nd] = eff[keep]
            return out
        return cc[:, :nd]

    def f(g):
        hm = bool(set_area)
        if g.type == LINESTRING:
            return Geometry(LINESTRING, coords=one(g.coords, g.has_z, False),
                            has_z=g.has_z, has_m=hm, srid=g.srid)
        if g.type == POLYGON:
            return Geometry(POLYGON,
                            rings=[one(r, g.has_z, True) for r in g.rings],
                            has_z=g.has_z, has_m=hm, srid=g.srid)
        if g.parts is not None:
            return Geometry(g.type, parts=[f(p) for p in g.parts],
                            has_z=g.has_z, has_m=hm, srid=g.srid)
        return g
    return unary_geom(col, f)


# ---------------------------------------------------------------------------
# ring-orientation forcing — geometry/transform/ForceLHR.java:12 (stub)
# ---------------------------------------------------------------------------

def _force_orientation(g: Geometry, exterior_ccw: bool) -> Geometry:
    def fix(rings):
        out = []
        for j, r in enumerate(rings):
            sa = alg.ring_signed_area(r)
            want_ccw = exterior_ccw if j == 0 else not exterior_ccw
            if (sa > 0) != want_ccw and sa != 0:
                r = r[::-1].copy()
            out.append(r)
        return out
    if g.type == POLYGON:
        return Geometry(POLYGON, rings=fix(g.rings), has_z=g.has_z,
                        has_m=g.has_m, srid=g.srid)
    if g.parts is not None:
        return Geometry(g.type,
                        parts=[_force_orientation(p, exterior_ccw)
                               for p in g.parts],
                        has_z=g.has_z, has_m=g.has_m, srid=g.srid)
    return g


@register_op("st_forcelhr", 1, "transform")
def st_forcelhr(col):
    """ForceLHR.java:12 is a reference stub; SFCGAL/PostGIS ST_ForceLHR
    (left-hand rule): exterior rings CCW, holes CW."""
    return unary_geom(col, lambda g: _force_orientation(g, True))


@register_op("st_forcerhr", 1, "transform")
def st_forcerhr(col):
    """PostGIS ST_ForceRHR: exterior rings CW, holes CCW (companion of
    st_forcelhr)."""
    return unary_geom(col, lambda g: _force_orientation(g, False))


@register_op("st_forcesfs", 1, "transform")
def st_forcesfs(col):
    """ForceSFS.java:12 is a reference stub; PostGIS ST_ForceSFS maps
    non-SFS-1.1 types (curves, TINs) onto SFS types. This engine's
    value model only contains SFS 1.1 types already, so this validates
    and normalizes ring closure, returning the geometry otherwise
    unchanged."""
    def f(g):
        if g.type == POLYGON:
            rings = []
            for r in g.rings:
                r = np.asarray(r)
                if len(r) and not np.array_equal(r[0], r[-1]):
                    r = np.concatenate([r, r[:1]], axis=0)
                rings.append(r)
            return Geometry(POLYGON, rings=rings, has_z=g.has_z,
                            has_m=g.has_m, srid=g.srid)
        if g.parts is not None:
            return Geometry(g.type, parts=[f(p) for p in g.parts],
                            has_z=g.has_z, has_m=g.has_m, srid=g.srid)
        return g
    return unary_geom(col, f)


# ---------------------------------------------------------------------------
# ST_Expand — envelope/transform/Expand.java:6 (stub)
# ---------------------------------------------------------------------------

@register_op("st_expand", 3, "transform")
def st_expand(col, dx, dy=None):
    """Expand.java:6 is a reference stub; PostGIS ST_Expand: grow the
    bounding box by dx (dy defaults to dx) and return it as a polygon."""
    ddy = dx if dy is None else dy

    def f(g):
        x0, y0, x1, y1 = g.bounds()
        if not np.isfinite(x0):
            return Geometry.empty(POLYGON, g.srid)
        ring = np.array([[x0 - dx, y0 - ddy], [x1 + dx, y0 - ddy],
                         [x1 + dx, y1 + ddy], [x0 - dx, y1 + ddy],
                         [x0 - dx, y0 - ddy]])
        return Geometry(POLYGON, rings=[ring], srid=g.srid)
    return unary_geom(col, f)


# ---------------------------------------------------------------------------
# predicates: ST_Near / BBOXFPIntersects
# ---------------------------------------------------------------------------

@register_op("st_near", 3, "predicate")
def st_near(col_a, col_b, tol):
    """geometry/Near.java:6 is a reference stub; boolean proximity
    predicate distance(a, b) <= tol (== ST_DWithin)."""
    return binary_bool(col_a, col_b, lambda a, b: alg.dwithin(a, b, tol))


_FP_EPS = 1e-9


@register_op("st_bboxfpintersects", 2, "predicate")
def st_bboxfpintersects(col_a, col_b):
    """envelope/relation/BBOXFPIntersects.java:16 is a reference stub
    (62 LoC of commented-out JTS code); floating-point-tolerant bbox
    intersection: each box is expanded by 1e-9 * max(1, |extent|) before
    the interval test, so boxes touching within rounding error count as
    intersecting."""
    def f(a, b):
        ax0, ay0, ax1, ay1 = a.bounds()
        bx0, by0, bx1, by1 = b.bounds()
        if not (np.isfinite(ax0) and np.isfinite(bx0)):
            return False
        scale = max(1.0, abs(ax0), abs(ax1), abs(ay0), abs(ay1),
                    abs(bx0), abs(bx1), abs(by0), abs(by1))
        e = _FP_EPS * scale
        return not (ax1 + e < bx0 - e or bx1 + e < ax0 - e
                    or ay1 + e < by0 - e or by1 + e < ay0 - e)
    return binary_bool(col_a, col_b, f)


# ---------------------------------------------------------------------------
# ST_Project — geometry/transform/Project.java:22 (stub)
# ---------------------------------------------------------------------------

@register_op("st_project", 3, "transform")
def st_project(col, distance_m, azimuth_rad):
    """Project.java:22 is a reference stub; PostGIS ST_Project: forward
    geodesic from a point, here on the IUGG mean sphere
    (EARTH_RADIUS_M, matching the engine's great-circle distances).
    Azimuth in radians clockwise from north."""
    d = float(distance_m) / EARTH_RADIUS_M
    theta = float(azimuth_rad)

    def f(g):
        if g.type != POINT:
            raise ValueError("st_project expects POINT input")
        lon1, lat1 = math.radians(g.coords[0]), math.radians(g.coords[1])
        lat2 = math.asin(math.sin(lat1) * math.cos(d)
                         + math.cos(lat1) * math.sin(d) * math.cos(theta))
        lon2 = lon1 + math.atan2(
            math.sin(theta) * math.sin(d) * math.cos(lat1),
            math.cos(d) - math.sin(lat1) * math.sin(lat2))
        lon2 = (lon2 + math.pi) % (2 * math.pi) - math.pi
        return Geometry.point(math.degrees(lon2), math.degrees(lat2),
                              srid=g.srid)
    return unary_geom(col, f)


# ---------------------------------------------------------------------------
# ST_3DLongestLine — geometry/relation/LongestLine3D.java:11 (stub)
# ---------------------------------------------------------------------------

@register_op("st_longestline3d", 2, "measure")
def st_longestline3d(col_a, col_b):
    """LongestLine3D.java:11 is a reference stub; the farthest pair
    between two geometries is attained at vertices, so this is an exact
    brute-force vertex search returning a LINESTRING Z from a to b."""
    from .ops3d import _coords3d
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = [None] * len(ga)
    for i, (a, b) in enumerate(zip(ga, gb)):
        if a is None or b is None:
            continue
        ca, cb = _coords3d(a), _coords3d(b)
        if not len(ca) or not len(cb):
            continue
        d2 = ((ca[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
        ia, ib = np.unravel_index(np.argmax(d2), d2.shape)
        out[i] = to_wkb(Geometry(LINESTRING,
                                 coords=np.vstack([ca[ia], cb[ib]]),
                                 has_z=True, srid=a.srid))
    return pa.array(out, type=pa.binary())


# ---------------------------------------------------------------------------
# ST_ClosestPointOfApproach
# geometry/attribute/ClosestPointOfApproach.java:16 (stub)
# ---------------------------------------------------------------------------

def _trajectory(g: Geometry):
    """Measured LINESTRING → (m, pos(n,3)); requires strictly
    increasing M (PostGIS valid-trajectory rule). Returns None if not a
    valid trajectory."""
    if g.type != LINESTRING or not g.has_m or len(g.coords) < 2:
        return None
    oi = 2 + int(g.has_z)
    m = g.coords[:, oi]
    if not np.all(np.diff(m) > 0):
        return None
    pos = np.zeros((len(m), 3))
    pos[:, :2] = g.coords[:, :2]
    if g.has_z:
        pos[:, 2] = g.coords[:, 2]
    return m, pos


def cpa_measure(a: Geometry, b: Geometry):
    """Measure t* minimizing |A(t) - B(t)| over the overlapping M range
    (piecewise-linear trajectories → per-interval quadratic, closed
    form). None when either input is not a valid trajectory or the M
    ranges are disjoint."""
    ta, tb = _trajectory(a), _trajectory(b)
    if ta is None or tb is None:
        return None
    ma, pa_ = ta
    mb, pb_ = tb
    lo, hi = max(ma[0], mb[0]), min(ma[-1], mb[-1])
    if lo > hi:
        return None
    ts = np.union1d(ma, mb)
    ts = ts[(ts >= lo) & (ts <= hi)]
    if len(ts) == 0 or ts[0] != lo:
        ts = np.concatenate([[lo], ts])
    if ts[-1] != hi:
        ts = np.concatenate([ts, [hi]])
    A = np.stack([np.interp(ts, ma, pa_[:, k]) for k in range(3)], axis=1)
    B = np.stack([np.interp(ts, mb, pb_[:, k]) for k in range(3)], axis=1)
    D = A - B
    best_d2, best_t = float((D[0] ** 2).sum()), float(ts[0])
    for i in range(len(ts) - 1):
        d0, d1 = D[i], D[i + 1]
        v = d1 - d0
        denom = float(v @ v)
        s = 0.0 if denom == 0.0 else min(max(-float(d0 @ v) / denom, 0.0), 1.0)
        d2 = float(((d0 + s * v) ** 2).sum())
        t = float(ts[i] + s * (ts[i + 1] - ts[i]))
        if d2 < best_d2 - 1e-30 or (abs(d2 - best_d2) <= 1e-30 and t < best_t):
            best_d2, best_t = d2, t
    return best_t


_CPA_TMPL = None


def _cpa_fast(col_a, col_b):
    """Vectorized CPA for the homogeneous case: every row a 2-vertex
    XYM LINESTRING (the common trajectory-pair shape — both segments
    are globally linear in M, so D(t) is linear over the overlap and
    the closed form needs no breakpoint merge). Returns a float64
    numpy array with NaN for invalid/disjoint rows, or None if the
    columns aren't homogeneous (caller falls back to the general
    per-row path)."""
    global _CPA_TMPL
    if _CPA_TMPL is None:
        _CPA_TMPL = to_wkb(Geometry(LINESTRING, coords=np.zeros((2, 3)),
                                    has_m=True))
    tmpl = _CPA_TMPL
    hl = len(tmpl) - 48

    def raw_rows(c):
        """Column → (n, len(tmpl)) uint8 matrix, zero-copy from the
        Arrow buffers when the column is a null-free binary array of
        uniform width; None if the shape doesn't match."""
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if isinstance(c, pa.Array) and pa.types.is_binary(c.type):
            if c.null_count:
                return None
            offs = np.frombuffer(c.buffers()[1], dtype=np.int32)[
                c.offset:c.offset + len(c) + 1]
            if len(offs) < 2 or not (np.diff(offs) == len(tmpl)).all():
                return None
            data = np.frombuffer(c.buffers()[2], dtype=np.uint8)
            return data[offs[0]:offs[-1]].reshape(len(c), len(tmpl))
        bufs = c.to_pylist() if hasattr(c, "to_pylist") else list(c)
        if not bufs or any(b is None or len(b) != len(tmpl) for b in bufs):
            return None
        return np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(
            len(bufs), len(tmpl))

    raw_a = raw_rows(col_a)
    raw_b = raw_rows(col_b)
    if raw_a is None or raw_b is None:
        return None
    n = len(raw_a)
    head = np.frombuffer(tmpl[:hl], dtype=np.uint8)
    if not ((raw_a[:, :hl] == head).all() and (raw_b[:, :hl] == head).all()):
        return None
    A = np.ascontiguousarray(raw_a[:, hl:]).view("<f8").reshape(n, 6)
    B = np.ascontiguousarray(raw_b[:, hl:]).view("<f8").reshape(n, 6)
    ma0, ma1 = A[:, 2], A[:, 5]
    mb0, mb1 = B[:, 2], B[:, 5]
    ok = (ma1 > ma0) & (mb1 > mb0)
    lo = np.maximum(ma0, mb0)
    hi = np.minimum(ma1, mb1)
    ok &= lo <= hi
    with np.errstate(divide="ignore", invalid="ignore"):
        fa0 = (lo - ma0) / (ma1 - ma0)
        fa1 = (hi - ma0) / (ma1 - ma0)
        fb0 = (lo - mb0) / (mb1 - mb0)
        fb1 = (hi - mb0) / (mb1 - mb0)
        dx0 = (A[:, 0] + fa0 * (A[:, 3] - A[:, 0])) \
            - (B[:, 0] + fb0 * (B[:, 3] - B[:, 0]))
        dy0 = (A[:, 1] + fa0 * (A[:, 4] - A[:, 1])) \
            - (B[:, 1] + fb0 * (B[:, 4] - B[:, 1]))
        dx1 = (A[:, 0] + fa1 * (A[:, 3] - A[:, 0])) \
            - (B[:, 0] + fb1 * (B[:, 3] - B[:, 0]))
        dy1 = (A[:, 1] + fa1 * (A[:, 4] - A[:, 1])) \
            - (B[:, 1] + fb1 * (B[:, 4] - B[:, 1]))
        vx, vy = dx1 - dx0, dy1 - dy0
        denom = vx * vx + vy * vy
        s = np.where(denom == 0.0, 0.0,
                     np.clip(-(dx0 * vx + dy0 * vy) / denom, 0.0, 1.0))
    t = lo + s * (hi - lo)
    # tie rule parity with the general path: at s==0 the candidate
    # equals the initial distance, and the earliest t wins — t=lo there
    return np.where(ok, t, np.nan)


@register_op("st_closestpointofapproach", 2, "measure")
def st_closestpointofapproach(col_a, col_b):
    """ClosestPointOfApproach.java:16 is a reference stub; PostGIS
    ST_ClosestPointOfApproach over M-measured trajectories. Columns of
    uniform 2-vertex XYM segments take a fully vectorized closed-form
    path (fast==general equivalence fuzz in tests); everything else
    goes through the per-pair breakpoint merge."""
    fast = _cpa_fast(col_a, col_b)
    if fast is not None:
        return pa.array(fast, type=pa.float64(), from_pandas=True)
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = [None] * len(ga)
    for i, (a, b) in enumerate(zip(ga, gb)):
        if a is not None and b is not None:
            out[i] = cpa_measure(a, b)
    return pa.array(out, type=pa.float64())


# ---------------------------------------------------------------------------
# ST_GeomFromGeoHash — geometry/constructor/GeomFromGeoHash.java:18 (stub)
# ---------------------------------------------------------------------------

def geohash_decode_bbox(gh: str):
    """Geohash → (lon_min, lat_min, lon_max, lat_max)."""
    from .exporters import _GH_IDX
    lat_r = [-90.0, 90.0]
    lon_r = [-180.0, 180.0]
    even = True
    for ch in gh:
        v = _GH_IDX[ch.lower()]
        for shift in (4, 3, 2, 1, 0):
            bit = (v >> shift) & 1
            r = lon_r if even else lat_r
            mid = (r[0] + r[1]) / 2
            if bit:
                r[0] = mid
            else:
                r[1] = mid
            even = not even
    return lon_r[0], lat_r[0], lon_r[1], lat_r[1]


@register_op("st_geomfromgeohash", 2, "constructor")
def st_geomfromgeohash(col, precision=None):
    """GeomFromGeoHash.java:18 is a reference stub; PostGIS
    ST_GeomFromGeoHash: the cell's bounding-box polygon (optional
    precision truncates the hash first)."""
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for s in vals:
        if s is None:
            out.append(None)
            continue
        gh = s if precision is None else s[:precision]
        x0, y0, x1, y1 = geohash_decode_bbox(gh)
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        out.append(to_wkb(Geometry(POLYGON, rings=[ring])))
    return pa.array(out, type=pa.binary())


# ---------------------------------------------------------------------------
# ST_AsMVTGeom — geometry/exporter/AsMVTGeom.java:11 (stub)
# ---------------------------------------------------------------------------

def _mvt_dedup(c: np.ndarray) -> np.ndarray:
    if len(c) < 2:
        return c
    keep = np.ones(len(c), bool)
    keep[1:] = (c[1:] != c[:-1]).any(axis=1)
    return c[keep]


def _mvt_one(g: Geometry, xmin, ymin, xmax, ymax, extent, buf, clip):
    sx = extent / (xmax - xmin)
    sy = extent / (ymax - ymin)

    def tx(c):
        out = np.empty((len(c), 2))
        out[:, 0] = np.rint((c[:, 0] - xmin) * sx)
        out[:, 1] = np.rint((ymax - c[:, 1]) * sy)   # MVT y grows downward
        return out

    lo, hi = -float(buf), float(extent) + float(buf)
    leaves = []
    for leaf in _leaves(g):
        if leaf.type == POINT:
            if not len(leaf.coords):
                continue
            c = tx(leaf.coords[None, :2])[0]
            if clip and not (lo <= c[0] <= hi and lo <= c[1] <= hi):
                continue
            leaves.append(Geometry(POINT, coords=c, srid=0))
        elif leaf.type == LINESTRING:
            work = leaf
            if clip:
                from .setops import line_poly_clip
                rect_geo = _tile_rect_geo(xmin, ymin, xmax, ymax,
                                          extent, buf)
                work = line_poly_clip(leaf, rect_geo, True)
            for piece in _leaves(work):
                if piece.is_empty or len(piece.coords) < 2:
                    continue
                c = _mvt_dedup(tx(piece.coords))
                if len(c) >= 2:
                    leaves.append(Geometry(LINESTRING, coords=c, srid=0))
        elif leaf.type == POLYGON:
            work = leaf
            if clip:
                gx0, gy0, gx1, gy1 = _tile_rect_bounds(
                    xmin, ymin, xmax, ymax, extent, buf)
                work = alg.clip_by_rect(leaf, gx0, gy0, gx1, gy1)
            for piece in _leaves(work):
                if piece.is_empty:
                    continue
                rings = []
                for j, r in enumerate(piece.rings):
                    c = _mvt_dedup(tx(r))
                    if len(c) and not np.array_equal(c[0], c[-1]):
                        c = np.concatenate([c, c[:1]], axis=0)
                    if len(c) < 4:
                        if j == 0:
                            rings = []
                            break
                        continue
                    sa = alg.ring_signed_area(c)
                    if sa == 0:
                        if j == 0:
                            rings = []
                            break
                        continue
                    # MVT: exterior positive shoelace in tile coords
                    want_pos = (j == 0)
                    if (sa > 0) != want_pos:
                        c = c[::-1].copy()
                    rings.append(c)
                if rings:
                    leaves.append(Geometry(POLYGON, rings=rings, srid=0))
    return _assemble(leaves, 0)


def _tile_rect_bounds(xmin, ymin, xmax, ymax, extent, buf):
    """Tile rect (with buffer) in *geographic* coordinates."""
    bx = buf * (xmax - xmin) / extent
    by = buf * (ymax - ymin) / extent
    return xmin - bx, ymin - by, xmax + bx, ymax + by


def _tile_rect_geo(xmin, ymin, xmax, ymax, extent, buf):
    gx0, gy0, gx1, gy1 = _tile_rect_bounds(xmin, ymin, xmax, ymax,
                                           extent, buf)
    ring = np.array([[gx0, gy0], [gx1, gy0], [gx1, gy1], [gx0, gy1],
                     [gx0, gy0]])
    return Geometry(POLYGON, rings=[ring])


@register_op("st_asmvtgeom", 5, "exporter")
def st_asmvtgeom(col, bounds, extent=4096, buffer=256, clip=True):
    """AsMVTGeom.java:11 is a reference stub; PostGIS ST_AsMVTGeom:
    affine-map into tile space (y down), clip to the buffered tile,
    snap to the integer extent grid, drop degenerates and orient
    exterior rings to positive shoelace (MVT spec winding in tile
    coordinates). ``bounds`` = (xmin, ymin, xmax, ymax)."""
    xmin, ymin, xmax, ymax = (float(v) for v in bounds)
    if xmax <= xmin or ymax <= ymin:
        raise ValueError("st_asmvtgeom: invalid bounds")

    def f(g):
        return _mvt_one(g, xmin, ymin, xmax, ymax, int(extent),
                        int(buffer), bool(clip))
    return unary_geom(col, f)


# ---------------------------------------------------------------------------
# ST_AsTopoJSON — geometry/exporter/AsTopoJSON.java:9 (stub)
# ---------------------------------------------------------------------------

def _topo_obj(g: Geometry, arcs: list):
    def add_arc(coords):
        arcs.append([[float(x), float(y)] for x, y in np.asarray(coords)[:, :2]])
        return len(arcs) - 1

    t = g.type
    if t == POINT:
        return {"type": "Point", "coordinates":
                [float(v) for v in g.coords[:2]]}
    if t == LINESTRING:
        return {"type": "LineString", "arcs": [add_arc(g.coords)]}
    if t == POLYGON:
        return {"type": "Polygon", "arcs": [[add_arc(r)] for r in g.rings]}
    if t == MULTIPOINT:
        return {"type": "MultiPoint", "coordinates":
                [[float(v) for v in p.coords[:2]] for p in g.parts]}
    if t == MULTILINESTRING:
        return {"type": "MultiLineString",
                "arcs": [[add_arc(p.coords)] for p in g.parts]}
    if t == MULTIPOLYGON:
        return {"type": "MultiPolygon",
                "arcs": [[[add_arc(r)] for r in p.rings] for p in g.parts]}
    return {"type": "GeometryCollection",
            "geometries": [_topo_obj(p, arcs) for p in (g.parts or [])]}


@register_op("st_astopojson", 1, "exporter")
def st_astopojson(col):
    """AsTopoJSON.java:9 is a reference stub; emits a non-quantized
    single-object TopoJSON Topology (absolute arc positions are valid
    when no "transform" member is present — TopoJSON spec §2.1.1)."""
    out = []
    for g in decode_geoms(col):
        if g is None:
            out.append(None)
            continue
        arcs = []
        obj = _topo_obj(g, arcs)
        topo = {"type": "Topology", "objects": {"geom": obj}, "arcs": arcs}
        out.append(json.dumps(topo, separators=(",", ":")))
    return pa.array(out, type=pa.string())


def _topo_decode_arcs(topo: dict) -> list:
    """Topology arcs → list of float (n, 2) coordinate arrays. With a
    "transform" member, arc positions are delta-encoded quantized
    integers (first absolute, rest deltas — TopoJSON spec §2.1.1/2.2):
    cumsum then scale+translate; without one, positions are absolute."""
    tr = topo.get("transform")
    out = []
    for arc in topo.get("arcs", []):
        a = np.asarray(arc, dtype=np.float64)
        if a.ndim != 2:
            a = a.reshape(0, 2)
        if tr is not None:
            a = np.cumsum(a, axis=0)
            a = a * np.asarray(tr["scale"], dtype=np.float64)[:a.shape[1]] \
                + np.asarray(tr["translate"], dtype=np.float64)[:a.shape[1]]
        out.append(a[:, :2])
    return out


def _topo_position(c, tr):
    x, y = float(c[0]), float(c[1])
    if tr is not None:
        x = x * tr["scale"][0] + tr["translate"][0]
        y = y * tr["scale"][1] + tr["translate"][1]
    return x, y


def _topo_stitch(arc_ids, arcs: list) -> np.ndarray:
    """Arc index list → stitched coordinate array. Negative index ~i
    selects arc i reversed (ones' complement per spec §2.1.4); stitched
    arcs share endpoints, so every arc after the first drops its first
    position."""
    parts = []
    for i, aid in enumerate(arc_ids):
        a = arcs[aid] if aid >= 0 else arcs[~aid][::-1]
        parts.append(a if i == 0 else a[1:])
    return np.vstack(parts) if parts else np.empty((0, 2))


def _topo_parse(obj: dict, arcs: list, tr):
    t = obj.get("type")
    if t == "Point":
        return Geometry.point(*_topo_position(obj["coordinates"], tr))
    if t == "MultiPoint":
        return Geometry.multi(MULTIPOINT, [
            Geometry.point(*_topo_position(c, tr))
            for c in obj["coordinates"]])
    if t == "LineString":
        return Geometry.linestring(_topo_stitch(obj["arcs"], arcs))
    if t == "MultiLineString":
        return Geometry.multi(MULTILINESTRING, [
            Geometry.linestring(_topo_stitch(ids, arcs))
            for ids in obj["arcs"]])
    if t == "Polygon":
        return Geometry.polygon([_topo_stitch(ids, arcs)
                                 for ids in obj["arcs"]])
    if t == "MultiPolygon":
        return Geometry.multi(MULTIPOLYGON, [
            Geometry.polygon([_topo_stitch(ids, arcs) for ids in rings])
            for rings in obj["arcs"]])
    if t == "GeometryCollection":
        return Geometry.multi(GEOMETRYCOLLECTION, [
            _topo_parse(g, arcs, tr)
            for g in obj.get("geometries", [])])
    raise ValueError(f"topojson: unknown geometry type {t!r}")


@register_op("st_geomfromtopojson", 1, "constructor")
def st_geomfromtopojson(col):
    """TopoJSON Topology string → geometry WKB, pairing st_astopojson
    (the reference's TopoJSONDatatype reads; its AsTopoJSON exporter is
    a stub). Full spec surface: quantized (transform + delta-encoded
    arcs) and absolute topologies, reversed-arc ~i indices, multi-arc
    stitching, all seven geometry types. A topology with ONE object
    yields that object's geometry; several become a collection."""
    out = []
    for s in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        if s is None:
            out.append(None)
            continue
        topo = json.loads(s)
        if topo.get("type") != "Topology":
            raise ValueError("topojson: not a Topology object")
        arcs = _topo_decode_arcs(topo)
        tr = topo.get("transform")
        geoms = [_topo_parse(o, arcs, tr)
                 for _, o in sorted(topo.get("objects", {}).items())]
        if not geoms:
            g = Geometry.empty(GEOMETRYCOLLECTION, 0)
        elif len(geoms) == 1:
            g = geoms[0]
        else:
            g = Geometry.multi(GEOMETRYCOLLECTION, geoms)
        out.append(to_wkb(g))
    return pa.array(out, type=pa.binary())


# ---------------------------------------------------------------------------
# ST_AsDXF — geometry/exporter/AsDXF.java:6 (stub)
# ---------------------------------------------------------------------------

def _dxf_num(v: float) -> str:
    return format(float(v), ".17g")


def _dxf_entity(g: Geometry, rows: list):
    t = g.type
    if t == POINT and len(g.coords):
        rows += ["0", "POINT", "8", "0",
                 "10", _dxf_num(g.coords[0]), "20", _dxf_num(g.coords[1])]
        if g.has_z:
            rows += ["30", _dxf_num(g.coords[2])]
    elif t == LINESTRING:
        _dxf_polyline(g.coords, False, g.has_z, rows)
    elif t == POLYGON:
        for r in g.rings:
            _dxf_polyline(np.asarray(r)[:-1], True, g.has_z, rows)
    else:
        for p in (g.parts or []):
            _dxf_entity(p, rows)


def _dxf_polyline(coords, closed, has_z, rows):
    rows += ["0", "POLYLINE", "8", "0", "66", "1",
             "70", "1" if closed else "0"]
    for c in np.asarray(coords):
        rows += ["0", "VERTEX", "8", "0",
                 "10", _dxf_num(c[0]), "20", _dxf_num(c[1])]
        if has_z:
            rows += ["30", _dxf_num(c[2])]
    rows += ["0", "SEQEND"]


@register_op("st_asdxf", 1, "exporter")
def st_asdxf(col):
    """AsDXF.java:6 is a reference stub; minimal DXF R12 ASCII document
    (ENTITIES section only: POINT / POLYLINE+VERTEX, closed flag 70=1
    for polygon rings)."""
    out = []
    for g in decode_geoms(col):
        if g is None:
            out.append(None)
            continue
        rows = ["0", "SECTION", "2", "ENTITIES"]
        _dxf_entity(g, rows)
        rows += ["0", "ENDSEC", "0", "EOF"]
        out.append("\n".join(rows) + "\n")
    return pa.array(out, type=pa.string())


# ---------------------------------------------------------------------------
# ST_AsGeoJSONLD — geometry/exporter/AsGeoJSONLD.java:9 (stub)
# ---------------------------------------------------------------------------

_GEOJSON_LD_CONTEXT = "https://geojson.org/geojson-ld/geojson-context.jsonld"


@register_op("st_asgeojsonld", 1, "exporter")
def st_asgeojsonld(col):
    """AsGeoJSONLD.java:9 is a reference stub; GeoJSON-LD = GeoJSON with
    the published @context (geojson-ld spec)."""
    from .registry import get_op
    gj = get_op("st_asgeojson").fn(col)
    out = []
    for s in gj.to_pylist():
        if s is None:
            out.append(None)
            continue
        obj = json.loads(s)
        out.append(json.dumps({"@context": _GEOJSON_LD_CONTEXT, **obj},
                              separators=(",", ":")))
    return pa.array(out, type=pa.string())


# ---------------------------------------------------------------------------
# ST_StraightSkeleton — geometry/transform/StraightSkeleton.java:33 (stub)
# ---------------------------------------------------------------------------

@register_op("st_straightskeleton", 1, "transform")
def st_straightskeleton(col):
    """StraightSkeleton.java:33 is a reference stub; implements the
    published straight-skeleton definition (Aichholzer et al. 1995) via
    the Felkel–Obdržálek wavefront event queue (geom/skeleton.py) and
    returns the arcs as a MULTILINESTRING, matching the
    PostGIS-SFCGAL ST_StraightSkeleton output shape. Holes are not
    supported (wavefront merging not implemented) — a clear error, not
    a wrong answer."""
    from ..geom.skeleton import straight_skeleton_arcs

    def f(g):
        rings = []
        if g.type == POLYGON:
            if len(g.rings) > 1:
                raise ValueError("st_straightskeleton: holes not supported")
            rings = g.rings[:1]
        elif g.type == MULTIPOLYGON:
            for p in g.parts:
                if len(p.rings) > 1:
                    raise ValueError(
                        "st_straightskeleton: holes not supported")
                rings.extend(p.rings[:1])
        else:
            raise ValueError("st_straightskeleton expects areal input")
        parts = []
        for r in rings:
            for p, q in straight_skeleton_arcs(np.asarray(r)):
                parts.append(Geometry(LINESTRING,
                                      coords=np.vstack([p, q]),
                                      srid=g.srid))
        if not parts:
            return Geometry.empty(MULTILINESTRING, g.srid)
        return Geometry(MULTILINESTRING, parts=parts, srid=g.srid)
    return unary_geom(col, f)
