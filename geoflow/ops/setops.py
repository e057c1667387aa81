"""Per-row geometry set operations (GeometryWrapper union :808 /
intersection :755 / difference :715 / symDifference :794).

General polygon booleans (incl. concave∩concave, holes, multipolygons)
run on the planar-overlay engine in geom/clipping.py; the convex
Sutherland-Hodgman path is kept as a fast path for convex clip shapes.
Dimension collapse follows JTS (edge-adjacent polygons intersect in a
LINESTRING, corner-touching in a POINT)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import Geometry, algorithms as alg
from ..geom.clipping import polygon_overlay, unary_union_polygons
from .kernels import binary_geom, decode_geoms
from .registry import register_op


def convex_clip(subject: Geometry, clip: Geometry) -> Geometry:
    """Sutherland-Hodgman clip of `subject` polygon by CONVEX `clip`
    polygon — exact when clip is convex."""
    crings = clip.rings if clip.type == 3 else clip.parts[0].rings
    cring = crings[0][:-1, :2]
    if alg.ring_signed_area(np.vstack([cring, cring[:1]])) < 0:
        cring = cring[::-1]

    def clip_ring(ring):
        poly = [tuple(p[:2]) for p in ring[:-1]]
        n = len(cring)
        for e in range(n):
            if not poly:
                return None
            a = cring[e]
            b = cring[(e + 1) % n]
            out = []
            for i in range(len(poly)):
                cur = np.array(poly[i])
                prev = np.array(poly[i - 1])
                side_cur = (b[0] - a[0]) * (cur[1] - a[1]) - (b[1] - a[1]) * (cur[0] - a[0])
                side_prev = (b[0] - a[0]) * (prev[1] - a[1]) - (b[1] - a[1]) * (prev[0] - a[0])

                def isect():
                    d = prev - cur
                    e_ = b - a
                    denom = e_[0] * d[1] - e_[1] * d[0]
                    if denom == 0:
                        return tuple(cur)
                    t = (e_[0] * (a[1] - cur[1]) - e_[1] * (a[0] - cur[0])) / denom
                    return tuple(cur + t * d)

                if side_cur >= 0:
                    if side_prev < 0:
                        out.append(isect())
                    out.append(tuple(cur))
                elif side_prev >= 0:
                    out.append(isect())
            poly = out
        if len(poly) < 3:
            return None
        return np.array(poly + [poly[0]])

    rings = []
    for p in alg._collect(subject, (3,)):
        r = clip_ring(p.rings[0])
        if r is not None:
            rings.append(r)
    if not rings:
        return Geometry.empty(3, subject.srid)
    if len(rings) == 1:
        return Geometry(3, rings=rings, srid=subject.srid)
    return Geometry.multi(6, [Geometry(3, rings=[r], srid=subject.srid)
                              for r in rings], srid=subject.srid)


def _rect_fast(a, b, op):
    """Axis-aligned pair → boolean geometry via the rectilinear tracer,
    or None (not axis-aligned / degenerate contact needs the overlay)."""
    from ..geom.rectilinear import axis_aligned_rings, rect_boolean_geometry
    ra = axis_aligned_rings(a)
    if ra is None:
        return None
    rb = axis_aligned_rings(b)
    if rb is None:
        return None
    return rect_boolean_geometry(ra, rb, op, srid=a.srid)


@register_op("st_intersection", 2, "setop")
def st_intersection(col_a, col_b):
    """Intersection (GeometryWrapper.java:755). Areal×areal runs the
    general overlay (concave, holes, multi all exact); the convex
    Sutherland-Hodgman clip is kept as a fast path. Point operands keep
    the trivial membership path; line×polygon clips the line."""
    def f(a, b):
        if a.type in (3, 6) and b.type in (3, 6):
            g = _rect_fast(a, b, "intersection")
            if g is not None:
                return g
            # fast path: clip shape convex → Sutherland-Hodgman
            bc = alg.convex_hull(b)
            if abs(alg.area(bc) - alg.area(b)) <= 1e-12 * max(1.0, alg.area(b)):
                res = convex_clip(a, bc if bc.type == 3 else b)
                if not res.is_empty and alg.area(res) > 0.0:
                    return res
                # zero-area clip: operands touch along an edge/point —
                # delegate to the overlay for JTS dimension collapse
                return polygon_overlay(a, b, "intersection")
            return polygon_overlay(a, b, "intersection")
        if a.type == 1:
            return a if alg.intersects(a, b) else Geometry.empty(1, a.srid)
        if b.type == 1:
            return b if alg.intersects(a, b) else Geometry.empty(1, a.srid)
        if a.type in (2, 5) and b.type in (3, 6):
            return line_poly_clip(a, b, inside=True)
        if b.type in (2, 5) and a.type in (3, 6):
            return line_poly_clip(b, a, inside=True)
        x0, y0, x1, y1 = b.bounds()
        try:
            return alg.clip_by_rect(a, x0, y0, x1, y1)
        except NotImplementedError:
            return Geometry.empty(a.type, a.srid)
    return binary_geom(col_a, col_b, f)


def _difference_one(a, b):
    """A − B for one geometry pair (shared by st_difference and the
    mixed-dimension st_symdifference path)."""
    if a.type in (3, 6) and b.type in (3, 6):
        g = _rect_fast(a, b, "difference")
        if g is not None:
            return g
        return polygon_overlay(a, b, "difference")
    if a.type in (2, 5) and b.type in (3, 6):
        return line_poly_clip(a, b, inside=False)
    if a.type == 1:
        return Geometry.empty(1, a.srid) if alg.intersects(a, b) else a
    # B of lower dimension than A cannot remove area/length
    return a


@register_op("st_difference", 2, "setop")
def st_difference(col_a, col_b):
    """Difference (GeometryWrapper.java:715, Difference.java:18): parts
    of A not in B. Areal×areal via the overlay; line−polygon clips the
    line to B's exterior; lower-dim B leaves areal A unchanged (JTS)."""
    return binary_geom(col_a, col_b, _difference_one)


@register_op("st_symdifference", 2, "setop")
def st_symdifference(col_a, col_b):
    """Symmetric difference (GeometryWrapper.java:794)."""
    def f(a, b):
        if a.type in (3, 6) and b.type in (3, 6):
            g = _rect_fast(a, b, "symdifference")
            if g is not None:
                return g
            return polygon_overlay(a, b, "symdifference")
        # mixed dims: JTS symDifference = union of the two differences
        # (NOT the raw union of operands — a point inside the polygon
        # and a line's inside portion must be dropped)
        da = _difference_one(a, b)
        db = _difference_one(b, a)
        parts = []
        for g in (da, db):
            if g.is_empty:
                continue
            parts.extend(g.parts if g.parts is not None else [g])
        if not parts:
            return Geometry.empty(7, a.srid)
        if len(parts) == 1:
            return parts[0]
        return Geometry.multi(7, parts, srid=a.srid)
    return binary_geom(col_a, col_b, f)


def line_poly_clip(line: Geometry, poly: Geometry, inside: bool) -> Geometry:
    """Clip a (multi)linestring to a polygon's interior (inside=True) or
    exterior (inside=False): node line segments at polygon boundary
    crossings, keep subsegments by midpoint membership."""
    from ..geom.clipping import _even_odd_many, _poly_rings
    rings = _poly_rings(poly)
    segs_p = []
    for r in rings:
        segs_p.append(np.concatenate([r[:-1, :2], r[1:, :2]], axis=1))
    sp = np.concatenate(segs_p, axis=0) if segs_p else np.empty((0, 4))
    pieces = []
    for part in (line.parts if line.parts is not None else [line]):
        c = part.coords[:, :2]
        for i in range(len(c) - 1):
            a0, a1 = c[i], c[i + 1]
            d = a1 - a0
            ts = [0.0, 1.0]
            if len(sp):
                e = sp[:, 2:4] - sp[:, 0:2]
                denom = d[0] * e[:, 1] - d[1] * e[:, 0]
                w0 = sp[:, 0] - a0[0]
                w1 = sp[:, 1] - a0[1]
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = (w0 * e[:, 1] - w1 * e[:, 0]) / denom
                    u = (w0 * d[1] - w1 * d[0]) / denom
                ok = (np.abs(denom) > 1e-300) & (t >= 0) & (t <= 1) \
                    & (u >= 0) & (u <= 1)
                ts.extend(t[ok].tolist())
            ts = sorted(set(min(max(tv, 0.0), 1.0) for tv in ts))
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= 1e-12:
                    continue
                mid = a0 + 0.5 * (t0 + t1) * d
                if _even_odd_many(mid[None, :], rings)[0] == inside:
                    pieces.append(np.array([a0 + t0 * d, a0 + t1 * d]))
    if not pieces:
        return Geometry.empty(2, line.srid)
    # merge consecutive collinear pieces sharing endpoints
    merged = [pieces[0]]
    for p in pieces[1:]:
        if np.array_equal(merged[-1][-1], p[0]):
            merged[-1] = np.concatenate([merged[-1], p[1:]], axis=0)
        else:
            merged.append(p)
    parts = [Geometry(2, coords=m, srid=line.srid) for m in merged]
    if len(parts) == 1:
        return parts[0]
    return Geometry.multi(5, parts, srid=line.srid)


@register_op("st_union", 2, "setop")
def st_union(col_a, col_b):
    """Union (GeometryWrapper.java:808). Areal×areal DISSOLVES via the
    overlay engine; mixed/lower-dim operands collect into the narrowest
    multi-type (JTS collection semantics)."""
    def f(a, b):
        if a.type in (3, 6) and b.type in (3, 6):
            g = _rect_fast(a, b, "union")
            if g is not None:
                return g
            return polygon_overlay(a, b, "union")
        ta = a.parts if a.parts is not None else [a]
        tb = b.parts if b.parts is not None else [b]
        parts = list(ta) + list(tb)
        types = {p.type for p in parts}
        if types == {3}:
            return Geometry.multi(6, parts, srid=a.srid)
        if types == {2}:
            return Geometry.multi(5, parts, srid=a.srid)
        if types == {1}:
            return Geometry.multi(4, parts, srid=a.srid)
        return Geometry.multi(7, parts, srid=a.srid)
    return binary_geom(col_a, col_b, f)


@register_op("st_unary_union", 1, "setop")
def st_unary_union(col_a):
    """unaryUnion (GeometryWrapper.java:~820): dissolve all areal parts
    of each row's geometry/collection."""
    ga = decode_geoms(col_a)
    from ..geom.wkb import to_wkb
    out = []
    for g in ga:
        if g is None:
            out.append(None)
            continue
        parts = g.parts if g.parts is not None else [g]
        areal = [p for p in parts if p.type in (3, 6)]
        rest = [p for p in parts if p.type not in (3, 6)]
        if areal:
            u = unary_union_polygons(areal)
            if rest:
                u = Geometry.multi(7, [u] + rest, srid=g.srid)
            out.append(to_wkb(u))
        else:
            out.append(to_wkb(g))
    return pa.array(out, type=pa.binary())


def _general_pair_areas(a, b, out, i):
    """All four boolean areas for one pair via the overlay engine (each
    op its own overlay — keeps every overlay mode exercised)."""
    if not alg.intersects(a, b):
        aa, ab = alg.area(a), alg.area(b)
        out["inter"][i] = 0.0
        out["union"][i] = aa + ab
        out["diff"][i] = aa
        out["sym"][i] = aa + ab
        return
    out["inter"][i] = alg.area(polygon_overlay(a, b, "intersection"))
    out["union"][i] = alg.area(polygon_overlay(a, b, "union"))
    out["diff"][i] = alg.area(polygon_overlay(a, b, "difference"))
    out["sym"][i] = alg.area(polygon_overlay(a, b, "symdifference"))


def boolean_areas(col_a, col_b, force_general=None) -> dict:
    """All four boolean areas (inter/union/diff/sym) for a WKB pair
    column, batched. Axis-aligned operand pairs take the vectorized
    rectilinear grid path (geom/rectilinear.py — no noding, no per-row
    Python); everything else (and rows flagged in `force_general`) runs
    the general overlay per row. Returns dict of float64 numpy arrays."""
    from ..geom.rectilinear import (aligned_mask_uniform,
                                    axis_aligned_rings,
                                    boolean_areas_rectilinear,
                                    boolean_areas_uniform)
    from ..geom.wkb import from_wkb, wkb_to_uniform_polygons
    from .kernels import wkb_column_to_list
    bufs_a = wkb_column_to_list(col_a)
    bufs_b = wkb_column_to_list(col_b)
    n = len(bufs_a)
    out = {k: np.full(n, np.nan)
           for k in ("inter", "union", "diff", "sym")}
    force = np.zeros(n, dtype=bool) if force_general is None \
        else np.asarray(force_general, dtype=bool)
    done = np.zeros(n, dtype=bool)
    ua = wkb_to_uniform_polygons(bufs_a)
    ub = wkb_to_uniform_polygons(bufs_b)
    if ua is not None and ub is not None:
        fast = aligned_mask_uniform(ua) & aligned_mask_uniform(ub) & ~force
        if fast.any():
            res = boolean_areas_uniform(ua[fast], ub[fast])
            for k in out:
                out[k][fast] = res[k]
        done = fast
    else:
        ga = [from_wkb(b) if b is not None else None for b in bufs_a]
        gb = [from_wkb(b) if b is not None else None for b in bufs_b]
        ra = [axis_aligned_rings(g) for g in ga]
        rb = [axis_aligned_rings(g) for g in gb]
        idx = [i for i in range(n)
               if not force[i] and ra[i] is not None and rb[i] is not None]
        if idx:
            res = boolean_areas_rectilinear([ra[i] for i in idx],
                                            [rb[i] for i in idx])
            for k in out:
                out[k][np.array(idx)] = res[k]
            done[np.array(idx)] = True
    for i in np.nonzero(~done)[0]:
        if bufs_a[i] is None or bufs_b[i] is None:
            continue
        _general_pair_areas(from_wkb(bufs_a[i]), from_wkb(bufs_b[i]),
                            out, i)
    return out


@register_op("st_intersection_area", 2, "setop")
def st_intersection_area(col_a, col_b):
    """Area of intersection — vectorized rectilinear fast path for
    axis-aligned pairs, exact overlay engine otherwise."""
    return pa.array(boolean_areas(col_a, col_b)["inter"],
                    type=pa.float64())


@register_op("st_union_area", 2, "setop")
def st_union_area(col_a, col_b):
    """Area of union (same dispatch as st_intersection_area)."""
    return pa.array(boolean_areas(col_a, col_b)["union"],
                    type=pa.float64())


@register_op("st_difference_area", 2, "setop")
def st_difference_area(col_a, col_b):
    """Area of A − B (same dispatch as st_intersection_area)."""
    return pa.array(boolean_areas(col_a, col_b)["diff"],
                    type=pa.float64())


@register_op("st_symdifference_area", 2, "setop")
def st_symdifference_area(col_a, col_b):
    """Area of A △ B (same dispatch as st_intersection_area)."""
    return pa.array(boolean_areas(col_a, col_b)["sym"],
                    type=pa.float64())


@register_op("st_intersection_percentage", 2, "setop")
def st_intersection_percentage(col_a, col_b):
    """IntersectionPercentage.java:17 — area(a∩b)/area(a)."""
    inter = st_intersection_area(col_a, col_b).to_numpy(zero_copy_only=False)
    ga = decode_geoms(col_a)
    areas = np.array([alg.area(g) if g is not None else np.nan for g in ga])
    with np.errstate(divide="ignore", invalid="ignore"):
        return pa.array(np.where(areas > 0, inter / areas, np.nan),
                        type=pa.float64())
