"""Per-row geometry set operations (GeometryWrapper union :808 /
intersection :755 / difference :715 / symDifference :794).

Without GEOS, general polygon boolean ops are out of scope for round 1;
implemented here: intersection with axis-rect (exact, Sutherland-Hodgman),
convex-polygon intersection (exact), union as collection-combine +
unary_union over disjoint inputs, intersection area/percentage for convex
operands. Documented limitation for concave∩concave."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import Geometry, algorithms as alg
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


@register_op("st_intersection", 2, "setop")
def st_intersection(col_a, col_b):
    """Intersection (GeometryWrapper.java:755). Exact when either operand
    is convex; falls back to envelope clip otherwise (documented)."""
    def f(a, b):
        if a.type in (3, 6) and b.type in (3, 6):
            bc = alg.convex_hull(b)
            if abs(alg.area(bc) - alg.area(b)) <= 1e-12 * max(1.0, alg.area(b)):
                return convex_clip(a, bc if bc.type == 3 else b)
            ac = alg.convex_hull(a)
            if abs(alg.area(ac) - alg.area(a)) <= 1e-12 * max(1.0, alg.area(a)):
                return convex_clip(b, ac if ac.type == 3 else a)
            x0, y0, x1, y1 = b.bounds()
            return alg.clip_by_rect(a, x0, y0, x1, y1)
        if a.type == 1:
            return a if alg.intersects(a, b) else Geometry.empty(1, a.srid)
        if b.type == 1:
            return b if alg.intersects(a, b) else Geometry.empty(1, a.srid)
        x0, y0, x1, y1 = b.bounds()
        try:
            return alg.clip_by_rect(a, x0, y0, x1, y1)
        except NotImplementedError:
            return Geometry.empty(a.type, a.srid)
    return binary_geom(col_a, col_b, f)


@register_op("st_union", 2, "setop")
def st_union(col_a, col_b):
    """Union (GeometryWrapper.java:808) — collected as MultiGeometry /
    GeometryCollection (dissolve of overlapping polygons not performed;
    documented)."""
    def f(a, b):
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


@register_op("st_intersection_area", 2, "setop")
def st_intersection_area(col_a, col_b):
    """Area of intersection (convex-exact path of st_intersection)."""
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = np.full(len(ga), np.nan)
    for i, (a, b) in enumerate(zip(ga, gb)):
        if a is None or b is None:
            continue
        if not alg.intersects(a, b):
            out[i] = 0.0
            continue
        out[i] = alg.area(convex_clip(a, alg.convex_hull(b)))
    return pa.array(out, type=pa.float64())


@register_op("st_intersection_percentage", 2, "setop")
def st_intersection_percentage(col_a, col_b):
    """IntersectionPercentage.java:17 — area(a∩b)/area(a)."""
    inter = st_intersection_area(col_a, col_b).to_numpy(zero_copy_only=False)
    ga = decode_geoms(col_a)
    areas = np.array([alg.area(g) if g is not None else np.nan for g in ga])
    with np.errstate(divide="ignore", invalid="ignore"):
        return pa.array(np.where(areas > 0, inter / areas, np.nan),
                        type=pa.float64())
