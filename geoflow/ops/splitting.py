"""Subdivide / Split operators.

Subdivide.java:11 — recursively halve a polygon's bbox until each part
has ≤ max_vertices vertices (exact: Sutherland-Hodgman rect clipping).
Split.java:34 — split by a blade line, general polyline blades
included (noding + polygonize over the combined linework)."""

from __future__ import annotations

import numpy as np

from ..geom import Geometry, algorithms as alg
from ..geom.triangulate import _clip_halfplane
from .kernels import unary_geom
from .registry import register_op


def subdivide(g: Geometry, max_vertices: int = 8) -> list:
    # a rect clip of a rect still has 5 ring vertices — values below 5
    # can never terminate (PostGIS enforces the same minimum)
    max_vertices = max(5, max_vertices)
    out = []

    def rec(poly, depth=0):
        n = sum(len(r) for r in poly.rings) if poly.type == 3 else \
            sum(len(r) for p in alg._collect(poly, (3,)) for r in p.rings)
        if n <= max_vertices or depth > 24:
            if not poly.is_empty:
                out.append(poly)
            return
        x0, y0, x1, y1 = poly.bounds()
        if (x1 - x0) >= (y1 - y0):
            mid = (x0 + x1) / 2
            a = alg.clip_by_rect(poly, x0, y0, mid, y1)
            b = alg.clip_by_rect(poly, mid, y0, x1, y1)
        else:
            mid = (y0 + y1) / 2
            a = alg.clip_by_rect(poly, x0, y0, x1, mid)
            b = alg.clip_by_rect(poly, x0, mid, x1, y1)
        rec(a, depth + 1)
        rec(b, depth + 1)

    rec(g)
    return out


@register_op("st_subdivide", 2, "transform")
def st_subdivide(col, max_vertices=8):
    """Subdivide.java:11 → MultiPolygon of parts."""
    def f(g):
        parts = subdivide(g, max_vertices)
        flat = []
        for p in parts:
            flat.extend(p.parts if p.parts is not None else [p])
        return Geometry.multi(6, flat, srid=g.srid)
    return unary_geom(col, f)


@register_op("st_split", 2, "transform")
def st_split(col, col_blade):
    """Split.java:34 — split areal geometry by a blade line, GENERAL
    polyline blades included: the blade (clipped to the polygon) is
    noded with the boundary rings and the combined linework is
    polygonized; output faces whose interior lies in the original
    polygon are the split pieces (exact intersection-formula vertices —
    same machinery as the overlay engine). Straight 2-point blades are
    a special case of the same path."""
    from ..geom import to_wkb
    from ..geom.clipping import _even_odd_many, _poly_rings
    from .kernels import decode_geoms
    from .setops import line_poly_clip
    from .topology import polygonize_geometry
    import pyarrow as pa
    gs = decode_geoms(col)
    blades = decode_geoms(col_blade)
    out = []
    for g, blade in zip(gs, blades):
        if g is None or blade is None:
            out.append(None)
            continue
        if g.type not in (3, 6):
            out.append(to_wkb(g))
            continue
        clipped = line_poly_clip(blade, g, inside=True)
        lines = []
        for p in alg._collect(g, (3,)):
            for r in p.rings:
                lines.append(Geometry(2, coords=np.asarray(r)[:, :2],
                                      srid=g.srid))
        if not clipped.is_empty:
            for part in (clipped.parts if clipped.parts is not None
                         else [clipped]):
                lines.append(part)
        faces = polygonize_geometry(Geometry.multi(5, lines, srid=g.srid))
        rings_g = _poly_rings(g)
        parts = []
        for face in (faces.parts if faces.parts is not None else [faces]):
            if face.is_empty or face.type != 3:
                continue
            r0 = face.rings[0]
            e = r0[1] - r0[0]
            ln = np.hypot(e[0], e[1])
            q = 0.5 * (r0[0] + r0[1]) + np.array([-e[1], e[0]]) / ln * (
                1e-9 * max(1.0, float(np.abs(r0).max())))
            if _even_odd_many(q[None, :2], rings_g)[0]:
                parts.append(face)
        if not parts:
            out.append(to_wkb(g))
        else:
            out.append(to_wkb(Geometry.multi(6, parts, srid=g.srid)))
    return pa.array(out, type=pa.binary())


def _halfplane_points(a, b, left: bool):
    """Fabricate the (site_a, site_b) pair whose bisector is the blade
    line, oriented to keep the requested side."""
    d = b - a
    n = np.array([-d[1], d[0]])
    nn = n / (np.linalg.norm(n) or 1.0)
    mid = (a + b) / 2
    if left:
        return mid + nn, mid - nn
    return mid - nn, mid + nn
