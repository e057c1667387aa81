"""Subdivide / Split operators.

Subdivide.java:11 — recursively halve a polygon's bbox until each part
has ≤ max_vertices vertices (exact: Sutherland-Hodgman rect clipping).
Split.java:34 — split by a straight 2-point blade line (exact via
half-plane clips on both sides; general polyline blades need full noding
and are out of round-1 scope, documented)."""

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
    """Split.java:34 — polygon split by a straight blade line (exact for
    2-point blades via half-plane clipping both sides)."""
    from ..geom import to_wkb
    from .kernels import decode_geoms
    import pyarrow as pa
    gs = decode_geoms(col)
    blades = decode_geoms(col_blade)
    out = []
    for g, blade in zip(gs, blades):
        if g is None or blade is None:
            out.append(None)
            continue
        bc = blade.all_coords()[:, :2]
        a, b = bc[0], bc[-1]
        parts = []
        for p in alg._collect(g, (3,)):
            ring = [np.asarray(v[:2]) for v in p.rings[0][:-1]]
            left = _clip_halfplane(ring, *_halfplane_points(a, b, True))
            right = _clip_halfplane(ring, *_halfplane_points(a, b, False))
            for cell in (left, right):
                if len(cell) >= 3:
                    r = np.vstack([cell, cell[:1]])
                    parts.append(Geometry(3, rings=[r], srid=g.srid))
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
