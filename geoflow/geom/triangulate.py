"""Triangulation / tessellation kernels: Bowyer–Watson Delaunay, Voronoi
polygons via half-plane clipping, rotating-calipers minimum rectangle.

Reference ops covered: DelaunayTriangles.java:28, VoronoiPolygons.java:14,
MinimumDiameter.java:15 / MinimumRectangle.java:17, polygon/Tesselate
(stub in reference — we triangulate via ear clipping).
"""

from __future__ import annotations

import math

import numpy as np

from .types import Geometry, LINESTRING, MULTIPOLYGON, POLYGON


def delaunay(points: np.ndarray) -> list:
    """Delaunay triangulation as index triples (i, j, k), CCW.

    Gift-wrapping / advancing-front construction: for each directed
    front edge (a, b) find the left-side point subtending the maximum
    angle (the empty-circumcircle neighbor) and emit the triangle. No
    artificial super-triangle — the classic super-triangle formulation
    silently LOSES hull triangles whose near-degenerate circumcircles
    reach the super vertices (found by the area-identity fuzz).
    Duplicates are dropped; collinear inputs yield []."""
    pts = np.asarray(points, dtype=np.float64)[:, :2]
    seen: dict = {}
    idxs = []
    for i in range(len(pts)):
        key = (pts[i, 0], pts[i, 1])
        if key not in seen:
            seen[key] = i
            idxs.append(i)
    if len(idxs) < 3:
        return []

    def orient(i, j, k):
        return ((pts[j, 0] - pts[i, 0]) * (pts[k, 1] - pts[i, 1])
                - (pts[j, 1] - pts[i, 1]) * (pts[k, 0] - pts[i, 0]))

    # initial hull edge: lexicographic lowest point, gift-wrap successor
    a = min(idxs, key=lambda i: (pts[i, 0], pts[i, 1]))
    b = None
    for c in idxs:
        if c == a:
            continue
        if b is None:
            b = c
            continue
        o = orient(a, b, c)
        if o < 0 or (o == 0 and
                     np.hypot(*(pts[c] - pts[a])) <
                     np.hypot(*(pts[b] - pts[a]))):
            b = c
    # interior must be on the left of a→b: by construction no point is
    # right of a→b
    front = [(a, b)]
    done = set()
    tris = []
    guard = 0
    while front:
        guard += 1
        if guard > 8 * len(idxs) * len(idxs) + 64:
            break
        e = front.pop()
        if e in done:
            continue
        ea, eb = e
        best = None
        best_cos = None
        for c in idxs:
            if c == ea or c == eb:
                continue
            if orient(ea, eb, c) <= 0:
                continue
            v1 = pts[ea] - pts[c]
            v2 = pts[eb] - pts[c]
            denom = math.hypot(v1[0], v1[1]) * math.hypot(v2[0], v2[1])
            if denom == 0:
                continue
            cosv = (v1 @ v2) / denom
            if best_cos is None or cosv < best_cos:
                best, best_cos = c, cosv
        done.add(e)
        if best is None:
            continue    # hull edge with nothing on the left
        c = best
        tris.append((ea, eb, c))
        # the new triangle owns directed edges (eb,c) and (c,ea); the
        # unexplored neighbors sit on the left of the REVERSED edges
        for nxt in ((c, eb), (ea, c)):
            done.add((nxt[1], nxt[0]))     # triangle's own side
            if nxt not in done:
                front.append(nxt)
    return tris


def delaunay_geometry(g: Geometry) -> Geometry:
    """DelaunayTriangles.java:28 — MultiPolygon of triangles."""
    pts = np.unique(g.all_coords()[:, :2], axis=0)
    tris = delaunay(pts)
    parts = []
    for (i, j, k) in tris:
        ring = np.array([pts[i], pts[j], pts[k], pts[i]])
        parts.append(Geometry(POLYGON, rings=[ring], srid=g.srid))
    return Geometry.multi(MULTIPOLYGON, parts, srid=g.srid) if parts \
        else Geometry.empty(MULTIPOLYGON, g.srid)


def _clip_halfplane(poly: list, a: np.ndarray, b: np.ndarray) -> list:
    """Clip polygon (list of xy) to the half-plane of points closer to a
    than to b (perpendicular-bisector clip)."""
    mid = (a + b) / 2
    nvec = b - a  # points with (p-mid)·n < 0 are closer to a
    out = []
    m = len(poly)
    for i in range(m):
        cur = poly[i]
        prev = poly[i - 1]
        dc = np.dot(cur - mid, nvec)
        dp = np.dot(prev - mid, nvec)
        if dc <= 0:
            if dp > 0:
                t = dp / (dp - dc)
                out.append(prev + t * (cur - prev))
            out.append(cur)
        elif dp <= 0:
            t = dp / (dp - dc)
            out.append(prev + t * (cur - prev))
    return out


def voronoi_polygons(g: Geometry, envelope_expand: float = 0.5) -> Geometry:
    """VoronoiPolygons.java:14 — one cell per distinct input point,
    clipped to the expanded envelope. Each cell is the intersection of
    bisector half-planes (O(n²), robust, exact for the clipped region)."""
    pts = np.unique(g.all_coords()[:, :2], axis=0)
    if len(pts) == 0:
        return Geometry.empty(MULTIPOLYGON, g.srid)
    x0, y0 = pts.min(axis=0)
    x1, y1 = pts.max(axis=0)
    dx = max(x1 - x0, 1.0) * envelope_expand
    dy = max(y1 - y0, 1.0) * envelope_expand
    x0, y0, x1, y1 = x0 - dx, y0 - dy, x1 + dx, y1 + dy
    box = [np.array([x0, y0]), np.array([x1, y0]),
           np.array([x1, y1]), np.array([x0, y1])]
    parts = []
    for i in range(len(pts)):
        cell = box
        for j in range(len(pts)):
            if i == j or not cell:
                continue
            cell = _clip_halfplane(cell, pts[i], pts[j])
        if len(cell) >= 3:
            ring = np.vstack([cell, cell[:1]])
            parts.append(Geometry(POLYGON, rings=[ring], srid=g.srid))
    return Geometry.multi(MULTIPOLYGON, parts, srid=g.srid)


def minimum_rotated_rectangle(g: Geometry):
    """Rotating calipers over the convex hull → (rect Geometry, width,
    diameter_line). MinimumRectangle/MinimumDiameter semantics."""
    from .algorithms import convex_hull
    hull = convex_hull(g)
    if hull.type != POLYGON:
        return hull, 0.0, hull
    hp = hull.rings[0][:-1, :2]
    best_area = (math.inf, None)
    best_width = (math.inf, None)
    nh = len(hp)
    for i in range(nh):
        e = hp[(i + 1) % nh] - hp[i]
        ln = np.linalg.norm(e)
        if ln == 0:
            continue
        u = e / ln
        v = np.array([-u[1], u[0]])
        proj_u = hp @ u
        proj_v = hp @ v
        w = proj_v.max() - proj_v.min()
        area = (proj_u.max() - proj_u.min()) * w
        if area < best_area[0]:
            corners = [u * proj_u.min() + v * proj_v.min(),
                       u * proj_u.max() + v * proj_v.min(),
                       u * proj_u.max() + v * proj_v.max(),
                       u * proj_u.min() + v * proj_v.max()]
            best_area = (area, corners)
        # MinimumDiameter = global min caliper width (independent of the
        # min-area orientation)
        if w < best_width[0]:
            mid_u = (proj_u.max() + proj_u.min()) / 2
            p0 = u * mid_u + v * proj_v.min()
            p1 = u * mid_u + v * proj_v.max()
            best_width = (w, (p0, p1))
    corners = best_area[1]
    ring = np.vstack([corners, corners[:1]])
    rect = Geometry(POLYGON, rings=[ring], srid=g.srid)
    p0, p1 = best_width[1]
    dia = Geometry(LINESTRING, coords=np.array([p0, p1]), srid=g.srid)
    return rect, float(best_width[0]), dia


def ear_clip(g: Geometry) -> Geometry:
    """Tesselate: ear-clipping triangulation of a (hole-free) polygon →
    MultiPolygon of triangles."""
    from .algorithms import ring_signed_area
    polys = []
    rings = g.rings if g.type == POLYGON else \
        [p.rings[0] for p in (g.parts or []) if p.rings]
    for ring in rings[:1] if g.type == POLYGON else rings:
        r = ring[:-1, :2].tolist()
        if ring_signed_area(ring) < 0:
            r = r[::-1]
        guard = 0
        while len(r) > 3 and guard < 10000:
            guard += 1
            n = len(r)
            clipped = False
            for i in range(n):
                a = np.array(r[i - 1])
                b = np.array(r[i])
                c = np.array(r[(i + 1) % n])
                cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
                if cross <= 0:
                    continue
                tri = np.array([a, b, c, a])
                others = np.array([p for k, p in enumerate(r)
                                   if k not in (i - 1, i, (i + 1) % n)])
                if len(others):
                    from .algorithms import points_in_ring
                    if points_in_ring(others[:, 0], others[:, 1], tri,
                                      on_boundary=False).any():
                        continue
                polys.append(Geometry(POLYGON, rings=[tri], srid=g.srid))
                r.pop(i)
                clipped = True
                break
            if not clipped:
                break
        if len(r) == 3:
            tri = np.array(r + [r[0]])
            polys.append(Geometry(POLYGON, rings=[tri], srid=g.srid))
    return Geometry.multi(MULTIPOLYGON, polys, srid=g.srid) if polys \
        else Geometry.empty(MULTIPOLYGON, g.srid)
