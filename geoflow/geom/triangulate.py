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

    Incremental construction with Lawson flips, no artificial vertices:
    fan-triangulate the convex hull, insert each interior point by
    splitting its containing triangle (edge hits split both adjacent
    triangles), then flip non-Delaunay edges until stable. The classic
    super-triangle formulation silently LOSES hull triangles whose
    near-degenerate circumcircles reach the super vertices, and
    gift-wrapping mis-stitches cocircular ties — both found by the
    area-identity fuzz. Duplicates dropped; collinear input yields []."""
    pts = np.asarray(points, dtype=np.float64)[:, :2]
    seen: dict = {}
    for i in range(len(pts)):
        seen.setdefault((pts[i, 0], pts[i, 1]), i)
    idxs = sorted(seen.values())
    if len(idxs) < 3:
        return []

    def orient(i, j, k):
        return ((pts[j, 0] - pts[i, 0]) * (pts[k, 1] - pts[i, 1])
                - (pts[j, 1] - pts[i, 1]) * (pts[k, 0] - pts[i, 0]))

    # convex hull (monotone chain) over the deduped points
    byxy = sorted(idxs, key=lambda i: (pts[i, 0], pts[i, 1]))
    lower: list = []
    for i in byxy:
        while len(lower) >= 2 and orient(lower[-2], lower[-1], i) <= 0:
            lower.pop()
        lower.append(i)
    upper: list = []
    for i in reversed(byxy):
        while len(upper) >= 2 and orient(upper[-2], upper[-1], i) <= 0:
            upper.pop()
        upper.append(i)
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:
        return []
    tris = [(hull[0], hull[e], hull[e + 1])
            for e in range(1, len(hull) - 1)]
    interior = [i for i in idxs if i not in set(hull)]

    def in_tri(p, t):
        o1 = orient(t[0], t[1], p)
        o2 = orient(t[1], t[2], p)
        o3 = orient(t[2], t[0], p)
        return o1 >= 0 and o2 >= 0 and o3 >= 0

    scale2 = max(1.0, float(np.abs(pts[idxs]).max())) ** 2
    on_eps = 1e-12 * scale2

    for p in interior:
        host = None
        for ti, t in enumerate(tris):
            if in_tri(p, t):
                host = ti
                break
        if host is None:
            continue    # numerically outside every triangle (hull jitter)
        t = tris[host]
        # on-edge check
        edge = None
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            if abs(orient(a, b, p)) <= on_eps:
                edge = (a, b)
                break
        if edge is None:
            tris[host] = (t[0], t[1], p)
            tris.append((t[1], t[2], p))
            tris.append((t[2], t[0], p))
        else:
            a, b = edge
            c = [v for v in t if v not in edge][0]
            # split host
            tris[host] = (a, p, c)
            tris.append((p, b, c))
            # split the neighbor across (a, b) if any
            for tj, u in enumerate(tris):
                if tj == host or u == (p, b, c):
                    continue
                if a in u and b in u and p not in u:
                    d = [v for v in u if v not in (a, b)][0]
                    tris[tj] = (a, d, p) if orient(a, d, p) > 0 \
                        else (a, p, d)
                    nt = (b, d, p) if orient(b, d, p) > 0 else (b, p, d)
                    tris.append(nt)
                    break
        # normalize CCW
        tris = [tt if orient(*tt) > 0 else (tt[0], tt[2], tt[1])
                for tt in tris if orient(*tt) != 0]

    # --- Lawson flips --------------------------------------------------
    def in_circle(t, d):
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        pd = pts[d]
        m11, m12 = a[0] - pd[0], a[1] - pd[1]
        m21, m22 = b[0] - pd[0], b[1] - pd[1]
        m31, m32 = c[0] - pd[0], c[1] - pd[1]
        m13 = m11 * m11 + m12 * m12
        m23 = m21 * m21 + m22 * m22
        m33 = m31 * m31 + m32 * m32
        det = (m11 * (m22 * m33 - m23 * m32)
               - m12 * (m21 * m33 - m23 * m31)
               + m13 * (m21 * m32 - m22 * m31))
        return det > 1e-9 * scale2 * scale2

    for _round in range(8 * len(tris) + 16):
        edge_map: dict = {}
        for ti, t in enumerate(tris):
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_map.setdefault(k, []).append(ti)
        flipped = False
        for k, owners in edge_map.items():
            if len(owners) != 2:
                continue
            t1, t2 = tris[owners[0]], tris[owners[1]]
            o1 = [v for v in t1 if v not in k][0]
            o2 = [v for v in t2 if v not in k][0]
            if in_circle(t1, o2) or in_circle(t2, o1):
                s1 = orient(o1, k[0], o2)
                s2 = orient(o1, k[1], o2)
                if s1 == 0 or s2 == 0 or (s1 > 0) == (s2 > 0):
                    continue    # degenerate or non-convex quad
                n1 = (o1, k[0], o2) if s1 > 0 else (o1, o2, k[0])
                n2 = (o1, k[1], o2) if s2 > 0 else (o1, o2, k[1])
                tris[owners[0]] = n1
                tris[owners[1]] = n2
                flipped = True
                break
        if not flipped:
            break
    return [t for t in tris if orient(*t) != 0]


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
