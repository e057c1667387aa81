"""General polygon boolean operations (intersection / union / difference
/ symDifference) via planar overlay with edge classification.

Reference surface: GeometryWrapper.java:715 (difference), :755
(intersection), :794 (symDifference), :808 (union); Difference.java:18.
The reference delegates to JTS/GEOS; this is an original from-scratch
overlay in numpy:

 1. NODE: collect the boundary segments of both operands and split every
    segment at every intersection with any other segment (proper
    crossings, T-junctions, collinear overlaps) — O(m²) vectorized
    pairwise; per-row polygons are small so m² is trivial.
 2. DEDUPE: canonicalize vertices (1e-9-relative snap) and merge
    coincident subsegments (shared boundaries contribute one edge).
 3. CLASSIFY: for each edge, sample a point slightly left and slightly
    right of the midpoint, evaluate even-odd membership in A and B and
    combine with the boolean op. Keep the edge iff exactly one side is
    inside the result; orient it so the result's interior lies LEFT.
 4. ASSEMBLE: walk directed edges; at each node continue with the
    outgoing edge minimizing the clockwise angle from the reversed
    incoming direction (standard face traversal keeping the face left).
    CCW rings become shells, CW rings holes; each hole attaches to the
    smallest enclosing shell.

Dimension-collapse fallback: an intersection with no areal faces returns
the shared collinear boundary linework (JTS returns LINESTRING for
edge-adjacent polygons) or touching points.

Robustness model: vertices produced at noding are exact line-line
intersection formula values; the eps-offset classification only decides
edge KEEP/DROP, so output coordinates carry no eps. Slivers thinner than
~1e-7 of the operand extent may misclassify — acceptable for the engine's
test envelope, documented here.
"""

from __future__ import annotations

import numpy as np

from .types import (Geometry, LINESTRING, MULTILINESTRING, MULTIPOINT,
                    MULTIPOLYGON, POINT, POLYGON)

_OPS = {
    "intersection": lambda a, b: a & b,
    "union": lambda a, b: a | b,
    "difference": lambda a, b: a & ~b,
    "symdifference": lambda a, b: a ^ b,
}


def _poly_rings(g: Geometry):
    """closed (n,2) rings of a POLYGON / MULTIPOLYGON (or [] otherwise)."""
    out = []
    if g is None:
        return out
    if g.type == POLYGON:
        polys = [g]
    elif g.parts is not None:
        polys = [p for p in g.parts if p.type == POLYGON]
    else:
        polys = []
    for p in polys:
        for r in p.rings:
            c = np.asarray(r, dtype=np.float64)[:, :2]
            if len(c) >= 4:
                out.append(c)
    return out


def _ring_segments(rings):
    segs = []
    for r in rings:
        segs.append(np.concatenate([r[:-1], r[1:]], axis=1))
    return np.concatenate(segs, axis=0) if segs else np.empty((0, 4))


def _even_odd_many(pts: np.ndarray, rings) -> np.ndarray:
    """even-odd for an (n,2) point array, vectorized over points AND
    segments (no Python loop over points)."""
    n = len(pts)
    if n == 0 or not rings:
        return np.zeros(n, dtype=bool)
    segs = _ring_segments(rings)
    x0, y0, x1, y1 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    px = pts[:, 0][:, None]
    py = pts[:, 1][:, None]
    cond = (y0[None, :] > py) != (y1[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x0 + (py - y0) / (y1 - y0) * (x1 - x0)
    crossings = (cond & (px < xi)).sum(axis=1)
    return (crossings % 2) == 1


def _node(segs: np.ndarray, eps: float):
    """Split every segment at every intersection with every other
    segment. Returns (sub_starts, sub_ends, src_idx) arrays."""
    m = len(segs)
    p0 = segs[:, :2]
    p1 = segs[:, 2:]
    d = p1 - p0
    # pairwise cross products
    dx, dy = d[:, 0], d[:, 1]
    denom = dx[:, None] * dy[None, :] - dy[:, None] * dx[None, :]
    wx = p0[None, :, 0] - p0[:, None, 0]
    wy = p0[None, :, 1] - p0[:, None, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (wx * dy[None, :] - wy * dx[None, :]) / denom       # param on i
        u = (wx * dy[:, None] - wy * dx[:, None]) / denom       # param on j
    teps = 1e-12
    ok = (np.abs(denom) > eps * eps) & (t >= -teps) & (t <= 1 + teps) \
        & (u >= -teps) & (u <= 1 + teps)
    np.fill_diagonal(ok, False)

    tlists = [[0.0, 1.0] for _ in range(m)]
    ii, jj = np.nonzero(ok)
    for i, j in zip(ii, jj):
        tv = min(max(t[i, j], 0.0), 1.0)
        tlists[i].append(tv)

    # collinear overlaps: parallel segments on the same line — split each
    # at the projection of the other's endpoints
    par = (np.abs(denom) <= eps * eps)
    np.fill_diagonal(par, False)
    pi, pj = np.nonzero(par)
    len2 = (d * d).sum(axis=1)
    for i, j in zip(pi, pj):
        if len2[i] <= 0:
            continue
        # j's endpoints relative to line i: collinear iff cross ≈ 0
        for q in (p0[j], p1[j]):
            cr = (q[0] - p0[i, 0]) * dy[i] - (q[1] - p0[i, 1]) * dx[i]
            if abs(cr) > eps * max(1.0, np.sqrt(len2[i])):
                continue
            tv = ((q[0] - p0[i, 0]) * dx[i] + (q[1] - p0[i, 1]) * dy[i]) / len2[i]
            if -1e-12 < tv < 1 + 1e-12:
                tlists[i].append(min(max(tv, 0.0), 1.0))

    starts, ends, src = [], [], []
    for i in range(m):
        ts = np.unique(np.asarray(tlists[i]))
        ts = ts[(ts >= 0.0) & (ts <= 1.0)]
        # merge parameter values closer than eps along the segment
        if len(ts) > 2:
            keep = [ts[0]]
            for tv in ts[1:]:
                if tv - keep[-1] > 1e-12:
                    keep.append(tv)
            ts = np.asarray(keep)
        pts = p0[i] + ts[:, None] * d[i]
        for a, b in zip(pts[:-1], pts[1:]):
            if np.hypot(b[0] - a[0], b[1] - a[1]) > eps:
                starts.append(a)
                ends.append(b)
                src.append(i)
    if not starts:
        return (np.empty((0, 2)), np.empty((0, 2)),
                np.empty(0, dtype=np.int64))
    return np.asarray(starts), np.asarray(ends), np.asarray(src)


def _canon_key(pt, inv_eps):
    return (round(pt[0] * inv_eps), round(pt[1] * inv_eps))


def polygon_overlay(a: Geometry, b: Geometry, op: str) -> Geometry:
    """Boolean overlay of two areal geometries. op in
    {intersection, union, difference, symdifference}."""
    rings_a = _poly_rings(a)
    rings_b = _poly_rings(b)
    srid = a.srid if a is not None else (b.srid if b else 4326)
    opf = _OPS[op]
    if not rings_a and not rings_b:
        return Geometry.empty(POLYGON, srid)
    if not rings_b:
        return _copy_areal(a) if opf(True, False) else Geometry.empty(POLYGON, srid)
    if not rings_a:
        return _copy_areal(b) if opf(False, True) else Geometry.empty(POLYGON, srid)

    all_pts = np.concatenate([r for r in rings_a + rings_b], axis=0)
    span = max(1.0, float(np.ptp(all_pts[:, 0])), float(np.ptp(all_pts[:, 1])),
               float(np.abs(all_pts).max()))
    eps = 1e-9 * span
    cls_eps = 1e-7 * span

    segs_a = _ring_segments(rings_a)
    segs_b = _ring_segments(rings_b)
    segs = np.concatenate([segs_a, segs_b], axis=0)
    na = len(segs_a)
    starts, ends, src = _node(segs, eps)
    if len(starts) == 0:
        return Geometry.empty(POLYGON, srid)

    # canonical vertices + undirected dedupe
    inv_eps = 1.0 / eps
    canon: dict = {}

    def key_of(pt):
        k = _canon_key(pt, inv_eps)
        if k not in canon:
            canon[k] = pt
        return k

    edge_map: dict = {}
    for s, e, si in zip(starts, ends, src):
        ku, kv = key_of(s), key_of(e)
        if ku == kv:
            continue
        ek = (ku, kv) if ku < kv else (kv, ku)
        tag = "a" if si < na else "b"
        if ek in edge_map:
            edge_map[ek].add(tag)
        else:
            edge_map[ek] = {tag}

    if not edge_map:
        return Geometry.empty(POLYGON, srid)

    # classification
    ukeys = list(edge_map.keys())
    U = np.array([canon[k[0]] for k in ukeys])
    V = np.array([canon[k[1]] for k in ukeys])
    d = V - U
    ln = np.hypot(d[:, 0], d[:, 1])
    nx, ny = -d[:, 1] / ln, d[:, 0] / ln
    mid = 0.5 * (U + V)
    left = mid + np.stack([nx, ny], axis=1) * cls_eps
    right = mid - np.stack([nx, ny], axis=1) * cls_eps
    inAl = _even_odd_many(left, rings_a)
    inBl = _even_odd_many(left, rings_b)
    inAr = _even_odd_many(right, rings_a)
    inBr = _even_odd_many(right, rings_b)
    Rl = opf(inAl, inBl)
    Rr = opf(inAr, inBr)
    keep = Rl != Rr
    directed = []
    for i in np.nonzero(keep)[0]:
        ku, kv = ukeys[i]
        if Rl[i]:
            directed.append((ku, kv))
        else:
            directed.append((kv, ku))

    shells, holes = _assemble(directed, canon)
    if not shells:
        if op == "intersection":
            return _dimension_collapse(segs_a, segs_b, rings_a, rings_b,
                                       eps, srid)
        return Geometry.empty(POLYGON, srid)
    return _build_polygons(shells, holes, srid)


def _copy_areal(g: Geometry) -> Geometry:
    return g


def _assemble(directed, canon):
    """Stitch directed edges (interior on the left) into rings. A ring
    closes when an edge ends at the walk's start vertex — so a region
    pinched at a point comes out as separate simple rings (matching the
    OGC-valid MULTIPOLYGON JTS produces for corner-touching results)."""
    out_edges: dict = {}
    for idx, (ku, kv) in enumerate(directed):
        out_edges.setdefault(ku, []).append(idx)
    used = [False] * len(directed)
    shells, holes = [], []
    for start in range(len(directed)):
        if used[start]:
            continue
        start_key = directed[start][0]
        ring_keys = []
        cur = start
        closed = False
        for _ in range(len(directed) + 1):
            used[cur] = True
            ku, kv = directed[cur]
            ring_keys.append(ku)
            if kv == start_key:
                closed = True
                break
            cands = [c for c in out_edges.get(kv, []) if not used[c]]
            if not cands:
                break
            if len(cands) == 1:
                cur = cands[0]
                continue
            # minimal clockwise angle from the reversed incoming direction
            pu = np.asarray(canon[ku])
            pv = np.asarray(canon[kv])
            din = pu - pv
            ain = np.arctan2(din[1], din[0])
            best, best_ang = cands[0], None
            for c in cands:
                pw = np.asarray(canon[directed[c][1]])
                do = pw - pv
                ang = (ain - np.arctan2(do[1], do[0])) % (2 * np.pi)
                if ang < 1e-12:
                    ang = 2 * np.pi
                if best_ang is None or ang < best_ang:
                    best, best_ang = c, ang
            cur = best
        if not closed or len(ring_keys) < 3:
            continue
        ring = np.array([canon[k] for k in ring_keys] + [canon[ring_keys[0]]])
        sa = _signed_area(ring)
        if sa > 0:
            shells.append(ring)
        elif sa < 0:
            holes.append(ring)
    return shells, holes


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _build_polygons(shells, holes, srid) -> Geometry:
    shell_areas = [abs(_signed_area(s)) for s in shells]
    assign = [[] for _ in shells]
    for h in holes:
        # attach to the smallest shell containing a point strictly inside
        # the hole (hole vertices may lie ON a shell boundary when the
        # hole touches it)
        e = h[1] - h[0]
        ln = np.hypot(e[0], e[1])
        q = 0.5 * (h[0] + h[1]) + np.array([e[1], -e[0]]) / ln * (
            1e-9 * max(1.0, float(np.abs(h).max())))
        best, best_area = None, None
        for i, s in enumerate(shells):
            if _even_odd_many(q[None, :], [s])[0]:
                if best_area is None or shell_areas[i] < best_area:
                    best, best_area = i, shell_areas[i]
        if best is not None:
            assign[best].append(h)
    polys = [Geometry(POLYGON, rings=[s] + assign[i], srid=srid)
             for i, s in enumerate(shells)]
    if len(polys) == 1:
        return polys[0]
    return Geometry.multi(MULTIPOLYGON, polys, srid=srid)


def _dimension_collapse(segs_a, segs_b, rings_a, rings_b, eps, srid):
    """Intersection with no areal part: shared collinear boundary pieces
    (JTS: LINESTRING for edge-adjacent polygons), else touching points."""
    lines = []
    for i in range(len(segs_a)):
        a0, a1 = segs_a[i, :2], segs_a[i, 2:]
        da = a1 - a0
        la2 = float(da @ da)
        if la2 <= 0:
            continue
        for j in range(len(segs_b)):
            b0, b1 = segs_b[j, :2], segs_b[j, 2:]
            cr0 = (b0[0] - a0[0]) * da[1] - (b0[1] - a0[1]) * da[0]
            cr1 = (b1[0] - a0[0]) * da[1] - (b1[1] - a0[1]) * da[0]
            sc = eps * max(1.0, np.sqrt(la2))
            if abs(cr0) > sc or abs(cr1) > sc:
                continue
            t0 = float((b0 - a0) @ da / la2)
            t1 = float((b1 - a0) @ da / la2)
            lo, hi = max(min(t0, t1), 0.0), min(max(t0, t1), 1.0)
            if hi - lo > 1e-12:
                lines.append(np.array([a0 + lo * da, a0 + hi * da]))
    if lines:
        parts = [Geometry(LINESTRING, coords=l, srid=srid) for l in lines]
        if len(parts) == 1:
            return parts[0]
        return Geometry.multi(MULTILINESTRING, parts, srid=srid)
    # touching points: vertices of A on B's boundary
    pts = []
    va = np.concatenate([r[:-1] for r in rings_a], axis=0)
    sb = _ring_segments(rings_b)
    for p in va:
        dx = sb[:, 2] - sb[:, 0]
        dy = sb[:, 3] - sb[:, 1]
        cr = (p[0] - sb[:, 0]) * dy - (p[1] - sb[:, 1]) * dx
        l2 = dx * dx + dy * dy
        t = ((p[0] - sb[:, 0]) * dx + (p[1] - sb[:, 1]) * dy) / np.maximum(l2, 1e-300)
        on = (np.abs(cr) <= eps * np.maximum(1.0, np.sqrt(l2))) \
            & (t >= -1e-12) & (t <= 1 + 1e-12)
        if on.any():
            pts.append(p)
    if pts:
        uniq = {(_canon_key(p, 1.0 / eps)): p for p in pts}
        parts = [Geometry(POINT, coords=np.asarray(p), srid=srid)
                 for p in uniq.values()]
        if len(parts) == 1:
            return parts[0]
        return Geometry.multi(MULTIPOINT, parts, srid=srid)
    return Geometry.empty(POLYGON, srid)


def unary_union_polygons(geoms) -> Geometry:
    """Dissolve a list of areal geometries (pairwise fold)."""
    acc = None
    for g in geoms:
        if g is None or g.is_empty:
            continue
        acc = g if acc is None else polygon_overlay(acc, g, "union")
    return acc if acc is not None else Geometry.empty(POLYGON)
