"""Linework topology ops: Node, Polygonize, OffsetCurve.

Reference surface: Node.java:15 (MCIndexNoder — split all segment
strings at mutual intersections), Polygonize.java:26 (JTS Polygonizer —
assemble maximal polygons from fully-noded linework), OffsetCurve.java
(JTS OffsetCurveBuilder — one-sided offset of a line, round joins).

Built on the same primitives as the overlay engine (geom/clipping.py):
pairwise noding and minimal-clockwise-angle face traversal.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..geom import Geometry, to_wkb
from ..geom.clipping import _canon_key, _even_odd_many, _node, _signed_area
from ..geom.types import (LINESTRING, MULTILINESTRING, MULTIPOLYGON, POLYGON)
from .kernels import decode_geoms
from .registry import register_op


def _line_segments(g: Geometry) -> np.ndarray:
    """(m,4) segments from all lineal/ring components."""
    segs = []

    def add(c):
        if len(c) >= 2:
            segs.append(np.concatenate([c[:-1, :2], c[1:, :2]], axis=1))

    def walk(x):
        if x.type == LINESTRING:
            add(np.asarray(x.coords))
        elif x.type == POLYGON:
            for r in x.rings:
                add(np.asarray(r))
        elif x.parts is not None:
            for p in x.parts:
                walk(p)

    walk(g)
    return np.concatenate(segs, axis=0) if segs else np.empty((0, 4))


def node_geometry(g: Geometry) -> Geometry:
    """Split every segment at every intersection with any other segment;
    returns the noded substrings as a MULTILINESTRING (granularity: one
    2-point linestring per noded subsegment)."""
    segs = _line_segments(g)
    if len(segs) == 0:
        return Geometry.empty(MULTILINESTRING, g.srid)
    span = max(1.0, float(np.abs(segs).max()))
    starts, ends, _ = _node(segs, 1e-9 * span)
    parts = [Geometry(LINESTRING, coords=np.array([s, e]), srid=g.srid)
             for s, e in zip(starts, ends)]
    if not parts:
        return Geometry.empty(MULTILINESTRING, g.srid)
    return Geometry.multi(MULTILINESTRING, parts, srid=g.srid)


def polygonize_geometry(g: Geometry) -> Geometry:
    """Assemble polygons from (possibly un-noded) linework: node, build
    both directed half-edges, trace faces by minimal clockwise turn.
    CCW cycles are shells; CW cycles strictly inside a shell become its
    holes (unbounded-face boundaries are dropped) — JTS Polygonizer
    semantics for valid ring linework."""
    segs = _line_segments(g)
    if len(segs) == 0:
        return Geometry.empty(MULTIPOLYGON, g.srid)
    span = max(1.0, float(np.abs(segs).max()))
    eps = 1e-9 * span
    starts, ends, _ = _node(segs, eps)
    inv = 1.0 / eps
    canon: dict = {}

    def key(p):
        k = _canon_key(p, inv)
        if k not in canon:
            canon[k] = p
        return k

    # undirected dedupe, then both directions as half-edges
    und = {}
    for s, e in zip(starts, ends):
        ku, kv = key(s), key(e)
        if ku == kv:
            continue
        und[(ku, kv) if ku < kv else (kv, ku)] = None
    directed = []
    for ku, kv in und:
        directed.append((ku, kv))
        directed.append((kv, ku))
    out_edges: dict = {}
    for idx, (ku, kv) in enumerate(directed):
        out_edges.setdefault(ku, []).append(idx)
    used = [False] * len(directed)
    cycles = []
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
            cands = [c for c in out_edges.get(kv, []) if not used[c]
                     and directed[c][1] != ku]  # no immediate U-turn
            if not cands:
                cands = [c for c in out_edges.get(kv, []) if not used[c]]
            if not cands:
                break
            if len(cands) == 1:
                cur = cands[0]
                continue
            pu = np.asarray(canon[ku])
            pv = np.asarray(canon[kv])
            din = pu - pv
            ain = math.atan2(din[1], din[0])
            best, best_ang = cands[0], None
            for c in cands:
                pw = np.asarray(canon[directed[c][1]])
                do = pw - pv
                ang = (ain - math.atan2(do[1], do[0])) % (2 * math.pi)
                if ang < 1e-12:
                    ang = 2 * math.pi
                if best_ang is None or ang < best_ang:
                    best, best_ang = c, ang
            cur = best
        if closed and len(ring_keys) >= 3:
            ring = np.array([canon[k] for k in ring_keys]
                            + [canon[ring_keys[0]]])
            cycles.append(ring)
    shells = [r for r in cycles if _signed_area(r) > 0]
    cws = [r for r in cycles if _signed_area(r) < 0]
    shell_areas = [abs(_signed_area(s)) for s in shells]
    assign = [[] for _ in shells]
    for h in cws:
        # sample strictly inside the CW cycle's enclosed region (right of
        # its direction); ring vertices themselves lie ON shell corners
        e = h[1] - h[0]
        ln2 = math.hypot(e[0], e[1])
        q = 0.5 * (h[0] + h[1]) + np.array([e[1], -e[0]]) / ln2 * (
            1e-7 * span)
        ha = abs(_signed_area(h))
        best, best_area = None, None
        for i, s in enumerate(shells):
            # strictly larger: a CW cycle equal in area to a shell is the
            # same ring traced backwards (isolated ring → unbounded face)
            if shell_areas[i] > ha * (1 + 1e-12) \
                    and _even_odd_many(q[None, :], [s])[0]:
                if best_area is None or shell_areas[i] < best_area:
                    best, best_area = i, shell_areas[i]
        if best is not None:
            assign[best].append(h)
    polys = [Geometry(POLYGON, rings=[s] + assign[i], srid=g.srid)
             for i, s in enumerate(shells)]
    if not polys:
        return Geometry.empty(MULTIPOLYGON, g.srid)
    if len(polys) == 1:
        return polys[0]
    return Geometry.multi(MULTIPOLYGON, polys, srid=g.srid)


def offset_curve(g: Geometry, dist: float, quadsegs: int = 8) -> Geometry:
    """One-sided offset of a linestring (OffsetCurve.java semantics via
    JTS OffsetCurveBuilder): positive distance offsets LEFT of the line
    direction with round joins at convex corners; negative offsets right
    with the output direction preserved."""
    c = np.asarray(g.coords)[:, :2] if g.type == LINESTRING else \
        np.asarray(g.parts[0].coords)[:, :2]
    if len(c) < 2 or dist == 0:
        return g
    side = 1.0 if dist > 0 else -1.0
    d = abs(dist)
    # per-segment left/right normals
    seg = c[1:] - c[:-1]
    ln = np.hypot(seg[:, 0], seg[:, 1])
    keep = ln > 0
    seg, ln = seg[keep], ln[keep]
    pts_pairs = np.stack([c[:-1][keep], c[1:][keep]], axis=1)
    nx = -seg[:, 1] / ln * side
    ny = seg[:, 0] / ln * side
    out = []
    for i in range(len(seg)):
        a = pts_pairs[i, 0] + np.array([nx[i], ny[i]]) * d
        b = pts_pairs[i, 1] + np.array([nx[i], ny[i]]) * d
        if i == 0:
            out.append(a)
        else:
            prev_end = out[-1]
            turn = seg[i - 1, 0] * seg[i, 1] - seg[i - 1, 1] * seg[i, 0]
            if turn * side < -1e-12:
                # corner bends toward the offset side: arc join around
                # the shared vertex from prev_end to a
                v = pts_pairs[i, 0]
                a0 = math.atan2(prev_end[1] - v[1], prev_end[0] - v[0])
                a1 = math.atan2(a[1] - v[1], a[0] - v[0])
                sweep = (a1 - a0) % (2 * math.pi)
                if side > 0:
                    sweep -= 2 * math.pi   # go clockwise for left offsets
                nsteps = max(1, int(abs(sweep) / (math.pi / (2 * quadsegs))))
                for s in range(1, nsteps):
                    ang = a0 + sweep * s / nsteps
                    out.append(v + d * np.array([math.cos(ang),
                                                 math.sin(ang)]))
                out.append(a)
            else:
                # bends away: intersect the two offset lines (miter)
                p0, d0 = out[-1], seg[i - 1]
                p1, d1 = a, seg[i]
                den = d0[0] * d1[1] - d0[1] * d1[0]
                if abs(den) > 1e-12 * ln[i] * ln[i - 1]:
                    t = ((p1[0] - p0[0]) * d1[1]
                         - (p1[1] - p0[1]) * d1[0]) / den
                    out[-1] = p0 + t * d0
                else:
                    out.append(a)
        out.append(b)
    return Geometry(LINESTRING, coords=np.array(out), srid=g.srid)


@register_op("st_node", 1, "transform")
def st_node(col):
    """Node.java:15."""
    out = [to_wkb(node_geometry(g)) if g is not None else None
           for g in decode_geoms(col)]
    return pa.array(out, type=pa.binary())


@register_op("st_polygonize", 1, "transform")
def st_polygonize(col):
    """Polygonize.java:26."""
    out = [to_wkb(polygonize_geometry(g)) if g is not None else None
           for g in decode_geoms(col)]
    return pa.array(out, type=pa.binary())


@register_op("st_offsetcurve", 2, "transform")
def st_offsetcurve(col, dist):
    """OffsetCurve.java (linestring/transform)."""
    out = [to_wkb(offset_curve(g, dist)) if g is not None else None
           for g in decode_geoms(col)]
    return pa.array(out, type=pa.binary())


def make_valid_geometry(g: Geometry) -> Geometry:
    """MakeValid for areal geometries — the GEOS/PostGIS 'linework'
    method (reference surface geometry/MakeValid.java is a stub, so
    semantics follow the public PostGIS ST_MakeValid default): node the
    ring linework, polygonize the faces, keep exactly the faces whose
    interior has ODD crossing parity against the original ring set
    (even-odd filling of the input linework). Valid inputs and
    non-areal inputs pass through unchanged; a fully-degenerate areal
    input (no odd face) returns MULTIPOLYGON EMPTY."""
    from ..geom import algorithms as alg
    from ..geom.types import GEOMETRYCOLLECTION

    if g.type == GEOMETRYCOLLECTION and g.parts is not None:
        return Geometry.multi(GEOMETRYCOLLECTION,
                              [make_valid_geometry(p) for p in g.parts],
                              srid=g.srid)
    if g.type not in (POLYGON, MULTIPOLYGON):
        return g
    if alg.is_valid(g):
        return g
    from .attrs_ext import _interior_point
    faces = polygonize_geometry(g)
    cand = faces.parts if faces.parts is not None else (
        [faces] if faces.type == POLYGON else [])
    rings = [r for p in alg._collect(g, (POLYGON,)) for r in p.rings]
    keep = []
    for f in cand:
        x, y = _interior_point(f)
        parity = 0
        for r in rings:
            parity ^= int(alg.points_in_ring(
                np.array([x]), np.array([y]), r, on_boundary=False)[0])
        if parity:
            keep.append(f)
    if not keep:
        return Geometry.empty(MULTIPOLYGON, g.srid)
    if len(keep) == 1:
        return keep[0]
    return Geometry.multi(MULTIPOLYGON, keep, srid=g.srid)


@register_op("st_makevalid", 1, "transform")
def st_makevalid(col):
    """MakeValid.java (reference stub; PostGIS linework semantics)."""
    out = [to_wkb(make_valid_geometry(g)) if g is not None else None
           for g in decode_geoms(col)]
    return pa.array(out, type=pa.binary())
