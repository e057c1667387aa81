"""LineString / Polygon / Point specialized operators
(linestring/*, polygon/*, point/* packages of the reference)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..geom import Geometry, algorithms as alg
from .kernels import binary_float, decode_geoms, unary_bool, unary_float, unary_geom
from .registry import register_op


@register_op("st_isclosed", 1, "linestring")
def st_isclosed(col):
    """linestring/attribute/IsClosed.java:33."""
    def f(g):
        c = g.all_coords()
        return len(c) > 1 and np.array_equal(c[0], c[-1])
    return unary_bool(col, f)


@register_op("st_isring", 1, "linestring")
def st_isring(col):
    """IsRing.java:28 — closed and simple."""
    def f(g):
        c = g.all_coords()
        return (len(c) > 3 and np.array_equal(c[0], c[-1])
                and alg.is_simple(g))
    return unary_bool(col, f)


@register_op("st_linemerge", 1, "linestring")
def st_linemerge(col):
    """LineMerge.java:30 — join touching linestrings end-to-end."""
    def f(g):
        lines = [p.coords[:, :2].copy()
                 for p in alg._collect(g, (2,)) if len(p.coords) >= 2]
        if not lines:
            return g
        merged = True
        while merged and len(lines) > 1:
            merged = False
            for i in range(len(lines)):
                for j in range(i + 1, len(lines)):
                    a, b = lines[i], lines[j]
                    if np.array_equal(a[-1], b[0]):
                        lines[i] = np.vstack([a, b[1:]])
                    elif np.array_equal(a[-1], b[-1]):
                        lines[i] = np.vstack([a, b[::-1][1:]])
                    elif np.array_equal(a[0], b[-1]):
                        lines[i] = np.vstack([b, a[1:]])
                    elif np.array_equal(a[0], b[0]):
                        lines[i] = np.vstack([b[::-1], a[1:]])
                    else:
                        continue
                    lines.pop(j)
                    merged = True
                    break
                if merged:
                    break
        if len(lines) == 1:
            return Geometry(2, coords=lines[0], srid=g.srid)
        return Geometry.multi(5, [Geometry(2, coords=l, srid=g.srid)
                                  for l in lines], srid=g.srid)
    return unary_geom(col, f)


@register_op("st_makeline", 1, "constructor")
def st_makeline(col):
    """MakeLine.java:36 — list<point wkb> column → linestring."""
    from ..geom import from_wkb, to_wkb
    out = []
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    for pts in vals:
        if pts is None:
            out.append(None)
            continue
        coords = [from_wkb(p).coords[:2] for p in pts]
        out.append(to_wkb(Geometry.linestring(np.array(coords))))
    return pa.array(out, type=pa.binary())


@register_op("st_makepolygon", 1, "constructor")
def st_makepolygon(col):
    """MakePolygon.java:30 — ring linestring → polygon."""
    def f(g):
        c = g.all_coords()[:, :2].copy()
        if not np.array_equal(c[0], c[-1]):
            c = np.vstack([c, c[:1]])
        return Geometry(3, rings=[c], srid=g.srid)
    return unary_geom(col, f)


@register_op("st_addpoint", 3, "editor")
def st_addpoint(col, col_pt, position=-1):
    """linestring/editor/AddPoint.java:24."""
    from ..geom import from_wkb, to_wkb
    gl = decode_geoms(col)
    gp = decode_geoms(col_pt)
    out = []
    for l, p in zip(gl, gp):
        if l is None or p is None:
            out.append(None)
            continue
        c = l.coords[:, :2]
        pt = p.coords[:2].reshape(1, 2)
        pos = len(c) if position == -1 else position
        out.append(to_wkb(Geometry(2, coords=np.vstack([c[:pos], pt, c[pos:]]),
                                   srid=l.srid)))
    return pa.array(out, type=pa.binary())


@register_op("st_removepoint", 2, "editor")
def st_removepoint(col, position):
    """linestring/editor/RemovePoint.java:21."""
    def f(g):
        c = g.coords
        return Geometry(2, coords=np.delete(c, position, axis=0), srid=g.srid)
    return unary_geom(col, f)


@register_op("st_setpoint", 3, "editor")
def st_setpoint(col, col_pt, position):
    """linestring/editor/SetPoint.java:19."""
    from ..geom import to_wkb
    gl = decode_geoms(col)
    gp = decode_geoms(col_pt)
    out = []
    for l, p in zip(gl, gp):
        if l is None or p is None:
            out.append(None)
            continue
        c = l.coords[:, :2].copy()
        c[position] = p.coords[:2]
        out.append(to_wkb(Geometry(2, coords=c, srid=l.srid)))
    return pa.array(out, type=pa.binary())


@register_op("st_numinteriorrings", 1, "polygon")
def st_numinteriorrings(col):
    """polygon/attribute/NumInteriorRings.java:12."""
    def f(g):
        polys = alg._collect(g, (3,))
        return len(polys[0].rings) - 1 if polys and polys[0].rings else 0
    return unary_float(col, f)


@register_op("st_nrings", 1, "polygon")
def st_nrings(col):
    """NRings.java:12."""
    def f(g):
        return sum(len(p.rings) for p in alg._collect(g, (3,)))
    return unary_float(col, f)


@register_op("st_interiorringn", 2, "polygon")
def st_interiorringn(col, n):
    """InteriorRingN.java:17 — 1-based."""
    def f(g):
        polys = alg._collect(g, (3,))
        return Geometry(2, coords=polys[0].rings[n].copy(), srid=g.srid)
    return unary_geom(col, f)


@register_op("st_ispolygonccw", 1, "polygon")
def st_ispolygonccw(col):
    """IsPolygonCCW.java:17 — exterior CCW, holes CW."""
    def f(g):
        for p in alg._collect(g, (3,)):
            if not p.rings:
                continue
            if not alg.is_ccw(p.rings[0]):
                return False
            for h in p.rings[1:]:
                if alg.is_ccw(h):
                    return False
        return True
    return unary_bool(col, f)


@register_op("st_ispolygoncw", 1, "polygon")
def st_ispolygoncw(col):
    """IsPolygonCW.java:17."""
    def f(g):
        for p in alg._collect(g, (3,)):
            if not p.rings:
                continue
            if alg.is_ccw(p.rings[0]):
                return False
            for h in p.rings[1:]:
                if not alg.is_ccw(h):
                    return False
        return True
    return unary_bool(col, f)


@register_op("st_forcepolygonccw", 1, "polygon")
def st_forcepolygonccw(col):
    """ForcePolygonCCW.java:20."""
    def f(g):
        def fix(p):
            rings = []
            for k, r in enumerate(p.rings):
                want = (k == 0)
                rings.append(r[::-1].copy() if alg.is_ccw(r) != want else r.copy())
            return Geometry(3, rings=rings, srid=p.srid)
        if g.type == 3:
            return fix(g)
        if g.parts is not None:
            return Geometry(g.type, parts=[fix(p) if p.type == 3 else p
                                           for p in g.parts], srid=g.srid)
        return g
    return unary_geom(col, f)


@register_op("st_forcepolygoncw", 1, "polygon")
def st_forcepolygoncw(col):
    """ForcePolygonCW.java:21."""
    def f(g):
        def fix(p):
            rings = []
            for k, r in enumerate(p.rings):
                want = (k != 0)
                rings.append(r[::-1].copy() if alg.is_ccw(r) != want else r.copy())
            return Geometry(3, rings=rings, srid=p.srid)
        if g.type == 3:
            return fix(g)
        if g.parts is not None:
            return Geometry(g.type, parts=[fix(p) if p.type == 3 else p
                                           for p in g.parts], srid=g.srid)
        return g
    return unary_geom(col, f)


@register_op("st_isconvex", 1, "polygon")
def st_isconvex(col):
    """IsConvex.java:13."""
    def f(g):
        polys = alg._collect(g, (3,))
        if not polys or not polys[0].rings:
            return False
        r = polys[0].rings[0][:-1, :2]
        n = len(r)
        signs = []
        for i in range(n):
            a, b, c = r[i], r[(i + 1) % n], r[(i + 2) % n]
            cr = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cr != 0:
                signs.append(cr > 0)
        return len(set(signs)) <= 1
    return unary_bool(col, f)


def _triangle_sides(g):
    polys = alg._collect(g, (3,))
    if not polys or not polys[0].rings:
        return None
    r = polys[0].rings[0]
    if len(r) != 4:
        return None
    a = float(np.linalg.norm(r[1, :2] - r[0, :2]))
    b = float(np.linalg.norm(r[2, :2] - r[1, :2]))
    c = float(np.linalg.norm(r[3, :2] - r[2, :2]))
    return sorted([a, b, c])


@register_op("st_istriangle", 1, "polygon")
def st_istriangle(col):
    """IsTriangle.java:12."""
    return unary_bool(col, lambda g: _triangle_sides(g) is not None)


@register_op("st_isequilateraltriangle", 1, "polygon")
def st_isequilateraltriangle(col):
    """IsEquilateralTriangle.java:13."""
    def f(g):
        s = _triangle_sides(g)
        return s is not None and math.isclose(s[0], s[2], rel_tol=1e-9)
    return unary_bool(col, f)


@register_op("st_isisoscelestriangle", 1, "polygon")
def st_isisoscelestriangle(col):
    """IsIsocelesTriangle.java:13."""
    def f(g):
        s = _triangle_sides(g)
        return s is not None and (math.isclose(s[0], s[1], rel_tol=1e-9)
                                  or math.isclose(s[1], s[2], rel_tol=1e-9))
    return unary_bool(col, f)


@register_op("st_isrighttriangle", 1, "polygon")
def st_isrighttriangle(col):
    """IsRightTriangle.java:13 — Pythagoras within tolerance."""
    def f(g):
        s = _triangle_sides(g)
        return s is not None and math.isclose(s[0] ** 2 + s[1] ** 2,
                                              s[2] ** 2, rel_tol=1e-9)
    return unary_bool(col, f)


@register_op("st_angle", 3, "point")
def st_angle(col_a, col_b, col_c):
    """point/attribute/Angle.java:10 — angle at B formed by A-B-C."""
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    gc = decode_geoms(col_c)
    out = np.full(len(ga), np.nan)
    for i, (a, b, c) in enumerate(zip(ga, gb, gc)):
        if a is None or b is None or c is None:
            continue
        v1 = a.coords[:2] - b.coords[:2]
        v2 = c.coords[:2] - b.coords[:2]
        d = (np.linalg.norm(v1) * np.linalg.norm(v2))
        if d == 0:
            continue
        out[i] = math.acos(np.clip(np.dot(v1, v2) / d, -1, 1))
    return pa.array(out, type=pa.float64())


@register_op("st_geometricmedian", 1, "point")
def st_geometricmedian(col):
    """point/GeometricMedian.java:17 — Weiszfeld iteration over a
    multipoint."""
    def f(g):
        pts = g.all_coords()[:, :2]
        cur = pts.mean(axis=0)
        for _ in range(200):
            d = np.linalg.norm(pts - cur, axis=1)
            if (d < 1e-12).any():
                break
            w = 1.0 / d
            nxt = (pts * w[:, None]).sum(axis=0) / w.sum()
            if np.linalg.norm(nxt - cur) < 1e-12:
                cur = nxt
                break
            cur = nxt
        return Geometry.point(cur[0], cur[1], srid=g.srid)
    return unary_geom(col, f)


@register_op("st_generatepoints", 3, "point")
def st_generatepoints(col, n, seed=0):
    """point/constructor/GeneratePoints.java:13 — n seeded uniform points
    inside the polygon (rejection sampling over the bbox)."""
    from ..geom import to_wkb
    out = []
    for gi, g in enumerate(decode_geoms(col)):
        if g is None:
            out.append(None)
            continue
        rng = np.random.default_rng(np.random.PCG64(seed + gi))
        x0, y0, x1, y1 = g.bounds()
        got_x: list = []
        got_y: list = []
        tries = 0
        while len(got_x) < n and tries < 100:
            m = max(n * 4, 64)
            xs = rng.uniform(x0, x1, m)
            ys = rng.uniform(y0, y1, m)
            inside = alg.points_in_polygon(xs, ys, g)
            got_x.extend(xs[inside][:n - len(got_x)])
            got_y.extend(ys[inside][:n - len(got_y)])
            tries += 1
        out.append([to_wkb(Geometry.point(px, py, srid=g.srid))
                    for px, py in zip(got_x, got_y)])
    return pa.array(out, type=pa.list_(pa.binary()))


@register_op("st_pointinsidecircle", 4, "point")
def st_pointinsidecircle(col, cx, cy, radius):
    """point/attribute/PointInsideCircle.java:18."""
    def f(g):
        return math.hypot(g.coords[0] - cx, g.coords[1] - cy) <= radius
    return unary_bool(col, f)


@register_op("st_collectionextract", 2, "transform")
def st_collectionextract(col, dim):
    """CollectionExtract.java:24 — keep components of dimension dim
    (1=points, 2=lines, 3=polygons, PostGIS convention)."""
    type_map = {1: (1,), 2: (2,), 3: (3,)}
    multi_map = {1: 4, 2: 5, 3: 6}

    def f(g):
        parts = alg._collect(g, type_map[dim])
        if not parts:
            return Geometry.empty(multi_map[dim], g.srid)
        if len(parts) == 1:
            return parts[0]
        return Geometry.multi(multi_map[dim], parts, srid=g.srid)
    return unary_geom(col, f)


@register_op("st_multi", 1, "transform")
def st_multi(col):
    """Multi.java:22 — promote to multi-geometry."""
    promote = {1: 4, 2: 5, 3: 6}

    def f(g):
        if g.type in promote:
            return Geometry.multi(promote[g.type], [g], srid=g.srid)
        return g
    return unary_geom(col, f)


@register_op("st_frechetdistance", 2, "measure")
def st_frechetdistance(col_a, col_b):
    """Discrete Fréchet distance (FrechetDistance.java — vendored
    heigit/ors implementation in the reference; standard DP here)."""
    def f(a, b):
        p = a.all_coords()[:, :2]
        q = b.all_coords()[:, :2]
        n, m = len(p), len(q)
        d = np.linalg.norm(p[:, None, :] - q[None, :, :], axis=2)
        ca = np.full((n, m), -1.0)
        ca[0, 0] = d[0, 0]
        for i in range(1, n):
            ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
        for j in range(1, m):
            ca[0, j] = max(ca[0, j - 1], d[0, j])
        for i in range(1, n):
            for j in range(1, m):
                ca[i, j] = max(min(ca[i - 1, j], ca[i - 1, j - 1],
                                   ca[i, j - 1]), d[i, j])
        return float(ca[n - 1, m - 1])
    return binary_float(col_a, col_b, f)


def vw_round_simplify(ds, grp_col: str, order_col: str,
                      x_col: str, y_col: str, rounds: int = 3):
    """Bounded-round Visvalingam–Whyatt simplification over integer
    polylines (Visvalingam & Whyatt 1993, the round-based exact
    variant): each round removes, per group, THE single interior
    point with the smallest effective triangle area
    |cross((p-prev),(next-prev))| (ties to the smallest sequence
    position); endpoints never move. Integer coordinates make every
    area comparison int64-exact, so the surviving point set is
    hash-gateable — the oracle witness for the simplification family
    (st_simplify / st_simplifyvw are tolerance-based and
    pytest-gated only). Fixed round count = unrolled SQL twin, the
    kcore bounded-round contract.

    Output (grp, seq, x, y): seq is the rank of ``order_col`` within
    the group (ROW_NUMBER semantics). One groupby shuffle; per-group
    work is ``rounds`` vectorized area passes, never a per-point
    Python loop."""

    def simp(group: pa.Table) -> pa.Table:
        o = group.column(order_col).to_numpy(zero_copy_only=False)
        x = group.column(x_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = group.column(y_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(o, kind="stable")
        x, y = x[order], y[order]
        seq = np.arange(1, len(x) + 1, dtype=np.int64)
        for _ in range(rounds):
            if len(x) <= 2:
                break
            area = np.abs((x[1:-1] - x[:-2]) * (y[2:] - y[:-2])
                          - (x[2:] - x[:-2]) * (y[1:-1] - y[:-2]))
            i = int(np.argmin(area)) + 1  # first min = smallest seq
            keep = np.ones(len(x), bool)
            keep[i] = False
            x, y, seq = x[keep], y[keep], seq[keep]
        gcol = group.column(grp_col)
        return pa.table({
            "grp": pa.array([gcol[0].as_py()] * len(x),
                            type=gcol.type),
            "seq": pa.array(seq),
            "x": pa.array(x), "y": pa.array(y)})

    return ds.groupby(grp_col).map_groups(simp,
                                          batch_format="pyarrow")
