"""3D measure ops: Distance3D, ClosestPoint3D, LineLength3D,
MaxDistance3D (reference Distance3D.java:14, ClosestPoint3D.java:15,
LineLength3D.java:13, MaxDistance3D.java:14 — JTS Distance3DOp
semantics over XYZ coordinates).

Scope note (documented deviation): areal operands are measured via
their boundary segments (JTS additionally treats polygon interiors as
planar patches); puntal/lineal operands — the corpus cases — are exact.
Coordinates without Z measure like JTS's NaN-z behavior: LineLength3D
returns 0, distances fall back to 2D with z=0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import Geometry, to_wkb
from .kernels import decode_geoms
from .registry import register_op


def _coords3d(g: Geometry) -> np.ndarray:
    """(n,3) coordinates; missing z → NaN."""
    c = g.all_coords()
    if c.ndim == 1:
        c = c[None, :]
    out = np.full((len(c), 3), np.nan)
    out[:, :2] = c[:, :2]
    if g.has_z and c.shape[1] > 2:
        out[:, 2] = c[:, 2]
    return out


def _segments3d(g: Geometry):
    """(m,2,3) segment endpoints from lineal/ring components; empty for
    puntal geometries."""
    segs = []

    def add(c, has_z):
        c = np.asarray(c)
        if len(c) < 2:
            return
        p = np.full((len(c), 3), np.nan)
        p[:, :2] = c[:, :2]
        if has_z and c.shape[1] > 2:
            p[:, 2] = c[:, 2]
        segs.append(np.stack([p[:-1], p[1:]], axis=1))

    def walk(x):
        if x.type == 2:
            add(x.coords, x.has_z)
        elif x.type == 3:
            for r in x.rings:
                add(r, x.has_z)
        elif x.parts is not None:
            for p in x.parts:
                walk(p)

    walk(g)
    return np.concatenate(segs, axis=0) if segs else np.empty((0, 2, 3))


def _z0(a: np.ndarray) -> np.ndarray:
    return np.nan_to_num(a, nan=0.0)


def _seg_seg_3d(p1, q1, p2, q2):
    """min distance + nearest points between 3D segments (Ericson,
    Real-Time Collision Detection §5.1.9 — public algorithm)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = d1 @ d1
    e = d2 @ d2
    f = d2 @ r
    EPS = 1e-300
    if a <= EPS and e <= EPS:
        s = t = 0.0
    elif a <= EPS:
        s = 0.0
        t = min(max(f / e, 0.0), 1.0)
    else:
        c = d1 @ r
        if e <= EPS:
            t = 0.0
            s = min(max(-c / a, 0.0), 1.0)
        else:
            b = d1 @ d2
            den = a * e - b * b
            s = min(max((b * f - c * e) / den, 0.0), 1.0) if den > 0 else 0.0
            t = (b * s + f) / e
            if t < 0:
                t = 0.0
                s = min(max(-c / a, 0.0), 1.0)
            elif t > 1:
                t = 1.0
                s = min(max((b - c) / a, 0.0), 1.0)
    c1 = p1 + s * d1
    c2 = p2 + t * d2
    return float(np.linalg.norm(c1 - c2)), c1, c2


def _pt_seg_3d(p, a, b):
    d = b - a
    l2 = d @ d
    t = 0.0 if l2 == 0 else min(max((p - a) @ d / l2, 0.0), 1.0)
    c = a + t * d
    return float(np.linalg.norm(p - c)), c


def distance3d_pair(ga: Geometry, gb: Geometry):
    """(min 3D distance, nearest point on A)."""
    pa3 = _z0(_coords3d(ga))
    pb3 = _z0(_coords3d(gb))
    sa = _z0(_segments3d(ga))
    sb = _z0(_segments3d(gb))
    best = (np.inf, None)
    if len(sa) == 0 and len(sb) == 0:
        d = np.linalg.norm(pa3[:, None, :] - pb3[None, :, :], axis=2)
        i, j = np.unravel_index(np.argmin(d), d.shape)
        return float(d[i, j]), pa3[i]
    if len(sa) == 0:
        for p in pa3:
            for s in sb:
                d, _c = _pt_seg_3d(p, s[0], s[1])
                if d < best[0]:
                    best = (d, p)
        return best
    if len(sb) == 0:
        for p in pb3:
            for s in sa:
                d, c = _pt_seg_3d(p, s[0], s[1])
                if d < best[0]:
                    best = (d, c)
        return best
    for s1 in sa:
        for s2 in sb:
            d, c1, _c2 = _seg_seg_3d(s1[0], s1[1], s2[0], s2[1])
            if d < best[0]:
                best = (d, c1)
    return best


@register_op("st_distance3d", 2, "measure")
def st_distance3d(col_a, col_b):
    """Distance3D.java:14 (JTS Distance3DOp.distance)."""
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = np.full(len(ga), np.nan)
    for i, (a, b) in enumerate(zip(ga, gb)):
        if a is not None and b is not None:
            out[i] = distance3d_pair(a, b)[0]
    return pa.array(out, type=pa.float64())


@register_op("st_closestpoint3d", 2, "measure")
def st_closestpoint3d(col_a, col_b):
    """ClosestPoint3D.java:15 — nearest point ON A, returned as a 2D
    point (the reference drops z when rebuilding the coordinate)."""
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = [None] * len(ga)
    for i, (a, b) in enumerate(zip(ga, gb)):
        if a is None or b is None:
            continue
        _d, c = distance3d_pair(a, b)
        out[i] = to_wkb(Geometry.point(float(c[0]), float(c[1]),
                                       srid=a.srid))
    return pa.array(out, type=pa.binary())


@register_op("st_length3d", 1, "measure")
def st_length3d(col):
    """LineLength3D.java:13 — 3D length; any NaN z → 0 (reference
    h2gis-derived semantics)."""
    gs = decode_geoms(col)
    out = np.zeros(len(gs))
    for i, g in enumerate(gs):
        if g is None:
            out[i] = np.nan
            continue
        segs = _segments3d(g)
        if len(segs) == 0:
            continue
        if np.isnan(segs[..., 2]).any():
            out[i] = 0.0
            continue
        d = segs[:, 1, :] - segs[:, 0, :]
        out[i] = float(np.sqrt((d * d).sum(axis=1)).sum())
    return pa.array(out, type=pa.float64())


@register_op("st_maxdistance3d", 2, "measure")
def st_maxdistance3d(col_a, col_b):
    """MaxDistance3D.java:14 — max 3D distance between coordinates of A
    and B (vertex-based, as the reference computes)."""
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = np.full(len(ga), np.nan)
    for i, (a, b) in enumerate(zip(ga, gb)):
        if a is None or b is None:
            continue
        pa3 = _z0(_coords3d(a))
        pb3 = _z0(_coords3d(b))
        d = np.linalg.norm(pa3[:, None, :] - pb3[None, :, :], axis=2)
        out[i] = float(d.max())
    return pa.array(out, type=pa.float64())
