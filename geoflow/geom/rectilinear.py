"""Vectorized boolean-area engine for AXIS-ALIGNED (rectilinear)
polygons — the dominant real-world case for tile/bbox workloads.

The general overlay engine (clipping.py) nodes and classifies one
Python geometry pair per row; for rectilinear operands none of that is
needed: compress each pair's x/y coordinates, classify the resulting
grid cells by even-odd crossing counts (one vectorized pass per edge
slot over the whole batch), and read all four boolean areas
(intersection / union / difference / symdifference) off the cell masks.
No noding, no per-row Python in the hot loop.

Exactness: every edge lies on a compressed coordinate, so each grid
cell is entirely inside or outside each operand and its midpoint
classifies it exactly. (If two distinct coordinates are so close that
their float midpoint is not strictly between them, the affected cell
width is ≤ 1 ulp and the area error is negligible — documented limit.)

Reference semantics: areas agree with running the overlay engine
(GeometryWrapper.java:715/755/794/808 shapes) and are fuzz-tested
against it (tests/test_setops.py)."""

from __future__ import annotations

import numpy as np

from .types import Geometry


def axis_aligned_rings(g: Geometry, max_edges: int = 64):
    """All rings of an areal geometry if every edge is axis-parallel and
    the total edge count is ≤ max_edges; else None."""
    if g is None or g.type not in (3, 6):
        return None
    rings = []
    total = 0
    parts = g.parts if g.parts is not None else [g]
    for p in parts:
        if p.type != 3 or p.rings is None:
            return None
        for r in p.rings:
            c = np.asarray(r[:, :2], dtype=np.float64)
            dx = c[1:, 0] - c[:-1, 0]
            dy = c[1:, 1] - c[:-1, 1]
            if not np.all((dx == 0.0) | (dy == 0.0)):
                return None
            total += len(c) - 1
            if total > max_edges:
                return None
            rings.append(c)
    return rings if rings else None


def _pack_edges(ring_lists, max_edges):
    """list (len R) of ring lists → (R, E, 4) [x0, y0, x1, y1] padded
    with NaN. Only vertical edges matter for the +x crossing test;
    horizontal edges are padded out (they never cross a +x ray from a
    cell midpoint that's strictly between compressed y's)."""
    n = len(ring_lists)
    packed = np.full((n, max_edges, 4), np.nan)
    for i, rings in enumerate(ring_lists):
        e = 0
        for c in rings:
            a, b = c[:-1], c[1:]
            vert = a[:, 0] == b[:, 0]
            va, vb = a[vert], b[vert]
            m = len(va)
            packed[i, e:e + m, 0] = va[:, 0]
            packed[i, e:e + m, 1] = np.minimum(va[:, 1], vb[:, 1])
            packed[i, e:e + m, 2] = va[:, 0]
            packed[i, e:e + m, 3] = np.maximum(va[:, 1], vb[:, 1])
            e += m
    return packed


def _compress(vals):
    """(R, K) padded coordinate matrix → sorted-unique per row with
    duplicates pushed to +inf, re-sorted."""
    s = np.sort(vals, axis=1)
    dup = np.zeros_like(s, dtype=bool)
    dup[:, 1:] = s[:, 1:] == s[:, :-1]
    s[dup] = np.inf
    return np.sort(s, axis=1)


def _coords_of(ring_lists, axis, max_v):
    n = len(ring_lists)
    out = np.full((n, max_v), np.inf)
    for i, rings in enumerate(ring_lists):
        v = np.concatenate([c[:-1, axis] for c in rings])
        out[i, :len(v)] = v
    return out


def _inside(edges, cx, cy):
    """(R, E, 4) vertical edges, (R, CX) cell mid-x, (R, CY) cell mid-y
    → (R, CX, CY) even-odd inside mask. One vectorized pass per edge
    slot (E is small); NaN pads compare False everywhere."""
    n, n_edges, _ = edges.shape
    cnt = np.zeros((n, cx.shape[1], cy.shape[1]), dtype=np.int16)
    with np.errstate(invalid="ignore"):
        for e in range(n_edges):
            ex = edges[:, e, 0]
            y0 = edges[:, e, 1]
            y1 = edges[:, e, 3]
            hit = (ex[:, None, None] > cx[:, :, None]) \
                & (y0[:, None, None] <= cy[:, None, :]) \
                & (cy[:, None, :] < y1[:, None, None])
            cnt += hit
    return (cnt & 1).astype(bool)


def aligned_mask_uniform(coords: np.ndarray) -> np.ndarray:
    """(n, k, 2) closed rings → per-row bool: every edge axis-parallel
    and the ring non-degenerate. Fully vectorized."""
    dx = coords[:, 1:, 0] - coords[:, :-1, 0]
    dy = coords[:, 1:, 1] - coords[:, :-1, 1]
    return ((dx == 0.0) | (dy == 0.0)).all(axis=1)


def _pack_edges_uniform(coords: np.ndarray) -> np.ndarray:
    """(n, k, 2) closed rings → (n, k-1, 4) vertical-edge matrix
    [x, ymin, x, ymax], horizontal edges NaN-padded. Vectorized."""
    a, b = coords[:, :-1, :], coords[:, 1:, :]
    vert = (a[:, :, 0] == b[:, :, 0]) & (a[:, :, 1] != b[:, :, 1])
    ex = np.where(vert, a[:, :, 0], np.nan)
    y0 = np.where(vert, np.minimum(a[:, :, 1], b[:, :, 1]), np.nan)
    y1 = np.where(vert, np.maximum(a[:, :, 1], b[:, :, 1]), np.nan)
    return np.stack([ex, y0, ex, y1], axis=2)


def boolean_areas_uniform(ca: np.ndarray, cb: np.ndarray):
    """Batch boolean areas for uniform-vertex-count axis-aligned
    single-ring operand pairs: ca (n, ka, 2), cb (n, kb, 2), closed
    rings. Zero per-row Python. Same return contract as
    boolean_areas_rectilinear."""
    n = len(ca)
    if n == 0:
        z = np.empty(0)
        return {"inter": z, "union": z, "diff": z, "sym": z}
    ea = _pack_edges_uniform(ca)
    eb = _pack_edges_uniform(cb)
    pad_a = np.where(np.isfinite(ca[:, :-1, :]), ca[:, :-1, :], np.inf)
    pad_b = np.where(np.isfinite(cb[:, :-1, :]), cb[:, :-1, :], np.inf)
    xs = _compress(np.concatenate([pad_a[:, :, 0], pad_b[:, :, 0]], axis=1))
    ys = _compress(np.concatenate([pad_a[:, :, 1], pad_b[:, :, 1]], axis=1))
    return _areas_from_grid(ea, eb, xs, ys)


def _areas_from_grid(ea, eb, xs, ys):
    with np.errstate(invalid="ignore"):
        dx = xs[:, 1:] - xs[:, :-1]
        dy = ys[:, 1:] - ys[:, :-1]
        dx[~np.isfinite(dx)] = 0.0
        dy[~np.isfinite(dy)] = 0.0
        cx = 0.5 * (xs[:, 1:] + xs[:, :-1])
        cy = 0.5 * (ys[:, 1:] + ys[:, :-1])
    in_a = _inside(ea, cx, cy)
    in_b = _inside(eb, cx, cy)
    cell = dx[:, :, None] * dy[:, None, :]
    return {"inter": (cell * (in_a & in_b)).sum(axis=(1, 2)),
            "union": (cell * (in_a | in_b)).sum(axis=(1, 2)),
            "diff": (cell * (in_a & ~in_b)).sum(axis=(1, 2)),
            "sym": (cell * (in_a ^ in_b)).sum(axis=(1, 2))}


def boolean_areas_rectilinear(rings_a, rings_b):
    """Batch boolean areas for axis-aligned operand pairs.

    rings_a / rings_b: equal-length lists, each element a list of closed
    ring arrays (as from axis_aligned_rings). Returns dict of float64
    arrays: inter, union, diff (A−B), sym."""
    n = len(rings_a)
    if n == 0:
        z = np.empty(0)
        return {"inter": z, "union": z, "diff": z, "sym": z}
    max_va = max(sum(len(c) - 1 for c in r) for r in rings_a)
    max_vb = max(sum(len(c) - 1 for c in r) for r in rings_b)
    ea = _pack_edges(rings_a, max_va)
    eb = _pack_edges(rings_b, max_vb)
    xs = _compress(np.concatenate(
        [_coords_of(rings_a, 0, max_va), _coords_of(rings_b, 0, max_vb)],
        axis=1))
    ys = _compress(np.concatenate(
        [_coords_of(rings_a, 1, max_va), _coords_of(rings_b, 1, max_vb)],
        axis=1))
    return _areas_from_grid(ea, eb, xs, ys)


# ---------------------------------------------------------------------------
# geometry output: compressed-grid mask → areal Geometry
# ---------------------------------------------------------------------------

# turn preference at degree-4 vertices: leftmost turn first — keeps the
# two even-odd regions meeting at a checkerboard corner as SEPARATE
# rings instead of one self-intersecting loop
_DIRS = ((1, 0), (0, 1), (-1, 0), (0, -1))


def _turn_order(d):
    dx, dy = d
    left = (-dy, dx)
    right = (dy, -dx)
    return (left, d, right)


def mask_to_geometry(xs, ys, mask, srid=0):
    """Boolean cell mask over a compressed grid → areal Geometry
    (POLYGON / MULTIPOLYGON, holes included) by rectilinear boundary
    tracing. Boundary edges are oriented interior-on-left, so traced
    shells come out CCW and holes CW; collinear runs are dissolved.
    Returns an empty polygon for an all-false mask."""
    if not mask.any():
        return Geometry.empty(3, srid)
    nx, ny = mask.shape
    pad = np.zeros((nx + 2, ny + 2), dtype=bool)
    pad[1:-1, 1:-1] = mask
    core = pad[1:-1, 1:-1]
    segs = {}   # (vertex, direction) -> end vertex

    def put(ii, jj, d):
        for i, j in zip(ii, jj):
            segs[((i, j), d)] = (i + d[0], j + d[1])

    # bottom edges (+x): cell inside, neighbor below outside; vertex
    # grid indexes the compressed coordinates
    bi, bj = np.nonzero(core & ~pad[1:-1, :-2])
    put(bi, bj, (1, 0))
    # top edges (−x)
    ti, tj = np.nonzero(core & ~pad[1:-1, 2:])
    put(ti + 1, tj + 1, (-1, 0))
    # right edges (+y)
    ri, rj = np.nonzero(core & ~pad[2:, 1:-1])
    put(ri + 1, rj, (0, 1))
    # left edges (−y)
    li, lj = np.nonzero(core & ~pad[:-2, 1:-1])
    put(li, lj + 1, (0, -1))

    loops = []
    while segs:
        (v0, d0), v1 = next(iter(segs.items()))
        del segs[(v0, d0)]
        loop = [v0]
        v, d = v1, d0
        while v != v0:
            loop.append(v)
            for nd in _turn_order(d):
                if (v, nd) in segs:
                    nv = segs.pop((v, nd))
                    v, d = nv, nd
                    break
            else:
                raise AssertionError("open boundary in rectilinear mask")
        loops.append(loop)

    rings = []
    for loop in loops:
        # dissolve collinear vertices
        n = len(loop)
        keep = []
        for t in range(n):
            p_prev = loop[t - 1]
            p = loop[t]
            p_next = loop[(t + 1) % n]
            d1 = (p[0] - p_prev[0], p[1] - p_prev[1])
            d2 = (p_next[0] - p[0], p_next[1] - p[1])
            if (d1[0] == 0) != (d2[0] == 0):
                keep.append(p)
        c = np.array([[xs[i], ys[j]] for i, j in keep + keep[:1]])
        rings.append(c)

    from . import algorithms as alg
    shells = []
    holes = []
    for r in rings:
        (shells if alg.ring_signed_area(r) > 0 else holes).append(r)
    if not shells:      # numerical degenerate; shouldn't happen
        return Geometry.empty(3, srid)
    polys = [[s] for s in shells]
    if holes:
        from .clipping import _even_odd_many
        for h in holes:
            pt = h[0:1]
            for p in polys:
                if _even_odd_many(pt, [p[0]])[0]:
                    p.append(h)
                    break
    if len(polys) == 1:
        return Geometry(3, rings=polys[0], srid=srid)
    return Geometry.multi(6, [Geometry(3, rings=p, srid=srid)
                              for p in polys], srid=srid)


def _pair_grid(ra, rb):
    """Per-pair compressed grid + inside masks for two axis-aligned
    ring lists. Returns (xs, ys, in_a, in_b) with xs/ys the finite
    compressed coordinates and masks shaped (len(xs)-1, len(ys)-1)."""
    ea = _pack_edges([ra], max(sum(len(c) - 1 for c in ra), 1))
    eb = _pack_edges([rb], max(sum(len(c) - 1 for c in rb), 1))
    ax = np.concatenate([c[:-1, 0] for c in ra] + [c[:-1, 0] for c in rb])
    ay = np.concatenate([c[:-1, 1] for c in ra] + [c[:-1, 1] for c in rb])
    xs = np.unique(ax)
    ys = np.unique(ay)
    cx = (0.5 * (xs[1:] + xs[:-1]))[None, :]
    cy = (0.5 * (ys[1:] + ys[:-1]))[None, :]
    in_a = _inside(ea, cx, cy)[0]
    in_b = _inside(eb, cx, cy)[0]
    return xs, ys, in_a, in_b


def _degenerate_contact(in_a, in_b):
    """True when A and B touch along edges or corners OUTSIDE the areal
    intersection — there JTS intersection emits 1D/0D pieces, so the
    areal fast path must fall back to the general overlay."""
    both = in_a & in_b
    # vertical cell interfaces: boundary of A AND boundary of B, not
    # adjacent to an intersection cell
    av = in_a[:-1, :] != in_a[1:, :]
    bv = in_b[:-1, :] != in_b[1:, :]
    tv = both[:-1, :] | both[1:, :]
    if (av & bv & ~tv).any():
        return True
    ah = in_a[:, :-1] != in_a[:, 1:]
    bh = in_b[:, :-1] != in_b[:, 1:]
    th = both[:, :-1] | both[:, 1:]
    if (ah & bh & ~th).any():
        return True
    # corner (point) contacts: diagonal cells of A and B meeting at a
    # vertex none of whose four cells is in the intersection
    a00 = in_a[:-1, :-1]
    a11 = in_a[1:, 1:]
    a10 = in_a[1:, :-1]
    a01 = in_a[:-1, 1:]
    b00 = in_b[:-1, :-1]
    b11 = in_b[1:, 1:]
    b10 = in_b[1:, :-1]
    b01 = in_b[:-1, 1:]
    t4 = both[:-1, :-1] | both[1:, 1:] | both[1:, :-1] | both[:-1, 1:]
    diag = (a00 & b11) | (a11 & b00) | (a10 & b01) | (a01 & b10)
    if (diag & ~t4).any():
        return True
    return False


def rect_boolean_geometry(ra, rb, op, srid=0):
    """Boolean GEOMETRY for one axis-aligned pair without noding:
    compressed grid + mask combine + boundary tracing. Returns None
    when the op's exact result has lower-dimensional pieces the areal
    path cannot express (intersection with edge/corner-only contact) —
    caller falls back to the general overlay."""
    xs, ys, in_a, in_b = _pair_grid(ra, rb)
    if op == "intersection":
        if _degenerate_contact(in_a, in_b):
            return None
        m = in_a & in_b
    elif op == "union":
        m = in_a | in_b
    elif op == "difference":
        m = in_a & ~in_b
    elif op == "symdifference":
        m = in_a ^ in_b
    else:
        raise ValueError(op)
    return mask_to_geometry(xs, ys, m, srid)
