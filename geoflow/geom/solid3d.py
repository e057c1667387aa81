"""Convex-solid 3D booleans (Intersection3D / Difference3D / Volume).

The reference declares this surface and ships it unimplemented:
geometry/relation/Intersection3D.java:14 returns null around a
commented j3d bounds/segment sketch, and Difference3D.java:24 throws
UnsupportedOperationException. This module implements the engine's own
3D boolean algebra to the public semantics the names point at (PostGIS
SFCGAL ST_3DIntersection / ST_3DDifference / ST_Volume / ST_Extrude),
scoped to CONVEX solid operands — the j3d-bounds (box) case the
reference sketch targets, plus general convex polyhedra:

- a solid is a half-space system {x : A x <= b}; its boundary is
  emitted as an outward-oriented MULTIPOLYGON Z face set (the WKB form
  any consumer of PostGIS polyhedral output handles, and every 2.5D op
  in this engine already reads);
- intersection of convex solids is half-space concatenation;
- difference P \\ Q is the classic disjoint convex decomposition
  (piece_i = P ∩ H_1 ∩ … ∩ H_{i-1} ∩ ¬H_i over Q's half-spaces) with
  internal faces cancelled pairwise, so the result is one closed
  oriented boundary surface (generally non-convex);
- volume works for ANY closed outward-oriented face set (signed
  tetrahedron fan, divergence theorem) — including difference outputs.

Vertex enumeration is triple-plane intersection with feasibility
filtering (O(n_faces³), n_faces ≤ ~32 for realistic operands — boxes
have 6); all tolerances are relative to operand scale.
"""

from __future__ import annotations

import itertools

import numpy as np

from .types import MULTIPOLYGON, POLYGON, Geometry

__all__ = ["ConvexSolid", "solid_from_box", "solid_from_prism",
           "solid_from_faces", "intersect_solids", "difference_faces",
           "faces_volume", "solid_faces_geometry"]

_REL_EPS = 1e-9


class ConvexSolid:
    """{x : A x <= b}; vertices enumerated lazily."""

    __slots__ = ("A", "b", "_verts")

    def __init__(self, A: np.ndarray, b: np.ndarray):
        # normalize rows so every tolerance is a metric distance
        # (unnormalized short-edge rows made the feasibility check
        # admit spurious near-parallel-plane vertices)
        A = np.asarray(A, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        n = np.linalg.norm(A, axis=1)
        keep = n > 1e-30
        self.A = A[keep] / n[keep, None]
        self.b = b[keep] / n[keep]
        self._verts = None

    @property
    def vertices(self) -> np.ndarray:
        if self._verts is None:
            self._verts = _enumerate_vertices(self.A, self.b)
        return self._verts

    def is_empty(self) -> bool:
        """True when the feasible set has no 3D volume (infeasible, or
        degenerate: all vertices coplanar — e.g. two boxes touching on
        a face intersect in a zero-thickness slab)."""
        v = self.vertices
        if len(v) < 4:
            return True
        sv = np.linalg.svd(v - v.mean(axis=0), compute_uv=False)
        return bool(sv[2] <= max(self.scale() * 1e-7, sv[0] * 1e-12))

    def scale(self) -> float:
        v = self.vertices
        if len(v) == 0:
            return 1.0
        return max(1.0, float(np.abs(v).max()))


def _enumerate_vertices(A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """All feasible triple-plane intersection points, deduplicated."""
    n = len(A)
    if n < 4:
        return np.empty((0, 3))
    combos = np.array(list(itertools.combinations(range(n), 3)))
    M = A[combos]                       # (k, 3, 3); rows unit-norm
    dets = np.abs(np.linalg.det(M))
    ok = dets > 1e-9
    if not ok.any():
        return np.empty((0, 3))
    pts = np.linalg.solve(M[ok], b[combos[ok]])
    scale = max(1.0, np.abs(b).max())
    feas = (A @ pts.T <= b[:, None] + _REL_EPS * scale * 100).all(axis=0)
    pts = pts[feas]
    if len(pts) == 0:
        return pts
    # dedup on a scale-relative grid
    q = np.round(pts / (scale * _REL_EPS * 1000)).astype(np.int64)
    _, idx = np.unique(q, axis=0, return_index=True)
    return pts[np.sort(idx)]


def solid_from_box(x0, y0, z0, x1, y1, z1) -> ConvexSolid:
    A = np.array([[-1, 0, 0], [1, 0, 0], [0, -1, 0],
                  [0, 1, 0], [0, 0, -1], [0, 0, 1]], dtype=np.float64)
    b = np.array([-x0, x1, -y0, y1, -z0, z1], dtype=np.float64)
    return ConvexSolid(A, b)


def solid_from_prism(ring: np.ndarray, z0: float, z1: float) -> ConvexSolid:
    """Prism over a CONVEX CCW 2D ring (first point not repeated or
    repeated — both accepted), spanning z ∈ [z0, z1]."""
    r = np.asarray(ring, dtype=np.float64)[:, :2]
    if len(r) > 1 and np.allclose(r[0], r[-1]):
        r = r[:-1]
    if len(r) < 3:
        raise ValueError("prism ring needs >= 3 distinct points")
    # signed area -> enforce CCW
    x, y = r[:, 0], r[:, 1]
    area2 = np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
    if area2 < 0:
        r = r[::-1]
    nxt = np.roll(r, -1, axis=0)
    e = nxt - r
    # outward normal of a CCW edge is (ey, -ex)
    A = np.column_stack([e[:, 1], -e[:, 0], np.zeros(len(r))])
    b = A[:, 0] * r[:, 0] + A[:, 1] * r[:, 1]
    A = np.vstack([A, [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    b = np.concatenate([b, [-min(z0, z1), max(z0, z1)]])
    return ConvexSolid(A, b)


def solid_from_faces(g: Geometry) -> ConvexSolid:
    """MULTIPOLYGON Z face set (outward-oriented, as emitted by this
    module / st_extrude) → half-space system: each face contributes the
    plane through its ring with Newell-method normal."""
    faces = g.parts if g.parts is not None else [g]
    A_rows, b_rows = [], []
    for f in faces:
        ring = np.asarray(f.rings[0], dtype=np.float64)
        if ring.shape[1] < 3:
            raise ValueError("solid faces need Z coordinates")
        r = ring[:-1] if np.allclose(ring[0], ring[-1]) else ring
        nxt = np.roll(r, -1, axis=0)
        # Newell normal
        n = np.array([
            np.sum((r[:, 1] - nxt[:, 1]) * (r[:, 2] + nxt[:, 2])),
            np.sum((r[:, 2] - nxt[:, 2]) * (r[:, 0] + nxt[:, 0])),
            np.sum((r[:, 0] - nxt[:, 0]) * (r[:, 1] + nxt[:, 1]))])
        ln = np.linalg.norm(n)
        if ln < 1e-30:
            continue
        n = n / ln
        A_rows.append(n)
        b_rows.append(float(n @ r[0]))
    if len(A_rows) < 4:
        raise ValueError("not a closed solid face set")
    return ConvexSolid(np.array(A_rows), np.array(b_rows))


def intersect_solids(p: ConvexSolid, q: ConvexSolid) -> ConvexSolid:
    return ConvexSolid(np.vstack([p.A, q.A]), np.concatenate([p.b, q.b]))


def _solid_faces(s: ConvexSolid):
    """[(outward-oriented (k,3) vertex loop, not closed)] per active
    half-space."""
    if s.is_empty():
        return []
    v = s.vertices
    scale = s.scale()
    tol = scale * _REL_EPS * 2000
    out = []
    seen = set()
    for i in range(len(s.A)):
        n = s.A[i]
        ln = np.linalg.norm(n)
        if ln < 1e-30:
            continue
        on = np.abs(v @ n - s.b[i]) <= tol * ln
        pts = v[on]
        if len(pts) < 3:
            continue
        c = pts.mean(axis=0)
        nn = n / ln
        # in-plane basis
        u = np.cross(nn, [0.0, 0.0, 1.0])
        if np.linalg.norm(u) < 1e-9:
            u = np.cross(nn, [0.0, 1.0, 0.0])
        u = u / np.linalg.norm(u)
        w = np.cross(nn, u)
        ang = np.arctan2((pts - c) @ w, (pts - c) @ u)
        loop = pts[np.argsort(ang)]
        key = tuple(sorted(map(tuple, np.round(loop / (scale * 1e-9))
                               .astype(np.int64).tolist())))
        if key in seen:       # duplicate plane (e.g. P∩Q sharing a face)
            continue
        seen.add(key)
        out.append(loop)
    return out


def solid_faces_geometry(s: ConvexSolid, srid=4326) -> Geometry:
    """ConvexSolid → MULTIPOLYGON Z of outward-oriented boundary faces
    (empty MULTIPOLYGON when the solid is empty/degenerate)."""
    return _faces_to_geometry(_solid_faces(s), srid)


def _faces_to_geometry(loops, srid=4326) -> Geometry:
    parts = []
    for loop in loops:
        ring = np.vstack([loop, loop[:1]])
        g = Geometry(POLYGON, rings=[ring], srid=srid)
        g.has_z = True
        parts.append(g)
    out = Geometry(MULTIPOLYGON, parts=parts, srid=srid)
    out.has_z = True
    return out


def difference_faces(p: ConvexSolid, q: ConvexSolid, srid=4326) -> Geometry:
    """P \\ Q as ONE closed outward-oriented face set: disjoint convex
    decomposition, internal faces cancelled pairwise (a face shared by
    two pieces appears twice with the same vertex set — both copies are
    interior and dropped)."""
    pieces = []
    A_acc, b_acc = p.A, p.b
    for i in range(len(q.A)):
        flip_A = np.vstack([A_acc, -q.A[i][None, :]])
        flip_b = np.concatenate([b_acc, [-q.b[i]]])
        piece = ConvexSolid(flip_A, flip_b)
        if not piece.is_empty():
            pieces.append(piece)
        A_acc = np.vstack([A_acc, q.A[i][None, :]])
        b_acc = np.concatenate([b_acc, [q.b[i]]])
    all_loops = []
    keys = []
    scale = max([pc.scale() for pc in pieces], default=1.0)
    for pc in pieces:
        for loop in _solid_faces(pc):
            key = tuple(sorted(map(tuple,
                                   np.round(loop / (scale * 1e-9))
                                   .astype(np.int64).tolist())))
            all_loops.append(loop)
            keys.append(key)
    from collections import Counter
    cnt = Counter(keys)
    boundary = [loop for loop, key in zip(all_loops, keys)
                if cnt[key] == 1]
    return _faces_to_geometry(boundary, srid)


def faces_volume(g: Geometry) -> float:
    """Volume enclosed by a closed outward-oriented MULTIPOLYGON Z face
    set (signed tetrahedron fan from the origin — valid for non-convex
    closed surfaces, e.g. difference outputs)."""
    faces = g.parts if g.parts is not None else ([g] if g.rings else [])
    six_v = 0.0
    for f in faces:
        if f.rings is None:     # non-areal part (e.g. collection input)
            continue
        ring = np.asarray(f.rings[0], dtype=np.float64)
        r = ring[:-1] if len(ring) > 1 and np.allclose(ring[0], ring[-1]) \
            else ring
        if len(r) < 3 or r.shape[1] < 3:
            continue
        # det[v0, vi, vi+1] = v0 · (vi × vi+1), computed via cross/dot
        # (exact for integer coordinates — np.linalg.det's LU is NOT)
        cr = np.cross(r[1:-1], r[2:])
        six_v += float((r[0] * cr).sum())
    # single division: on integer operands Σdet = 6·V exactly, so the
    # result is the exact integer-valued double (hash-comparable)
    return abs(six_v) / 6.0
