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


def prism_faces_geometry(ring: np.ndarray, z0: float, z1: float,
                         srid=4326) -> Geometry:
    """Direct outward-oriented face set of the prism over a convex CCW
    ring — O(n) closed-form construction (bottom reversed, top as-is,
    one quad per edge), bypassing the O(n_faces³) vertex enumeration.
    Equals solid_faces_geometry(solid_from_prism(...)) up to face
    vertex order (equality fuzz in tests/test_solid3d.py)."""
    r = np.asarray(ring, dtype=np.float64)[:, :2]
    if len(r) > 1 and np.allclose(r[0], r[-1]):
        r = r[:-1]
    if len(r) < 3:
        raise ValueError("prism ring needs >= 3 distinct points")
    x, y = r[:, 0], r[:, 1]
    if np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y) < 0:
        r = r[::-1]
    z0, z1 = min(z0, z1), max(z0, z1)
    n = len(r)
    loops = []
    bot = np.column_stack([r[::-1], np.full(n, z0)])
    top = np.column_stack([r, np.full(n, z1)])
    loops.append(bot)
    loops.append(top)
    nxt = np.roll(r, -1, axis=0)
    for i in range(n):
        loops.append(np.array([
            [r[i, 0], r[i, 1], z0], [nxt[i, 0], nxt[i, 1], z0],
            [nxt[i, 0], nxt[i, 1], z1], [r[i, 0], r[i, 1], z1]]))
    return _faces_to_geometry(loops, srid)


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


def axis_box_bounds(s: ConvexSolid):
    """(x0, y0, z0, x1, y1, z1) when every half-space is axis-aligned
    (normals exactly ±e_k after normalization — true for box/rect-prism
    inputs), else None. Closed-form fast-path detector: the dominant
    real-world case (bounding boxes, tiles, voxels) skips the O(n³)
    vertex enumeration entirely."""
    A, b = s.A, s.b
    nz = A != 0.0
    if not (nz.sum(axis=1) == 1).all():
        return None
    if not np.isin(A[nz], (1.0, -1.0)).all():
        return None
    lo = np.full(3, -np.inf)
    hi = np.full(3, np.inf)
    for i in range(len(A)):
        k = int(np.nonzero(nz[i])[0][0])
        if A[i, k] > 0:
            hi[k] = min(hi[k], b[i])
        else:
            lo[k] = max(lo[k], -b[i])
    if not (np.isfinite(lo).all() and np.isfinite(hi).all()):
        return None
    return (*lo, *hi)


def _box_faces_geometry(x0, y0, z0, x1, y1, z1, srid=4326) -> Geometry:
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    return prism_faces_geometry(ring, z0, z1, srid)


def box_intersection_geometry(pa_, qa, srid=4326) -> Geometry:
    """Closed-form box∩box faces (empty MULTIPOLYGON when the overlap
    has no volume)."""
    lo = np.maximum(pa_[:3], qa[:3])
    hi = np.minimum(pa_[3:], qa[3:])
    if (hi - lo <= 0).any():
        return _faces_to_geometry([], srid)
    return _box_faces_geometry(*lo, *hi, srid=srid)


def box_difference_geometry(pa_, qa, srid=4326) -> Geometry:
    """Closed-form box \\ box: slab decomposition into ≤6 boxes (below/
    above in z, then left/right in x, then front/back in y within the
    overlap slab); faces of all pieces concatenated — internal walls
    appear in opposite orientations and cancel in the signed volume,
    same contract as difference_faces."""
    px0, py0, pz0, px1, py1, pz1 = pa_
    qx0, qy0, qz0, qx1, qy1, qz1 = qa
    lo = np.maximum(pa_[:3], qa[:3])
    hi = np.minimum(pa_[3:], qa[3:])
    if (hi - lo <= 0).any():        # disjoint: difference is P itself
        return _box_faces_geometry(*pa_, srid=srid)
    boxes = []
    if pz0 < qz0:
        boxes.append((px0, py0, pz0, px1, py1, qz0))
    if qz1 < pz1:
        boxes.append((px0, py0, qz1, px1, py1, pz1))
    zl, zh = max(pz0, qz0), min(pz1, qz1)
    if px0 < qx0:
        boxes.append((px0, py0, zl, qx0, py1, zh))
    if qx1 < px1:
        boxes.append((qx1, py0, zl, px1, py1, zh))
    xl, xh = max(px0, qx0), min(px1, qx1)
    if py0 < qy0:
        boxes.append((xl, py0, zl, xh, qy0, zh))
    if qy1 < py1:
        boxes.append((xl, qy1, zl, xh, py1, zh))
    parts = []
    for bx in boxes:
        parts.extend(_box_faces_geometry(*bx, srid=srid).parts)
    out = Geometry(MULTIPOLYGON, parts=parts, srid=srid)
    out.has_z = True
    return out


def axis_box_from_faces(g: Geometry):
    """(x0,y0,z0,x1,y1,z1) when every face of the (convex) face set
    lies in an axis-constant plane — detected directly on the ring
    coordinates, skipping half-space construction entirely (the hot
    path for box/rect-prism columns); else None."""
    faces = g.parts if g.parts is not None else ([g] if g.rings else [])
    if len(faces) < 4:
        return None
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for f in faces:
        if f.rings is None:
            return None
        r = np.asarray(f.rings[0], dtype=np.float64)
        if r.shape[1] < 3:
            return None
        mn = r.min(axis=0)
        mx = r.max(axis=0)
        scale = max(1.0, float(np.abs(r).max()))
        if not (mx - mn <= scale * 1e-9).any():
            return None            # no constant axis → not axis-aligned
        lo = np.minimum(lo, mn)
        hi = np.maximum(hi, mx)
    if (hi - lo <= 0).any():
        return None
    return (*lo, *hi)


def faces_volume_many(geoms) -> list:
    """Column-vectorized faces_volume: one flat coordinate array and
    one cross/dot pass for ALL rows' faces (the per-face numpy-call
    overhead dominated the scalar path — measured 8×). None rows →
    None. Equal to faces_volume per row exactly on integer operands
    (every product/sum exact below 2^53); within float reassociation
    otherwise (np.sum pairwise order differs)."""
    pts = []
    face_row = []          # row index per face
    face_len = []          # unclosed point count per face
    for ri, g in enumerate(geoms):
        if g is None:
            continue
        faces = g.parts if g.parts is not None else \
            ([g] if g.rings is not None else [])
        for f in faces:
            if f.rings is None:
                continue
            r = np.asarray(f.rings[0], dtype=np.float64)
            if len(r) > 1 and r.shape[1] >= 3 and \
                    np.array_equal(r[0], r[-1]):
                r = r[:-1]
            if len(r) < 3 or r.shape[1] < 3:
                continue
            pts.append(r[:, :3])
            face_row.append(ri)
            face_len.append(len(r))
    out = [None if g is None else 0.0 for g in geoms]
    if not pts:
        return [None if g is None else 0.0 for g in geoms]
    P = np.vstack(pts)
    face_len = np.asarray(face_len, dtype=np.int64)
    face_row = np.asarray(face_row, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(face_len)[:-1]])
    # adjacent cross products over the flat array; valid fan pairs for
    # a face [s, s+m) are positions p in [s+1, s+m-2]
    C = np.cross(P[:-1], P[1:])
    M = len(P)
    valid = np.zeros(M - 1, dtype=bool)
    # mark [s+1, s+m-1) per face via the diff trick
    marks = np.zeros(M, dtype=np.int64)
    np.add.at(marks, starts + 1, 1)
    np.add.at(marks, starts + face_len - 1, -1)
    valid = np.cumsum(marks[:-1]) > 0
    pair_face = np.repeat(np.arange(len(face_len)), face_len)[:-1]
    v0 = P[starts]                       # (n_faces, 3)
    terms = (C[valid] * v0[pair_face[valid]]).sum(axis=1)
    six_v = np.zeros(len(geoms), dtype=np.float64)
    np.add.at(six_v, face_row[pair_face[valid]], terms)
    for ri, g in enumerate(geoms):
        if g is not None:
            out[ri] = abs(six_v[ri]) / 6.0
    return out
