"""Straight skeleton of a simple polygon (wavefront simulation).

geometry/transform/StraightSkeleton.java:33 is a *stub* in the
reference (SURVEY.md Appendix A), so semantics follow the public
definition (Aichholzer, Aurenhammer, Alberts, Gärtner 1995) with the
event-queue formulation of Felkel & Obdržálek 1998: polygon edges sweep
inward at unit speed, vertices trace angular bisectors, and the
skeleton is the union of the traced arcs. Edge events (an edge shrinks
to zero) and split events (a reflex vertex hits an opposite edge) are
processed in time order from a priority queue with lazy invalidation.

Scope: simple polygons WITHOUT holes (the hole case needs wavefront
merging / vertex events; PostGIS-SFCGAL supports it, this
implementation raises a clear error). A second documented limit: the
rare *vertex event* — two reflex wedges pinching the wavefront against
each other without either piercing an edge interior (needs the full
CGAL-style event set) — is DETECTED by post-validating every skeleton
junction against the input polygon (a wavefront point can never leave
it) and raises RuntimeError instead of returning a wrong skeleton.
On random spiky star-polygon fuzz this triggers on <1% of inputs;
convex, rectilinear and typical footprint shapes are unaffected. Exactness anchors used by the
tests: a triangle's skeleton meets at its incenter; for any convex
polygon the straight skeleton equals the medial axis (every arc point
is equidistant from its two defining edges and no other edge line is
closer).

Vertex kinematics: a wavefront vertex between edges with inward unit
normals nL, nR moves with velocity v = (nL + nR) / (1 + nL·nR), the
intersection point of the two unit-speed offset lines (blows up as the
interior angle approaches 0 or 2π; such slivers are rejected by the
eps guard).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

__all__ = ["straight_skeleton_arcs"]

_EPS = 1e-9


class _Vertex:
    __slots__ = ("pos", "t0", "vel", "eL", "eR", "prev", "nxt",
                 "processed", "reflex", "split_seen")

    def __init__(self, pos, t0, eL, eR):
        self.pos = np.asarray(pos, dtype=np.float64)
        self.t0 = float(t0)
        self.eL = eL          # edge (pt, dir, n, c): incoming wavefront edge
        self.eR = eR          # outgoing wavefront edge
        nL, nR = eL[2], eR[2]
        denom = 1.0 + float(nL @ nR)
        if abs(denom) < _EPS:
            denom = math.copysign(_EPS, denom if denom != 0 else 1.0)
        self.vel = (nL + nR) / denom
        # reflex: interior angle > pi <=> cross(dL, dR) < 0 for CCW
        self.reflex = float(np.cross(eL[1], eR[1])) < -_EPS
        self.processed = False
        self.prev = None
        self.nxt = None
        self.split_seen = set()

    def at(self, t):
        return self.pos + (t - self.t0) * self.vel


def _edge(p, q):
    """Edge record (point, unit direction, inward unit normal, offset c)
    for a CCW ring: interior is to the LEFT of p→q, inward normal is
    (-dy, dx); the support line is n·x = c, offset line n·x = c + t."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    d = q - p
    ln = math.hypot(d[0], d[1])
    if ln < _EPS:
        return None
    d = d / ln
    n = np.array([-d[1], d[0]])
    return (p, d, n, float(n @ p))


def _edge_event_time(a: "_Vertex", b: "_Vertex"):
    """Collapse time of the shared edge between adjacent a, b (a.eR is
    b.eL): solve along the edge direction. None if never."""
    d = a.eR[1]
    rel_p = (b.pos - b.t0 * b.vel) - (a.pos - a.t0 * a.vel)
    rel_v = b.vel - a.vel
    denom = float(rel_v @ d)
    if abs(denom) < _EPS:
        return None
    t = -float(rel_p @ d) / denom
    if t < max(a.t0, b.t0) - _EPS:
        return None
    return t


def _split_event(v: "_Vertex", edge, ea: "_Vertex", eb: "_Vertex"):
    """Split event of reflex vertex v against opposite wavefront edge
    ``edge`` currently bounded by LAV vertices ea→eb. Returns (t, point)
    or None. Validity: the split point must lie inside the moving edge
    span (behind both endpoint bisectors) and strictly in the future."""
    n, c = edge[2], edge[3]
    nv = float(n @ v.vel)
    if abs(nv - 1.0) < _EPS:
        return None
    t = (c - float(n @ v.pos) + v.t0 * nv) / (nv - 1.0)
    if t < v.t0 + _EPS:
        return None
    B = v.at(t)
    # B must be within the wavefront edge segment at time t: between
    # the endpoint trajectories, measured along the edge direction.
    d = edge[1]
    sa = float((B - ea.at(t)) @ d)
    sb = float((eb.at(t) - B) @ d)
    if sa < -1e-7 or sb < -1e-7:
        return None
    return t, B


class _Skeletonizer:
    def __init__(self, ring: np.ndarray):
        pts = np.asarray(ring, dtype=np.float64)[:, :2]
        if np.array_equal(pts[0], pts[-1]):
            pts = pts[:-1]
        # drop exact consecutive duplicates
        keep = np.ones(len(pts), bool)
        keep[1:] = np.abs(pts[1:] - pts[:-1]).max(axis=1) > 0
        pts = pts[keep]
        if len(pts) < 3:
            raise ValueError("straight skeleton: degenerate ring")
        # force CCW
        area2 = float(np.cross(pts, np.roll(pts, -1, axis=0)).sum())
        if area2 < 0:
            pts = pts[::-1].copy()
        self.scale = float(np.abs(pts).max()) or 1.0
        self.pts = pts
        n = len(pts)
        edges = [_edge(pts[i], pts[(i + 1) % n]) for i in range(n)]
        if any(e is None for e in edges):
            raise ValueError("straight skeleton: zero-length edge")
        self.verts = []
        for i in range(n):
            v = _Vertex(pts[i], 0.0, edges[i - 1], edges[i])
            self.verts.append(v)
        for i, v in enumerate(self.verts):
            v.prev = self.verts[i - 1]
            v.nxt = self.verts[(i + 1) % n]
        self.arcs = []
        self._junctions = []
        self.heap = []
        self.counter = 0
        for v in self.verts:
            self._queue_events(v)

    # -- event queue ------------------------------------------------------

    def _push(self, t, kind, payload):
        self.counter += 1
        heapq.heappush(self.heap, (t, self.counter, kind, payload))

    def _push_split(self, v, edge, t):
        """Queue a split candidate once per (edge, time) pair — the
        self-healing requeues recompute candidates after every LAV
        change, and without this dedup identical failing candidates
        ping-pong between pop-revalidation and requeue forever."""
        key = (id(edge), round(float(t), 9))
        if key in v.split_seen:
            return
        v.split_seen.add(key)
        self._push(t, "split", (v, edge))

    def _queue_events(self, v: "_Vertex"):
        t = _edge_event_time(v, v.nxt)
        if t is not None:
            self._push(t, "edge", (v, v.nxt))
        if v.reflex:
            # candidate opposite edges: every current wavefront edge of
            # v's LAV except the two incident to v (w.eR is the edge
            # w→w.nxt; the walk stops before w.nxt becomes v, which
            # would be v.eL)
            w = v.nxt
            while w.nxt is not v:
                res = _split_event(v, w.eR, w, w.nxt)
                if res is not None:
                    self._push_split(v, w.eR, res[0])
                w = w.nxt

    def _emit(self, a, b):
        if float(np.hypot(*(np.asarray(a) - np.asarray(b)))) \
                > 1e-12 * self.scale:
            self.arcs.append((np.asarray(a, dtype=np.float64).copy(),
                              np.asarray(b, dtype=np.float64).copy()))

    # -- main loop --------------------------------------------------------

    def run(self, max_events=None):
        limit = max_events or (64 * len(self.verts) ** 2 + 256)
        steps = 0
        while self.heap:
            steps += 1
            if steps > limit:
                raise RuntimeError("straight skeleton: event overrun "
                                   "(non-simple input?)")
            t, _, kind, payload = heapq.heappop(self.heap)
            if kind == "edge":
                self._handle_edge(t, *payload)
            else:
                self._handle_split(t, *payload)
        for P, t in self._junctions:
            tol = 1e-6 * max(t, 1e-3 * self.scale)
            if self._clearance(P) < t - tol:
                raise RuntimeError(
                    "straight skeleton: unhandled vertex event "
                    "(reflex-reflex wavefront pinch) — junction "
                    f"{P.tolist()} violates the clearance invariant")
        return self.arcs

    def _clearance(self, P):
        """SIGNED distance from P to the polygon boundary (negative
        outside). A skeleton junction born at event time t must have
        clearance exactly t — a stale event's junction either left the
        polygon (negative) or sits behind some wavefront (short)."""
        pts = self.pts
        x, y = float(P[0]), float(P[1])
        n = len(pts)
        best = math.inf
        inside = False
        j = n - 1
        for i in range(n):
            xi, yi = pts[i]
            xj, yj = pts[j]
            dx, dy = xj - xi, yj - yi
            L2 = dx * dx + dy * dy
            s = 0.0 if L2 == 0 else min(max(((x - xi) * dx + (y - yi) * dy)
                                            / L2, 0.0), 1.0)
            ex, ey = x - (xi + s * dx), y - (yi + s * dy)
            best = min(best, ex * ex + ey * ey)
            if (yi > y) != (yj > y):
                if x < xi + (y - yi) / (yj - yi) * (xj - xi):
                    inside = not inside
            j = i
        d = math.sqrt(best)
        return d if inside else -d

    def _handle_edge(self, t, a: "_Vertex", b: "_Vertex"):
        if a.processed or b.processed or a.nxt is not b:
            return
        pa, pb = a.at(t), b.at(t)
        P = 0.5 * (pa + pb)
        self._junctions.append((P, t))
        if a.prev is b:          # LAV of exactly 2: closing ridge
            a.processed = b.processed = True
            self._emit(a.pos, P)
            self._emit(b.pos, P)
            return
        a.processed = b.processed = True
        self._emit(a.pos, P)
        self._emit(b.pos, P)
        if a.prev is b.nxt:      # LAV of exactly 3 collapses to a point
            c = a.prev
            c.processed = True
            self._emit(c.pos, c.at(t))
            self._emit(c.at(t), P)
            return
        nv = _Vertex(P, t, a.eL, b.eR)
        nv.prev = a.prev
        nv.nxt = b.nxt
        a.prev.nxt = nv
        b.nxt.prev = nv
        self._queue_events(nv)
        tprev = _edge_event_time(nv.prev, nv)
        if tprev is not None:
            self._push(tprev, "edge", (nv.prev, nv))
        # wavefront spans moved: refresh split candidates of every
        # reflex vertex still on this LAV (a split rejected at queue
        # time can become valid once edge events replace endpoints)
        w = nv.nxt
        while w is not nv:
            if w.reflex:
                self._requeue_splits(w, t)
            w = w.nxt

    def _requeue_splits(self, v: "_Vertex", now: float):
        """Self-heal after a stale split event: recompute v's split
        candidates against the CURRENT LAV (spans move as edge events
        replace vertices, so a candidate rejected at queue time can
        become valid later — and vice versa)."""
        w = v.nxt
        while w.nxt is not v and w is not v:
            res = _split_event(v, w.eR, w, w.nxt)
            if res is not None:
                self._push_split(v, w.eR, max(res[0], now))
            w = w.nxt

    def _handle_split(self, t, v: "_Vertex", opp_edge):
        if v.processed:
            return
        # find the CURRENT wavefront edge in v's LAV whose support line
        # is opp_edge (the LAV vertex w with w.eR is opp_edge)
        w = v.nxt
        found = None
        while w is not v:
            if w.eR is opp_edge and w.nxt is not v and w is not v:
                found = w
                break
            w = w.nxt
        if found is None:
            self._requeue_splits(v, t)
            return
        res = _split_event(v, opp_edge, found, found.nxt)
        if res is None or abs(res[0] - t) > 1e-6 * max(1.0, t):
            self._requeue_splits(v, t)
            return
        t, B = res
        v.processed = True
        self._junctions.append((B, t))
        self._emit(v.pos, B)
        # split: LAV1 = v.prev ... found  + new vertex (v.eL, opp_edge)
        #        LAV2 = found.nxt ... v.nxt + new vertex (opp_edge, v.eR)
        v1 = _Vertex(B, t, v.eL, opp_edge)
        v2 = _Vertex(B, t, opp_edge, v.eR)
        p, nx = v.prev, v.nxt
        v1.prev = p
        v1.nxt = found.nxt
        found.nxt.prev = v1
        p.nxt = v1
        v2.prev = found
        v2.nxt = nx
        nx.prev = v2
        found.nxt = v2
        for nv in (v1, v2):
            # collapse immediately-degenerate 2-loops
            if nv.nxt is nv.prev:
                other = nv.nxt
                tt = _edge_event_time(nv, other)
                if tt is not None:
                    self._push(tt, "edge", (nv, other))
                else:
                    nv.processed = other.processed = True
                    self._emit(other.pos, other.at(t))
                continue
            self._queue_events(nv)
            tprev = _edge_event_time(nv.prev, nv)
            if tprev is not None:
                self._push(tprev, "edge", (nv.prev, nv))


def straight_skeleton_arcs(ring: np.ndarray) -> list:
    """Straight skeleton of a simple CCW/CW ring (closed or open array
    of 2D points) → list of (p, q) arc endpoint pairs."""
    return _Skeletonizer(ring).run()
