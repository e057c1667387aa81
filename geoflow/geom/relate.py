"""DE-9IM intersection matrix (dimension digits) for valid 2D
geometries — upgrade of the T/F approximation (Relate.java:13,
RelateMatch.java:6 in the reference expose JTS relate()/matches()).

Matrix rows/cols: Interior, Boundary, Exterior of A vs B; entries are
the dimension of the intersection: 'F', '0', '1', '2'.

Implemented pairings: point/point, point/line, point/polygon, line/line,
line/polygon, polygon/polygon (single or multi). Collinear line overlap
is detected segment-wise; degenerate inputs fall back to conservative
entries. GeometryCollections relate via their flattened components.
"""

from __future__ import annotations

import numpy as np

from .algorithms import (_collect, _points_on_segments, _proper_cross,
                         _segments, points_in_polygon, segments_intersect)
from .types import Geometry, LINESTRING, MULTIPOINT, POINT, POLYGON


def _dim(g: Geometry) -> int:
    from .algorithms import dimension
    return dimension(g)


def _pts(g: Geometry) -> np.ndarray:
    return g.all_coords()[:, :2]


def _boundary_points(g: Geometry) -> np.ndarray:
    """Mod-2 boundary of a lineal geometry: endpooints occurring an odd
    number of times."""
    ends = []
    for p in _collect(g, (LINESTRING,)):
        c = p.coords[:, :2]
        if len(c) == 0:
            continue
        if np.array_equal(c[0], c[-1]):
            continue  # closed ring: empty boundary
        ends.append(tuple(c[0]))
        ends.append(tuple(c[-1]))
    from collections import Counter
    cnt = Counter(ends)
    out = [p for p, k in cnt.items() if k % 2 == 1]
    return np.array(out) if out else np.empty((0, 2))


def _on_boundary_mask(px, py, poly: Geometry) -> np.ndarray:
    segs = []
    for p in _collect(poly, (POLYGON,)):
        for r in p.rings:
            segs.append(np.concatenate([r[:-1, :2], r[1:, :2]], axis=1))
    if not segs:
        return np.zeros(len(px), dtype=bool)
    s = np.concatenate(segs, axis=0)
    return _points_on_segments(np.asarray(px)[:, None], np.asarray(py)[:, None],
                               s[:, 0], s[:, 1], s[:, 2], s[:, 3])


def _pt_location(px, py, g: Geometry):
    """vector of 'I'/'B'/'E' for points vs geometry g."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(px)
    out = np.full(n, "E", dtype=object)
    if _collect(g, (POLYGON,)):
        on_b = _on_boundary_mask(px, py, g)
        strict = points_in_polygon(px, py, g, on_boundary=False)
        out[strict] = "I"
        out[on_b] = "B"
        return out
    if _collect(g, (LINESTRING,)):
        s = _segments(g)
        on = _points_on_segments(px[:, None], py[:, None],
                                 s[:, 0], s[:, 1], s[:, 2], s[:, 3])
        bp = _boundary_points(g)
        out[on] = "I"
        if len(bp):
            isb = (px[:, None] == bp[None, :, 0]) & (py[:, None] == bp[None, :, 1])
            out[isb.any(axis=1)] = "B"
        return out
    # puntal
    gp = _pts(g)
    eq = (px[:, None] == gp[None, :, 0]) & (py[:, None] == gp[None, :, 1])
    out[eq.any(axis=1)] = "I"
    return out


def _collinear_overlap(sa: np.ndarray, sb: np.ndarray) -> bool:
    """Any pair of collinear segments overlapping in >1 point?"""
    for i in range(len(sa)):
        a0 = sa[i, :2]
        a1 = sa[i, 2:]
        d = a1 - a0
        ln2 = d @ d
        if ln2 == 0:
            continue
        for j in range(len(sb)):
            b0 = sb[j, :2]
            b1 = sb[j, 2:]
            cr0 = (b0[0] - a0[0]) * d[1] - (b0[1] - a0[1]) * d[0]
            cr1 = (b1[0] - a0[0]) * d[1] - (b1[1] - a0[1]) * d[0]
            if abs(cr0) > 1e-12 * ln2 or abs(cr1) > 1e-12 * ln2:
                continue
            t0 = (b0 - a0) @ d / ln2
            t1 = (b1 - a0) @ d / ln2
            lo, hi = min(t0, t1), max(t0, t1)
            if min(hi, 1.0) - max(lo, 0.0) > 1e-12:
                return True
    return False


def _set(m, i, j, dim):
    order = {"F": 0, "0": 1, "1": 2, "2": 3}
    if order[str(dim)] > order[m[i * 3 + j]]:
        m[i * 3 + j] = str(dim)


def relate_matrix(a: Geometry, b: Geometry) -> str:
    m = ["F"] * 9
    da, db = _dim(a), _dim(b)
    # exterior/exterior always dim 2
    m[8] = "2"
    # exterior rows/cols: A's interior/boundary vs B's exterior and vice
    # versa — A's pieces not fully contained in B
    _fill_vs_exterior(m, a, b, transpose=False)
    _fill_vs_exterior(m, b, a, transpose=True)
    _fill_interactions(m, a, b, da, db)
    return "".join(m)


def _fill_vs_exterior(m, g, other, transpose):
    """entries (I_g ∩ E_other) and (B_g ∩ E_other)."""
    dg = _dim(g)
    # interior ∩ exterior
    ie = _piece_outside(g, other)
    if not ie and dg >= 1 and _dim(other) == 2:
        # sample-based check can miss thin slivers poking out; a proper
        # boundary crossing PROVES a piece of g lies in other's exterior
        sg = _segments(g)
        so = _segments(other)
        if len(sg) and len(so):
            scale = max(1.0, float(np.abs(sg).max()),
                        float(np.abs(so).max()))
            if _proper_cross(sg, so, eps=1e-12 * scale * scale).any():
                ie = True
    if ie:
        _set(m, 2 if transpose else 0, 0 if transpose else 2, str(dg))
    # boundary ∩ exterior
    if dg == 1:
        bp = _boundary_points(g)
        if len(bp):
            loc = _pt_location(bp[:, 0], bp[:, 1], other)
            if (loc == "E").any():
                _set(m, 2 if transpose else 1, 1 if transpose else 2, "0")
    elif dg == 2:
        # polygon boundary outside other?
        ring_pts = _ring_samples(g)
        loc = _pt_location(ring_pts[:, 0], ring_pts[:, 1], other)
        if (loc == "E").any() or (ie and _dim(other) == 2
                                  and _boundary_crosses(g, other)):
            _set(m, 2 if transpose else 1, 1 if transpose else 2, "1")


def _boundary_crosses(g, other) -> bool:
    sg = _segments(g)
    so = _segments(other)
    if not len(sg) or not len(so):
        return False
    scale = max(1.0, float(np.abs(sg).max()), float(np.abs(so).max()))
    return bool(_proper_cross(sg, so, eps=1e-12 * scale * scale).any())


def _ring_samples(g: Geometry) -> np.ndarray:
    pts = []
    for p in _collect(g, (POLYGON,)):
        for r in p.rings:
            c = r[:, :2]
            pts.append(c[:-1])
            pts.append(0.5 * (c[:-1] + c[1:]))
    return np.concatenate(pts, axis=0) if pts else np.empty((0, 2))


def _line_samples(g: Geometry) -> np.ndarray:
    s = _segments(g)
    if len(s) == 0:
        return np.empty((0, 2))
    mids = 0.5 * (s[:, :2] + s[:, 2:])
    return np.concatenate([_pts(g), mids], axis=0)


def _piece_outside(g: Geometry, other: Geometry) -> bool:
    """Does g's interior extend into other's exterior? (sample-based,
    augmented with proper-crossing checks)."""
    dg = _dim(g)
    if dg == 0:
        loc = _pt_location(_pts(g)[:, 0], _pts(g)[:, 1], other)
        return (loc == "E").any()
    if dg == 1:
        sp = _line_samples(g)
        loc = _pt_location(sp[:, 0], sp[:, 1], other)
        return bool((loc == "E").any())
    # areal: any ring sample of g outside other, or other smaller than g
    sp = _ring_samples(g)
    loc = _pt_location(sp[:, 0], sp[:, 1], other)
    if (loc == "E").any():
        return True
    # g could still strictly contain other (interior beyond other):
    if _dim(other) == 2:
        from .algorithms import area
        return area(g) > area(other) + 1e-15
    return True  # areal interior always exceeds a lower-dim other


def _fill_interactions(m, a, b, da, db):
    sa = _segments(a)
    sb = _segments(b)
    # --- puntal A ---
    if da == 0:
        pa_ = _pts(a)
        loc = _pt_location(pa_[:, 0], pa_[:, 1], b)
        for code, j in (("I", 0), ("B", 1)):
            if (loc == code).any():
                _set(m, 0, j, "0")
        if db == 0:
            return
    if db == 0 and da > 0:
        pb_ = _pts(b)
        loc = _pt_location(pb_[:, 0], pb_[:, 1], a)
        for code, i in (("I", 0), ("B", 1)):
            if (loc == code).any():
                _set(m, i, 0, "0")
        return
    if da == 0 or db == 0:
        return
    # --- lineal/lineal ---
    if da == 1 and db == 1:
        if _collinear_overlap(sa, sb):
            _set(m, 0, 0, "1")
        if _proper_cross(sa, sb).any():
            _set(m, 0, 0, "0")
        ba = _boundary_points(a)
        bb = _boundary_points(b)
        # endpoint interactions
        if len(ba):
            loc = _pt_location(ba[:, 0], ba[:, 1], b)
            for code, j in (("I", 0), ("B", 1)):
                if (loc == code).any():
                    _set(m, 1, j, "0")
        if len(bb):
            loc = _pt_location(bb[:, 0], bb[:, 1], a)
            for code, i in (("I", 0), ("B", 1)):
                if (loc == code).any():
                    _set(m, i, 1, "0")
        # interior touching at non-endpoint (T intersection, no cross):
        # an INTERIOR sample of one lying on the other's interior
        if m[0] == "F":
            for g1, g2 in ((a, b), (b, a)):
                sp = _line_samples(g1)
                bp1 = _boundary_points(g1)
                if len(bp1):
                    isb = ((sp[:, None, 0] == bp1[None, :, 0])
                           & (sp[:, None, 1] == bp1[None, :, 1])).any(axis=1)
                    sp = sp[~isb]
                if len(sp):
                    loc = _pt_location(sp[:, 0], sp[:, 1], g2)
                    if (loc == "I").any():
                        _set(m, 0, 0, "0")
                        break
        return
    # --- lineal/areal ---
    if {da, db} == {1, 2}:
        line, poly = (a, b) if da == 1 else (b, a)
        swap = da == 2  # if A is the polygon, transpose entries

        def put(i, j, d):
            _set(m, j if swap else i, i if swap else j, d)

        sp = _line_samples(line)
        loc = _pt_location(sp[:, 0], sp[:, 1], poly)
        if (loc == "I").any():
            put(0, 0, "1")
        if (loc == "B").any():
            put(0, 1, "0")
        # a transversal crossing puts line-interior points on the ring even
        # when no sampled vertex/midpoint lands there
        ring_segs0 = [np.concatenate([r[:-1, :2], r[1:, :2]], axis=1)
                      for p in _collect(poly, (POLYGON,)) for r in p.rings]
        if ring_segs0:
            rs0 = np.concatenate(ring_segs0, axis=0)
            if _proper_cross(_segments(line), rs0).any():
                put(0, 1, "0")
                put(0, 0, "1")
        # collinear run along the polygon boundary → dim 1 on I∩B
        ring_segs = []
        for p in _collect(poly, (POLYGON,)):
            for r in p.rings:
                ring_segs.append(np.concatenate([r[:-1, :2], r[1:, :2]], axis=1))
        rs = np.concatenate(ring_segs, axis=0) if ring_segs else np.empty((0, 4))
        sl = _segments(line)
        if _collinear_overlap(sl, rs):
            put(0, 1, "1")
        bp = _boundary_points(line)
        if len(bp):
            bloc = _pt_location(bp[:, 0], bp[:, 1], poly)
            for code, j in (("I", 0), ("B", 1)):
                if (bloc == code).any():
                    put(1, j, "0")
        # polygon boundary beyond the line: boundary is 1-dimensional and
        # the line can cover at most a 1-dim subset — assume remainder
        # exists unless the line covers the whole boundary (rare; sample)
        rsamp = _ring_samples(poly)
        lloc = _pt_location(rsamp[:, 0], rsamp[:, 1], line)
        if (lloc == "E").any():
            put(2, 1, "1")
        # a ring vertex/midpoint lying ON the line's interior is an
        # I(line)∩B(poly) touch no line sample, proper cross, or
        # collinear run detects (e.g. a line passing exactly through
        # a polygon vertex tangentially — found by overlay fuzz)
        if (lloc == "I").any():
            put(0, 1, "0")
        put(2, 0, "2")  # polygon interior always exceeds a line
        return
    # --- areal/areal ---
    if da == 2 and db == 2:
        from .algorithms import intersects, touches
        inter = intersects(a, b)
        if not inter:
            return
        if not touches(a, b):
            _set(m, 0, 0, "2")
        # boundary/boundary
        ra = _ring_samples(a)
        loc_ab = _pt_location(ra[:, 0], ra[:, 1], b)
        rb = _ring_samples(b)
        loc_ba = _pt_location(rb[:, 0], rb[:, 1], a)
        ring_a = np.concatenate([np.concatenate([r[:-1, :2], r[1:, :2]], axis=1)
                                 for p in _collect(a, (POLYGON,))
                                 for r in p.rings], axis=0)
        ring_b = np.concatenate([np.concatenate([r[:-1, :2], r[1:, :2]], axis=1)
                                 for p in _collect(b, (POLYGON,))
                                 for r in p.rings], axis=0)
        if _collinear_overlap(ring_a, ring_b):
            _set(m, 1, 1, "1")
        elif _proper_cross(ring_a, ring_b).any() or (loc_ab == "B").any():
            # generically overlapping polygons: ring segments properly
            # cross at points that are rarely ring vertices/midpoints, so
            # the sample test alone would miss the 0-dim B∩B intersection
            _set(m, 1, 1, "0")
        if (loc_ab == "I").any():
            _set(m, 1, 0, "1")
        if (loc_ba == "I").any():
            _set(m, 0, 1, "1")
        return


def relate_match(matrix: str, pattern: str) -> bool:
    """JTS IntersectionMatrix.matches / RelateMatch.java:6 semantics."""
    for mc, pc in zip(matrix, pattern):
        if pc == "*":
            continue
        if pc == "T":
            if mc == "F":
                return False
        elif pc == "F":
            if mc != "F":
                return False
        elif pc in "012":
            if mc != pc:
                return False
    return True
