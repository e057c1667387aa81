"""Bulk point-in-polygon refinement over candidate pairs — the inner
kernel of every spatial join path.

Instead of one numpy call per candidate polygon (per-call overhead
dominates when candidates are small), all polygons' ring segments are laid
out once in a CSR structure; a probe of N candidate (point, polygon) pairs
becomes ONE vectorized computation over the expanded (pair, segment) rows,
with `np.bincount` reducing crossing parity per pair.

Semantics: even-odd rule over all rings (exterior + holes + multi-parts
together — equivalent to the ring-by-ring test for valid geometries),
boundary points inside (covers semantics) when on_boundary=True.
"""

from __future__ import annotations

import numpy as np

from .types import POLYGON, Geometry


class SegmentCSR:
    """Concatenated ring segments of a polygon list, indexable by
    polygon id (build once per actor / per batch)."""

    __slots__ = ("x0", "y0", "x1", "y1", "start", "count")

    def __init__(self, geoms):
        xs0, ys0, xs1, ys1 = [], [], [], []
        counts = np.zeros(len(geoms), dtype=np.int64)
        for i, g in enumerate(geoms):
            n = 0
            if g is not None:
                for block in _rings(g):
                    if len(block) < 2:
                        continue
                    xs0.append(block[:-1, 0])
                    ys0.append(block[:-1, 1])
                    xs1.append(block[1:, 0])
                    ys1.append(block[1:, 1])
                    n += len(block) - 1
            counts[i] = n
        if xs0:
            self.x0 = np.concatenate(xs0)
            self.y0 = np.concatenate(ys0)
            self.x1 = np.concatenate(xs1)
            self.y1 = np.concatenate(ys1)
        else:
            self.x0 = self.y0 = self.x1 = self.y1 = np.empty(0)
        self.count = counts
        self.start = np.concatenate([[0], np.cumsum(counts)[:-1]])


def _rings(g: Geometry):
    if g.type == POLYGON:
        yield from (r[:, :2] for r in g.rings)
    elif g.parts is not None:
        for p in g.parts:
            yield from _rings(p)


def pip_pairs(px, py, pt_idx, poly_idx, csr: SegmentCSR,
              on_boundary=True, eps=1e-12) -> np.ndarray:
    """For candidate pairs (pt_idx[k], poly_idx[k]): is point inside
    polygon? Fully vectorized; work = Σ segments(poly_idx[k])."""
    npairs = len(pt_idx)
    if npairs == 0:
        return np.zeros(0, dtype=bool)
    cnt = csr.count[poly_idx]
    total = int(cnt.sum())
    if total == 0:
        return np.zeros(npairs, dtype=bool)
    pair_id = np.repeat(np.arange(npairs, dtype=np.int64), cnt)
    # segment index per expanded row
    row_start = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(row_start, cnt)
    seg = np.repeat(csr.start[poly_idx], cnt) + local
    x0 = csr.x0[seg]
    y0 = csr.y0[seg]
    x1 = csr.x1[seg]
    y1 = csr.y1[seg]
    PX = px[pt_idx][pair_id]
    PY = py[pt_idx][pair_id]
    straddle = (y0 <= PY) != (y1 <= PY)
    dy = y1 - y0
    dy_safe = np.where(dy == 0, np.inf, dy)
    xint = x0 + (PY - y0) * (x1 - x0) / dy_safe
    crossing = straddle & (PX < xint)
    crossings = np.bincount(pair_id, weights=crossing, minlength=npairs)
    inside = (crossings.astype(np.int64) % 2) == 1
    # boundary test (same expanded rows)
    dx = x1 - x0
    cross = (PX - x0) * dy - (PY - y0) * dx
    dot = (PX - x0) * dx + (PY - y0) * dy
    seglen2 = dx * dx + dy * dy
    scale = np.maximum(seglen2, eps)
    on = (np.abs(cross) <= eps * np.sqrt(scale) * np.maximum(
        1.0, np.maximum(np.abs(PX), np.abs(PY)))) \
        & (dot >= -eps) & (dot <= seglen2 + eps)
    on_pair = np.bincount(pair_id, weights=on, minlength=npairs) > 0
    if on_boundary:
        return inside | on_pair
    return inside & ~on_pair
