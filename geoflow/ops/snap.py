"""Point→polyline snapping (the map-matching primitive: assign each
point to its nearest road segment). This operator handles the
AXIS-ALIGNED segment case in exact integers: the nearest point of a
horizontal/vertical segment is a per-axis clamp, so d² is a pure
int64 and the argmin is an integer compare — no float geometry in the
hash path (general obliques go through geom/algorithms point-segment
kernels, float domain).

Shape: segments are broadcast once via ray.put as four int arrays
(x0, y0, x1, y1, axis-aligned, in index order); one stateless
map_batches computes the (n_points × n_segments) clamped d² matrix
and takes the per-row argmin (ties → lowest segment index, matching
the SQL (d2, seg) ROW_NUMBER order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["snap_to_segments"]


def snap_to_segments(ds, segments, x_col: str = "x",
                     y_col: str = "y", id_col: str = "doc_id"):
    """(id, seg_idx, d2) nearest axis-aligned segment per point.
    ``segments`` is an (n, 4) int array-like of (x0, y0, x1, y1)
    rows; each must be horizontal or vertical."""
    import ray

    seg = np.asarray(segments, dtype=np.int64)
    if seg.ndim != 2 or seg.shape[1] != 4:
        raise ValueError("segments must be (n, 4) of x0,y0,x1,y1")
    if not ((seg[:, 0] == seg[:, 2]) | (seg[:, 1] == seg[:, 3])).all():
        raise ValueError("snap_to_segments: oblique segment — this "
                         "operator is the axis-aligned exact-integer "
                         "path")
    lox = np.minimum(seg[:, 0], seg[:, 2])
    hix = np.maximum(seg[:, 0], seg[:, 2])
    loy = np.minimum(seg[:, 1], seg[:, 3])
    hiy = np.maximum(seg[:, 1], seg[:, 3])
    ref = ray.put((lox, hix, loy, hiy))

    def snap(b: pa.Table, _r=ref) -> pa.Table:
        lx, hx, ly, hy = ray.get(_r)
        x = b.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nx = np.clip(x[:, None], lx[None, :], hx[None, :])
        ny = np.clip(y[:, None], ly[None, :], hy[None, :])
        d2 = (x[:, None] - nx) ** 2 + (y[:, None] - ny) ** 2
        best = d2.argmin(axis=1)          # first (lowest index) min
        return pa.table({
            id_col: b.column(id_col),
            "seg_idx": pa.array(best.astype(np.int64)),
            "d2": pa.array(d2[np.arange(len(x)), best])})

    return ds.map_batches(snap, batch_format="pyarrow")
