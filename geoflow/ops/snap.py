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


def network_positions(ds, segments, x_col: str = "x",
                      y_col: str = "y", id_col: str = "doc_id"):
    """(id, seg_idx, arc) — each point snapped to its nearest
    axis-aligned segment (snap_to_segments order) and linearized to
    the ALONG-NETWORK arc position: prefix length of earlier segments
    + offset from the segment's (min-x, min-y) start. Integer-exact;
    the linear-referencing primitive under network-distance
    analytics."""
    import ray

    seg = np.asarray(segments, dtype=np.int64)
    lox = np.minimum(seg[:, 0], seg[:, 2])
    hix = np.maximum(seg[:, 0], seg[:, 2])
    loy = np.minimum(seg[:, 1], seg[:, 3])
    hiy = np.maximum(seg[:, 1], seg[:, 3])
    if not ((lox == hix) | (loy == hiy)).all():
        raise ValueError("network_positions: oblique segment")
    lens = (hix - lox) + (hiy - loy)
    prefix = np.concatenate([[0], np.cumsum(lens)[:-1]])
    ref = ray.put((lox, hix, loy, hiy, prefix))

    def pos(b: pa.Table, _r=ref) -> pa.Table:
        lx, hx, ly, hy, pre = ray.get(_r)
        x = b.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nx = np.clip(x[:, None], lx[None, :], hx[None, :])
        ny = np.clip(y[:, None], ly[None, :], hy[None, :])
        d2 = (x[:, None] - nx) ** 2 + (y[:, None] - ny) ** 2
        best = d2.argmin(axis=1)
        r = np.arange(len(x))
        arc = pre[best] + (nx[r, best] - lx[best]) \
            + (ny[r, best] - ly[best])
        return pa.table({id_col: b.column(id_col),
                         "seg_idx": pa.array(best.astype(np.int64)),
                         "arc": pa.array(arc.astype(np.int64))})

    return ds.map_batches(pos, batch_format="pyarrow")


def network_travel_stats(ds, segments, key_col: str = "user_id",
                         ts_col: str = "ts", id_col: str = "event_id",
                         x_col: str = "px", y_col: str = "py"):
    """Per-key along-network travel over the event stream: snap every
    point to the axis-aligned network, linearize to arc positions,
    then in (ts, id) order report (n_events, total_network_dist,
    max_step) with dist = |Δarc| — the map-matched odometer. All
    int64. (Arc linearization is network_positions' formula inlined
    so key/ts ride the same pass — no join back.)"""
    import ray

    seg = np.asarray(segments, dtype=np.int64)
    lox = np.minimum(seg[:, 0], seg[:, 2])
    hix = np.maximum(seg[:, 0], seg[:, 2])
    loy = np.minimum(seg[:, 1], seg[:, 3])
    hiy = np.maximum(seg[:, 1], seg[:, 3])
    lens = (hix - lox) + (hiy - loy)
    prefix = np.concatenate([[0], np.cumsum(lens)[:-1]])
    ref = ray.put((lox, hix, loy, hiy, prefix))

    def annotate(b: pa.Table, _r=ref) -> pa.Table:
        lx, hx, ly, hy, pre = ray.get(_r)
        x = b.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nx = np.clip(x[:, None], lx[None, :], hx[None, :])
        ny = np.clip(y[:, None], ly[None, :], hy[None, :])
        d2 = (x[:, None] - nx) ** 2 + (y[:, None] - ny) ** 2
        best = d2.argmin(axis=1)
        r = np.arange(len(x))
        arc = pre[best] + (nx[r, best] - lx[best]) \
            + (ny[r, best] - ly[best])
        t = (b.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({key_col: b.column(key_col),
                         "eid": b.column(id_col),
                         "t": pa.array(t),
                         "arc": pa.array(arc.astype(np.int64))})

    def stats(group: pa.Table) -> pa.Table:
        t = group.column("t").to_numpy(zero_copy_only=False)
        e = group.column("eid").to_numpy(zero_copy_only=False)
        a = group.column("arc").to_numpy(zero_copy_only=False)
        o = np.lexsort((e, t))
        d = np.abs(np.diff(a[o]))
        return pa.table({
            key_col: group.column(key_col).slice(0, 1),
            "n_events": pa.array([len(a)], pa.int64()),
            "total_network_dist": pa.array([int(d.sum())], pa.int64()),
            "max_step": pa.array([int(d.max()) if len(d) else 0],
                                 pa.int64())})

    return ds.map_batches(annotate, batch_format="pyarrow") \
        .groupby(key_col).map_groups(stats, batch_format="pyarrow")
