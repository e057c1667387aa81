"""Stay-point anchor detection over ordered point streams (Li et al.
2008's GPS stay-point primitive, in the per-anchor formulation): for
every point i of a key's (ts, id)-ordered stream, the forward run
ends at the FIRST later point farther than ``radius`` from p_i;
the anchor is a stay if the run's duration reaches ``min_dur_us``.
Per-anchor runs are independent (no sequential i=j jump), so the SQL
twin is a min-over-self-join — and the engine output hash-matches.

Exactness: integer coordinates, squared-distance compare (d² > r²),
int64 microsecond durations.

Shape: one groupby(key).map_groups; inside the group a full pairwise
d² matrix with first-violation-per-row argmax — vectorized O(n²) in
the group size (bounded by events-per-key; chunk the anchor rows if
a key's stream is huge)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def staypoint_anchors(ds, key_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      x_col: str = "px", y_col: str = "py",
                      r2: int = 1000, min_dur_us: int = 3_600_000_000):
    """(key, id, n_pts, dur_us, is_stay) per anchor point: n_pts =
    run length including the anchor, dur_us = t[last] - t[anchor]."""

    def anchors(group: pa.Table) -> pa.Table:
        t = (group.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        eid = group.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        x = group.column(x_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = group.column(y_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, t))
        t, eid, x, y = t[order], eid[order], x[order], y[order]
        n = len(t)
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        far = (dx * dx + dy * dy) > r2
        far &= np.triu(np.ones((n, n), bool), k=1)   # only k > i
        has = far.any(axis=1)
        stop = np.where(has, far.argmax(axis=1), n)
        npts = stop - np.arange(n)
        dur = t[stop - 1] - t
        return pa.table({
            key_col: group.column(key_col).take(
                pa.array(order, pa.int64())),
            id_col: pa.array(eid),
            "n_pts": pa.array(npts.astype(np.int64)),
            "dur_us": pa.array(dur),
            "is_stay": pa.array(
                (dur >= min_dur_us).astype(np.int64))})

    return ds.groupby(key_col).map_groups(anchors,
                                          batch_format="pyarrow")
