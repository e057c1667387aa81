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


def stay_od_flows(ds, key_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", x_col: str = "px",
                  y_col: str = "py", r2: int = 1000,
                  min_dur_us: int = 3_600_000_000, cell_div: int = 20):
    """Origin-destination flows between consecutive STAY anchors of
    each key (the od-matrix composite of trajectory mining): anchors
    come from the same per-anchor stay rule as ``staypoint_anchors``;
    each stay is assigned the grid cell (x // cell_div, y //
    cell_div); consecutive stays in (ts, id) order yield one trip.
    Output (from_cx, from_cy, to_cx, to_cy, n_trips) — all int64,
    hash-exact vs the staypoint-oracle + LEAD window SQL.

    Shape: ONE map_groups pass computes anchors AND the per-key trip
    partials (no join back to positions), then one small groupby-sum
    over cell-pair cardinality rows."""
    from ray.data.aggregate import Sum

    def trips(group: pa.Table) -> pa.Table:
        t = (group.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        eid = group.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        x = group.column(x_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = group.column(y_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, t))
        t, x, y = t[order], x[order], y[order]
        n = len(t)
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        far = (dx * dx + dy * dy) > r2
        far &= np.triu(np.ones((n, n), bool), k=1)
        has = far.any(axis=1)
        stop = np.where(has, far.argmax(axis=1), n)
        dur = t[stop - 1] - t
        stay = dur >= min_dur_us
        cx, cy = x[stay] // cell_div, y[stay] // cell_div
        if len(cx) < 2:
            return pa.table({"from_cx": pa.array([], pa.int64()),
                             "from_cy": pa.array([], pa.int64()),
                             "to_cx": pa.array([], pa.int64()),
                             "to_cy": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"from_cx": pa.array(cx[:-1]),
                         "from_cy": pa.array(cy[:-1]),
                         "to_cx": pa.array(cx[1:]),
                         "to_cy": pa.array(cy[1:]),
                         "n": pa.array(np.ones(len(cx) - 1,
                                               np.int64))})

    agg = ds.groupby(key_col).map_groups(trips,
                                         batch_format="pyarrow") \
        .groupby(["from_cx", "from_cy", "to_cx", "to_cy"]) \
        .aggregate(Sum("n"))

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "from_cx" not in b.schema.names:
            return pa.table({"from_cx": pa.array([], pa.int64()),
                             "from_cy": pa.array([], pa.int64()),
                             "to_cx": pa.array([], pa.int64()),
                             "to_cy": pa.array([], pa.int64()),
                             "n_trips": pa.array([], pa.int64())})
        return pa.table({"from_cx": b.column("from_cx"),
                         "from_cy": b.column("from_cy"),
                         "to_cx": b.column("to_cx"),
                         "to_cy": b.column("to_cy"),
                         "n_trips": b.column("sum(n)")})

    return agg.map_batches(fin, batch_format="pyarrow")
