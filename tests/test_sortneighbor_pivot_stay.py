"""Sorted-neighborhood blocking (join/sortneighbor.py), pivot counts
(ops/pivot.py), stay-point anchors (ops/staypoints.py). Driver gates:
`sorted_neighborhood`, `status_pivot`, `staypoints`; here: semantics
on hand-built rows including the chunk-boundary pair rule."""

import numpy as np
import pyarrow as pa
import ray.data


def test_global_ranks_across_buckets(ray_session):
    from geoflow.join.sortneighbor import global_ranks
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([30, 10, 10, 25, 7], pa.int64()),
        "id": pa.array([1, 9, 2, 3, 4], pa.int64())}))
    out = global_ranks(ds, "k", "id", bucket_width=10).to_pandas()
    got = dict(zip(out.id, out.rnk))
    # order: (7,4) (10,2) (10,9) (25,3) (30,1)
    assert got == {4: 0, 2: 1, 9: 2, 3: 3, 1: 4}


def test_sorted_neighborhood_pairs_window(ray_session):
    from geoflow.join.sortneighbor import sorted_neighborhood_pairs
    # ranks = ids 0..9 (k = id); window 3 -> pairs with gap 1,2
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(10), pa.int64()),
        "id": pa.array(np.arange(10), pa.int64())}))
    out = sorted_neighborhood_pairs(ds, "k", "id", window=3,
                                    bucket_width=4).to_pandas()
    pairs = set(zip(out.id_a, out.id_b))
    want = {(a, a + g) for a in range(10) for g in (1, 2)
            if a + g < 10}
    assert pairs == want
    assert len(out) == len(want)          # no duplicates at chunks


def test_pivot_counts(ray_session):
    from geoflow.ops.pivot import pivot_counts
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "s": pa.array(["P", "O", "X", "O", "O"])}))
    out = pivot_counts(ds, "k", "s", ["P", "O", "F"]).to_pandas() \
        .sort_values("k")
    assert out.n_P.tolist() == [1, 0]
    assert out.n_O.tolist() == [1, 2]
    assert out.n_F.tolist() == [0, 0]
    assert out.n_total.tolist() == [3, 2]   # 'X' counts in total only


def test_staypoint_anchor_runs(ray_session):
    from geoflow.ops.staypoints import staypoint_anchors
    # one user, points at (0,0),(1,0),(9,9),(0,1): anchor 0's run
    # ends at idx 2 (d2=162>100): n_pts=2, dur=t1-t0.
    ts = pa.array((np.array([0, 50, 100, 150], np.int64) * 10**6)
                  .astype("datetime64[us]"), pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_id": pa.array([0, 1, 2, 3], pa.int64()), "ts": ts,
        "px": pa.array([0, 1, 9, 0], pa.int64()),
        "py": pa.array([0, 0, 9, 1], pa.int64())}))
    out = staypoint_anchors(ds, r2=100, min_dur_us=40 * 10**6) \
        .to_pandas().sort_values("event_id")
    assert out.n_pts.tolist() == [2, 1, 1, 1]
    assert out.dur_us.tolist() == [50 * 10**6, 0, 0, 0]
    assert out.is_stay.tolist() == [1, 0, 0, 0]
