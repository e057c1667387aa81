"""Axis-aligned point snapping (ops/snap.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geoflow.ops.snap import snap_to_segments


def _pts(rows):
    i, x, y = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(i, pa.int64()),
        "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64())}))


def test_snap_basics(ray_session):
    segs = [(0, 0, 10, 0),     # seg 0: horizontal
            (10, 0, 10, 5)]    # seg 1: vertical
    out = snap_to_segments(
        _pts([(1, 5, 3),       # above seg0 interior: d2=9
              (2, 12, 2),      # right of seg1: d2=4
              (3, 10, 0),      # shared corner: tie -> seg 0
              (4, -2, -1)]),   # beyond left endpoint: d2=4+1
        segs).to_pandas().set_index("doc_id")
    assert out.loc[1].tolist() == [0, 9]
    assert out.loc[2].tolist() == [1, 4]
    assert out.loc[3].tolist() == [0, 0]
    assert out.loc[4].tolist() == [0, 5]


def test_oblique_rejected(ray_session):
    with pytest.raises(ValueError):
        snap_to_segments(_pts([(1, 0, 0)]), [(0, 0, 3, 4)])


def test_matches_bruteforce(ray_session):
    rng = np.random.default_rng(2)
    segs = [(int(a), int(b), int(a + (10 if h else 0)),
             int(b + (0 if h else 7)))
            for (a, b), h in zip(rng.integers(-20, 20, (12, 2)),
                                 rng.integers(0, 2, 12).astype(bool))]
    pts = [(i, int(x), int(y)) for i, (x, y)
           in enumerate(rng.integers(-30, 30, (50, 2)))]
    out = snap_to_segments(_pts(pts), segs).to_pandas() \
        .set_index("doc_id")
    for i, x, y in pts:
        best = None
        for j, (x0, y0, x1, y1) in enumerate(segs):
            nx = min(max(x, min(x0, x1)), max(x0, x1))
            ny = min(max(y, min(y0, y1)), max(y0, y1))
            d2 = (x - nx) ** 2 + (y - ny) ** 2
            if best is None or d2 < best[1]:
                best = (j, d2)
        assert out.loc[i].tolist() == list(best)


def test_segment_crossings_cases(ray_session):
    from geoflow.ops.spatialstats import segment_crossings
    # group 0: X-crossing pair + a touching pair (not proper) + a
    # parallel pair; group 1: single segment
    rows = [
        (0, 0, 0, 2, 2),    # a
        (0, 0, 2, 2, 0),    # b: crosses a at (1,1)
        (0, 0, 5, 9, 5),    # c: horizontal
        (0, 5, 5, 5, 9),    # d: touches c at (5,5) -> excluded
        (1, 0, 0, 3, 3),
    ]
    g, x1, y1, x2, y2 = zip(*rows)
    ds = ray.data.from_arrow(pa.table({
        "grp": pa.array(g, pa.int64()),
        "x1": pa.array(x1, pa.int64()), "y1": pa.array(y1, pa.int64()),
        "x2": pa.array(x2, pa.int64()), "y2": pa.array(y2, pa.int64())}))
    out = segment_crossings(ds).to_pandas().set_index("grp")
    assert out.loc[0].tolist() == [4, 1]
    assert out.loc[1].tolist() == [1, 0]


def test_network_positions_and_travel(ray_session):
    from geoflow.ops.snap import network_positions, network_travel_stats
    segs = [(0, 0, 10, 0), (10, 0, 10, 5)]  # L-shape, total 15
    pts = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "x": pa.array([3, 12, 10], pa.int64()),
        "y": pa.array([1, 4, 5], pa.int64())}))
    out = network_positions(pts, segs).to_pandas().set_index("doc_id")
    # p1 -> seg0 at x=3: arc 3; p2 -> seg1 at y=4: arc 10+4; p3 end
    assert out.loc[1].tolist() == [0, 3]
    assert out.loc[2].tolist() == [1, 14]
    assert out.loc[3].tolist() == [1, 15]
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(np.array([10, 20, 30], np.int64)
                       .astype("datetime64[us]"), pa.timestamp("us")),
        "px": pa.array([3, 10, 12], pa.int64()),
        "py": pa.array([1, 5, 4], pa.int64())}))
    st = network_travel_stats(ev, segs).to_pandas()
    # arcs 3 -> 15 -> 14: steps 12, 1
    assert st.n_events.tolist() == [3]
    assert st.total_network_dist.tolist() == [13]
    assert st.max_step.tolist() == [12]
