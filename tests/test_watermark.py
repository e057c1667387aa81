"""Watermark late-data windows (ops/watermark.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.ops.watermark import watermark_window_counts

H = 3_600_000_000


def _ds(rows):
    k, e, t = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(k, pa.string()),
        "event_id": pa.array(e, pa.int64()),
        "ts": pa.array(np.array(t, np.int64).astype("datetime64[us]"),
                       pa.timestamp("us"))}))


def test_late_classification(ray_session):
    # arrival: e1 t=100h, e2 t=10h (late: wm=100h-12h=88h > 10h),
    # e3 t=95h (not late), first event never late
    rows = [("a", 1, 100 * H), ("a", 2, 10 * H), ("a", 3, 95 * H)]
    out = watermark_window_counts(_ds(rows), window_us=6 * H,
                                  lateness_us=12 * H).to_pandas()
    got = {(r.event_type, r.win): (r.n_ok, r.n_late)
           for r in out.itertuples()}
    assert got == {("a", 100 // 6): (1, 0),
                   ("a", 10 // 6): (0, 1),
                   ("a", 95 // 6): (1, 0)}


def test_cross_bucket_carry(ray_session):
    # small bucket forces the carry-in path: the max lives in an
    # earlier bucket than the late event
    rows = [("a", 0, 200 * H)] + \
        [("a", i, (190 + i) * H) for i in range(1, 40)] + \
        [("a", 40, 100 * H)]   # wm >= 200h-12h = 188h > 100h -> late
    out = watermark_window_counts(_ds(rows), window_us=6 * H,
                                  lateness_us=12 * H,
                                  bucket=8).to_pandas()
    assert out.n_late.sum() == 1
    assert out[out.win == (100 // 6)].n_late.tolist() == [1]
