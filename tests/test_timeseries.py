"""Calendar-window moving counts (ops/timeseries.py). Driver gate:
the `moving_counts` RANGE-frame oracle; here: gap semantics on a
hand-built stream."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.ops.timeseries import US_PER_DAY, moving_counts


def test_moving_counts_gaps_shrink_window():
    # type 'a': days 0 (x2), 1, 3, 20 — the day-3 window (>= day -3)
    # spans days 0..3; day 20 stands alone. type 'b': day 2.
    days = [0, 0, 1, 3, 20, 2]
    types = ["a", "a", "a", "a", "a", "b"]
    t0 = np.int64(0)
    ts = pa.array((t0 + np.array(days, np.int64) * US_PER_DAY
                   + 5).astype("datetime64[us]"),
                  pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(types), "ts": ts}))
    out = moving_counts(ds, window_days=4).to_pandas()
    got = {(r.event_type, r.day): (r.n_events, r.n_window)
           for r in out.itertuples()}
    assert got == {
        ("a", 0): (2, 2),
        ("a", 1): (1, 3),
        ("a", 3): (1, 4),     # days 0..3 all inside the 4-day range
        ("a", 20): (1, 1),    # gap: window empty except itself
        ("b", 2): (1, 1),
    }
