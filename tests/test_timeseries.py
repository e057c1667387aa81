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


def test_count_anomalies_median_mad():
    from geoflow.ops.timeseries import count_anomalies
    # type 'a' daily counts: day0=1, day1=1, day2=1, day3=1, day4=9.
    # sorted counts [1,1,1,1,9]: med=1 (idx 2), devs [0,0,0,0,8],
    # MAD=0 -> day4 dev 8 > 3*0 -> anomaly; flat days dev 0 -> not.
    days = [0, 1, 2, 3] + [4] * 9
    ts = pa.array((np.array(days, np.int64) * US_PER_DAY
                   + 7).astype("datetime64[us]"), pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * len(days)), "ts": ts}))
    out = count_anomalies(ds).to_pandas().sort_values("day")
    assert out.med.tolist() == [1] * 5
    assert out.mad.tolist() == [0] * 5
    assert out.is_anomaly.tolist() == [0, 0, 0, 0, 1]
    assert out.n_events.tolist() == [1, 1, 1, 1, 9]


def test_count_anomalies_even_n_lower_median():
    from geoflow.ops.timeseries import count_anomalies
    # counts [1, 3] -> discrete median at 0-based idx (2-1)//2 = 0
    # -> med=1 (the LOWER element, quantile_disc convention).
    days = [0, 1, 1, 1]
    ts = pa.array((np.array(days, np.int64) * US_PER_DAY)
                  .astype("datetime64[us]"), pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 4), "ts": ts}))
    out = count_anomalies(ds).to_pandas().sort_values("day")
    assert out.med.tolist() == [1, 1]
    # devs [0, 2] -> MAD at idx 0 = 0; day1 dev 2 > 0 -> anomaly
    assert out.mad.tolist() == [0, 0]
    assert out.is_anomaly.tolist() == [0, 1]


def test_interarrival_gaps_order_and_nulls():
    from geoflow.ops.timeseries import interarrival_gaps
    # user 1: events at t=10,10,40 (same-ts pair ordered by event_id);
    # user 2: single event -> null gap only.
    ts = pa.array(np.array([10, 40, 10, 7], np.int64)
                  .astype("datetime64[us]"), pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_id": pa.array([5, 9, 2, 3], pa.int64()), "ts": ts}))
    out = interarrival_gaps(ds).to_pandas().sort_values(
        ["user_id", "event_id"]).reset_index(drop=True)
    assert out.event_id.tolist() == [2, 5, 9, 3]
    g = out.gap_us.tolist()
    assert np.isnan(g[0]) and g[1] == 0 and g[2] == 30
    assert np.isnan(g[3])


def test_cusum_clamp_identity():
    from geoflow.ops.timeseries import cusum_counts
    # daily counts: d0..d6 = 2,2,2,1,1,5,2 -> med=2,
    # d = 0,0,0,-1,-1,3,0; clamped CUSUM = 0,0,0,0,0,3,3
    counts = [2, 2, 2, 1, 1, 5, 2]
    days = np.repeat(np.arange(7, dtype=np.int64), counts)
    ts = pa.array((days * US_PER_DAY + 3).astype("datetime64[us]"),
                  pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * len(days)), "ts": ts}))
    out = cusum_counts(ds).to_pandas().sort_values("day")
    assert out.med.tolist() == [2] * 7
    assert out.cusum.tolist() == [0, 0, 0, 0, 0, 3, 3]


def test_mann_kendall_known_series():
    from geoflow.ops.timeseries import mann_kendall_counts
    # daily counts 1,2,2,3 -> pairs: (1,2)+ (1,2)+ (1,3)+ (2,2)0
    # (2,3)+ (2,3)+  => S = 5; ties: one group of 2 (value 2):
    # tie18 = 2*1*9 = 18; var18 = 4*3*13 - 18 = 138
    counts = [1, 2, 2, 3]
    days = np.repeat(np.arange(4, dtype=np.int64), counts)
    ts = pa.array((days * US_PER_DAY + 3).astype("datetime64[us]"),
                  pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * len(days)), "ts": ts}))
    out = mann_kendall_counts(ds).to_pandas()
    assert out.n_days.tolist() == [4]
    assert out.s_stat.tolist() == [5]
    assert out.var18.tolist() == [138]


def test_mann_kendall_matches_bruteforce_chunking():
    from geoflow.ops.timeseries import mann_kendall_counts
    # > 2048 days exercises the chunked broadcast path
    rng = np.random.default_rng(7)
    n = 3000
    cnt = rng.integers(1, 4, n)
    days = np.repeat(np.arange(n, dtype=np.int64), cnt)
    ts = pa.array((days * US_PER_DAY).astype("datetime64[us]"),
                  pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * len(days)), "ts": ts}))
    out = mann_kendall_counts(ds).to_pandas()
    c = cnt.astype(np.int64)
    s = int(np.sign(c[None, :] - c[:, None])[
        np.triu_indices(n, 1)].sum())
    _, t = np.unique(c, return_counts=True)
    t = t.astype(np.int64)
    var18 = n * (n - 1) * (2 * n + 5) - int(
        (t * (t - 1) * (2 * t + 5)).sum())
    assert out.s_stat.tolist() == [s]
    assert out.var18.tolist() == [var18]
    assert out.n_days.tolist() == [n]


def test_autocorr_known_series():
    from geoflow.ops.timeseries import autocorr_counts
    # days 0..4 with counts 1,2,3,1,2 and a GAP at day 5, day 6=4
    counts = {0: 1, 1: 2, 2: 3, 3: 1, 4: 2, 6: 4}
    days = np.concatenate([np.full(c, d) for d, c in counts.items()]) \
        .astype(np.int64)
    ts = pa.array((days * US_PER_DAY + 9).astype("datetime64[us]"),
                  pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * len(days)), "ts": ts}))
    out = autocorr_counts(ds, max_lag=2).to_pandas() \
        .sort_values("lag").reset_index(drop=True)
    # lag 1 pairs: (0,1)(1,2)(2,3)(3,4) -> x=1,2,3,1 y=2,3,1,2
    assert out.loc[0, ["n_pairs", "sum_x", "sum_y", "sum_xy",
                       "sum_x2", "sum_y2"]].tolist() == \
        [4, 7, 8, 13, 15, 18]
    # lag 2 pairs: (0,2)(1,3)(2,4)(4,6) -> x=1,2,3,2 y=3,1,2,4
    assert out.loc[1, ["n_pairs", "sum_x", "sum_y", "sum_xy",
                       "sum_x2", "sum_y2"]].tolist() == \
        [4, 8, 10, 19, 18, 30]
