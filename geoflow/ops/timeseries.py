"""Calendar-window time-series aggregates over event streams.

``moving_counts``: per (series key, day) event counts plus the
trailing W-day windowed sum — the traffic-trend / anomaly-baseline
primitive. The window is over CALENDAR days (a RANGE frame), not over
present rows: gaps in the day sequence shrink the window sum exactly
like SQL ``RANGE BETWEEN W-1 PRECEDING AND CURRENT ROW``.

Exactness: day = epoch_us // 86_400e6 (int64), counts and windowed
sums are integers — hash-exact cross-engine.

Shape: ONE (key, day) groupby collapses the stream to at most
|keys|·|days| rows; the per-key window pass is a map_groups whose
group size is bounded by the day span (a prefix-sum + one
searchsorted, no quadratic window scan)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

US_PER_DAY = 86_400_000_000


def moving_counts(ds, key_col: str = "event_type",
                  ts_col: str = "ts", window_days: int = 7):
    """Dataset (key, day, n_events, n_window): daily counts and the
    trailing ``window_days`` calendar-day sum per key."""
    import pyarrow.compute as pc

    def to_day(batch: pa.Table) -> pa.Table:
        t = (batch.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({key_col: batch.column(key_col),
                         "day": pa.array(t // US_PER_DAY)})

    daily = (ds.map_batches(to_day, batch_format="pyarrow")
             .groupby([key_col, "day"]).count())

    def window(group: pa.Table) -> pa.Table:
        day = group.column("day").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnt = group.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(day)
        day, cnt = day[order], cnt[order]
        cs = np.concatenate([[0], np.cumsum(cnt)])
        lo = np.searchsorted(day, day - (window_days - 1), side="left")
        win = cs[np.arange(1, len(day) + 1)] - cs[lo]
        key = group.column(key_col)
        return pa.table({key_col: key.take(
                             pa.array(order, pa.int64())),
                         "day": pa.array(day),
                         "n_events": pa.array(cnt),
                         "n_window": pa.array(win)})

    return daily.groupby(key_col).map_groups(window,
                                             batch_format="pyarrow")


def count_anomalies(ds, key_col: str = "event_type",
                    ts_col: str = "ts", mad_mult: int = 3):
    """Robust anomaly flags over the daily count series: per key,
    median and MAD (median absolute deviation) of the daily counts —
    both DISCRETE order statistics at index floor((n-1)/2) of the
    sorted values, DuckDB quantile_disc's convention — and per day
    ``is_anomaly`` = |count - med| > mad_mult · MAD. Every quantity is
    int64 (the robust-z THRESHOLD comparison is an integer
    cross-multiply, never a float division) — hash-exact.

    Shape: the same (key, day) groupby as moving_counts, then one
    map_groups per key (group size = day span)."""

    def to_day(batch: pa.Table) -> pa.Table:
        t = (batch.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({key_col: batch.column(key_col),
                         "day": pa.array(t // US_PER_DAY)})

    daily = (ds.map_batches(to_day, batch_format="pyarrow")
             .groupby([key_col, "day"]).count())

    def flag(group: pa.Table) -> pa.Table:
        day = group.column("day").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnt = group.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(day)
        day, cnt = day[order], cnt[order]
        n = len(cnt)
        med = int(np.sort(cnt)[(n - 1) // 2])
        dev = np.abs(cnt - med)
        mad = int(np.sort(dev)[(n - 1) // 2])
        return pa.table({
            key_col: group.column(key_col).take(
                pa.array(order, pa.int64())),
            "day": pa.array(day),
            "n_events": pa.array(cnt),
            "med": pa.array(np.full(n, med, np.int64)),
            "mad": pa.array(np.full(n, mad, np.int64)),
            "is_anomaly": pa.array(
                (dev > mad_mult * mad).astype(np.int64))})

    return daily.groupby(key_col).map_groups(flag,
                                             batch_format="pyarrow")


def interarrival_gaps(ds, key_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id"):
    """Per-key inter-event gaps: each event annotated with
    ``gap_us`` = microseconds since the key's previous event in
    (ts, id) order (null for the key's first event) — the
    burst-detection / bot-signal primitive. Exactly SQL
    ``epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY key
    ORDER BY ts, id)``; the (ts, id) composite makes the order (and
    so the gaps) deterministic under same-timestamp events.

    Shape: one groupby(key).map_groups, group size = events per key;
    inside the group a lexsort + one vectorized diff."""

    def gaps(group: pa.Table) -> pa.Table:
        t = (group.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        i = group.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, t))
        t, i = t[order], i[order]
        gap = np.empty(len(t), np.int64)
        gap[1:] = t[1:] - t[:-1]
        arr = pa.array(gap, pa.int64(),
                       mask=np.r_[True, np.zeros(len(t) - 1, bool)])
        return pa.table({
            key_col: group.column(key_col).take(
                pa.array(order, pa.int64())),
            id_col: pa.array(i), "gap_us": arr})

    return ds.groupby(key_col).map_groups(gaps, batch_format="pyarrow")


def cusum_counts(ds, key_col: str = "event_type", ts_col: str = "ts"):
    """One-sided CUSUM drift statistic over the per-key daily count
    series (Page 1954): reference = the key's discrete median daily
    count (0-based sorted index (n-1)//2), d_t = count_t - med,
    s_t = max(0, s_{t-1} + d_t). Computed via the prefix-sum identity
    s_t = P_t - min(0, min_{j<=t} P_j) — which is how the SQL oracle
    expresses it with two window passes (no recursion). All int64,
    hash-exact.

    Shape: the (key, day) groupby then one map_groups per key
    (group size = day span); cumsum + minimum.accumulate inside."""

    def to_day(batch: pa.Table) -> pa.Table:
        t = (batch.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({key_col: batch.column(key_col),
                         "day": pa.array(t // US_PER_DAY)})

    daily = (ds.map_batches(to_day, batch_format="pyarrow")
             .groupby([key_col, "day"]).count())

    def cusum(group: pa.Table) -> pa.Table:
        day = group.column("day").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnt = group.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(day)
        day, cnt = day[order], cnt[order]
        n = len(cnt)
        med = int(np.sort(cnt)[(n - 1) // 2])
        pref = np.cumsum(cnt - med)
        floor = np.minimum(np.minimum.accumulate(pref), 0)
        return pa.table({
            key_col: group.column(key_col).take(
                pa.array(order, pa.int64())),
            "day": pa.array(day),
            "n_events": pa.array(cnt),
            "med": pa.array(np.full(n, med, np.int64)),
            "cusum": pa.array(pref - floor)})

    return daily.groupby(key_col).map_groups(cusum,
                                             batch_format="pyarrow")


def mann_kendall_counts(ds, key_col: str = "event_type",
                        ts_col: str = "ts"):
    """Mann-Kendall trend test ingredients over the per-key daily
    count series (Mann 1945 / Kendall 1975 — the temporal half of the
    'emerging hot spot' pattern; Getis-Ord Gi* in ops/spatialstats.py
    is the spatial half): per key,

      ``s_stat``  = Σ_{i<j} sign(c_j − c_i)   (days ascending)
      ``var18``   = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)   (= 18·Var(S),
                    tie-corrected — Kendall 1975 eq. 4.6)
      ``n_days``  = series length

    Everything is int64 (the z-score's sqrt/division is left to the
    client — floats never hash cross-engine), so the row set is
    hash-exact vs a pairwise self-join SQL oracle.

    Shape: the same (key, day) groupby as moving_counts collapses the
    stream to |keys|·|days| rows, then ONE map_groups per key. The
    sign sum is computed in column-chunked numpy broadcasts —
    O(n²) work but n is the day span (bounded, ~years), never the
    event count."""

    def to_day(batch: pa.Table) -> pa.Table:
        t = (batch.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({key_col: batch.column(key_col),
                         "day": pa.array(t // US_PER_DAY)})

    daily = (ds.map_batches(to_day, batch_format="pyarrow")
             .groupby([key_col, "day"]).count())

    def mk(group: pa.Table) -> pa.Table:
        day = group.column("day").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnt = group.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cnt = cnt[np.argsort(day)]
        n = len(cnt)
        s, var18 = mk_stats(cnt)
        return pa.table({
            key_col: group.column(key_col).slice(0, 1),
            "n_days": pa.array([n], pa.int64()),
            "s_stat": pa.array([s], pa.int64()),
            "var18": pa.array([var18], pa.int64())})

    return daily.groupby(key_col).map_groups(mk,
                                             batch_format="pyarrow")


def autocorr_counts(ds, key_col: str = "event_type",
                    ts_col: str = "ts", max_lag: int = 7):
    """Lagged-product ingredients of the daily-count autocorrelation
    per key: for each lag k in 1..max_lag, over the CALENDAR-aligned
    pairs (day, day+k) where both days exist,

      n_pairs, sum_x, sum_y, sum_xy, sum_x2, sum_y2   (x=count(day),
                                                       y=count(day+k))

    — every column int64 so rows hash-match a calendar self-join SQL
    oracle; Pearson r_k is one float division left to the client
    (floats never hash cross-engine). Shape: the (key, day) groupby
    then one map_groups per key; alignment is a searchsorted of
    day+k into the sorted day array — no quadratic scan."""

    def to_day(batch: pa.Table) -> pa.Table:
        t = (batch.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({key_col: batch.column(key_col),
                         "day": pa.array(t // US_PER_DAY)})

    daily = (ds.map_batches(to_day, batch_format="pyarrow")
             .groupby([key_col, "day"]).count())

    def ac(group: pa.Table) -> pa.Table:
        day = group.column("day").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnt = group.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(day)
        day, cnt = day[order], cnt[order]
        lags, rows = [], []
        for k in range(1, max_lag + 1):
            i = np.searchsorted(day, day + k)
            ok = (i < len(day))
            ok[ok] &= day[i[ok]] == day[ok] + k
            x, y = cnt[ok], cnt[i[ok]]
            lags.append(k)
            rows.append((len(x), int(x.sum()), int(y.sum()),
                         int((x * y).sum()), int((x * x).sum()),
                         int((y * y).sum())))
        n, sx, sy, sxy, sx2, sy2 = zip(*rows)
        kv = group.column(key_col)[0].as_py()
        return pa.table({
            key_col: pa.array([kv] * max_lag,
                              group.column(key_col).type),
            "lag": pa.array(lags, pa.int64()),
            "n_pairs": pa.array(n, pa.int64()),
            "sum_x": pa.array(sx, pa.int64()),
            "sum_y": pa.array(sy, pa.int64()),
            "sum_xy": pa.array(sxy, pa.int64()),
            "sum_x2": pa.array(sx2, pa.int64()),
            "sum_y2": pa.array(sy2, pa.int64())})

    return daily.groupby(key_col).map_groups(ac,
                                             batch_format="pyarrow")


def trimmed_count_stats(ds, key_col: str = "event_type",
                        ts_col: str = "ts", trim_pct10: int = 1):
    """Trimmed statistics of the per-key daily counts: drop the k
    lowest and k highest days with k = n·trim_pct10 // 10 (10%-steps)
    and report (n_days, n_kept, trimmed_sum, min_kept, max_kept) —
    the robust-mean ingredients, all int64 (the mean is one division
    left to the client). Multiset-determined, so ties need no order
    column; hash-exact vs a ROW_NUMBER-window SQL oracle."""

    def to_day(batch: pa.Table) -> pa.Table:
        t = (batch.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({key_col: batch.column(key_col),
                         "day": pa.array(t // US_PER_DAY)})

    daily = (ds.map_batches(to_day, batch_format="pyarrow")
             .groupby([key_col, "day"]).count())

    def trim(group: pa.Table) -> pa.Table:
        cnt = np.sort(group.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64))
        n = len(cnt)
        k = n * trim_pct10 // 10
        kept = cnt[k:n - k] if n - 2 * k > 0 else cnt[:0]
        kv = group.column(key_col)[0].as_py()
        return pa.table({
            key_col: pa.array([kv], group.column(key_col).type),
            "n_days": pa.array([n], pa.int64()),
            "n_kept": pa.array([len(kept)], pa.int64()),
            "trimmed_sum": pa.array([int(kept.sum())], pa.int64()),
            "min_kept": pa.array(
                [int(kept[0]) if len(kept) else 0], pa.int64()),
            "max_kept": pa.array(
                [int(kept[-1]) if len(kept) else 0], pa.int64())})

    return daily.groupby(key_col).map_groups(trim,
                                             batch_format="pyarrow")


def mk_stats(values_in_time_order: np.ndarray):
    """(s_stat, var18) of a time-ordered int series — the shared
    Mann-Kendall core (chunked broadcast sign sum + tie-corrected
    18·Var(S)); used by mann_kendall_counts, emerging_hotspots and
    the nation order-trend composite."""
    v = np.asarray(values_in_time_order, dtype=np.int64)
    n = len(v)
    s = 0
    idx = np.arange(n)
    for j0 in range(0, n, 2048):
        blk = v[j0:j0 + 2048]
        cmp = np.sign(blk[None, :] - v[:, None])
        before = idx[:, None] < (j0 + np.arange(len(blk)))[None, :]
        s += int((cmp * before).sum())
    _, t = np.unique(v, return_counts=True)
    t = t.astype(np.int64)
    var18 = n * (n - 1) * (2 * n + 5) \
        - int((t * (t - 1) * (2 * t + 5)).sum())
    return s, var18
