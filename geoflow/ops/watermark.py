"""Event-time windowing with watermark late-data accounting — the
streaming-engine semantic (Dataflow/Beam's watermark + allowed
lateness) evaluated deterministically over a replayable log:

  * arrival order  = event_id (the log sequence number);
  * watermark at an event = max event-time of STRICTLY EARLIER
    arrivals − allowed_lateness;
  * an event is LATE iff its event-time < its watermark;
  * output: per (key, tumbling window) accepted and late counts.

Exactness: the watermark is an integer prefix-max in arrival order —
SQL expresses it as MAX() OVER (ORDER BY event_id ROWS UNBOUNDED
PRECEDING AND 1 PRECEDING); counts are int64 → hash-exact.

Shape (the distributed prefix-scan pattern): arrival buckets
``event_id // bucket`` are the parallel unit. Pass 1 is a shuffle-
free map emitting per-batch (bucket, max_ts) partials combined on
the driver into carry-in prefix maxima (bucket-count rows). Pass 2
is ONE groupby(bucket).map_groups that computes the strict in-bucket
prefix max + carry-in and emits pre-combined (key, window, ok, late)
partials; a final small groupby-sum finishes. Nothing sequential
ever leaves a bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["watermark_window_counts"]


def watermark_window_counts(ds, key_col: str = "event_type",
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            window_us: int = 6 * 3_600_000_000,
                            lateness_us: int = 12 * 3_600_000_000,
                            bucket: int = 4096):
    """(key, win, n_ok, n_late) — tumbling ``window_us`` windows of
    event time with watermark-based late classification."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def prep(b: pa.Table) -> pa.Table:
        t = (b.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        e = b.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({key_col: b.column(key_col),
                         "eid": pa.array(e), "t": pa.array(t),
                         "bkt": pa.array(e // bucket)})

    evs = ds.map_batches(prep, batch_format="pyarrow").materialize()

    # ---- pass 1: per-bucket max event-time (shuffle-free partials)
    def bmax(b: pa.Table) -> pa.Table:
        bk = b.column("bkt").to_numpy(zero_copy_only=False)
        t = b.column("t").to_numpy(zero_copy_only=False)
        ub, inv = np.unique(bk, return_inverse=True)
        mx = np.full(len(ub), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, t)
        return pa.table({"bkt": pa.array(ub), "mx": pa.array(mx)})

    agg: dict[int, int] = {}
    for b in evs.map_batches(bmax, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0 or "bkt" not in b.schema.names:
            continue
        for k, v in zip(b.column("bkt").to_pylist(),
                        b.column("mx").to_pylist()):
            agg[k] = max(agg.get(k, np.iinfo(np.int64).min), v)
    bks = np.array(sorted(agg), np.int64)
    mxs = np.array([agg[k] for k in bks], np.int64)
    # carry-in for bucket i = max over all earlier buckets
    carry = np.full(len(bks), np.iinfo(np.int64).min, np.int64)
    if len(bks) > 1:
        carry[1:] = np.maximum.accumulate(mxs)[:-1]
    ref = ray.put((bks, carry))

    # ---- pass 2: strict prefix max within bucket + carry-in
    def classify(group: pa.Table, _r=ref) -> pa.Table:
        bks_, carry_ = ray.get(_r)
        e = group.column("eid").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        keys = group.column(key_col)
        o = np.argsort(e)
        t_o = t[o]
        prior = np.empty(len(t_o), np.int64)
        ci = carry_[np.searchsorted(bks_, int(e[o[0]]) // bucket)]
        prior[0] = ci
        if len(t_o) > 1:
            prior[1:] = np.maximum(
                np.maximum.accumulate(t_o)[:-1], ci)
        # events with no earlier arrival have no watermark (prior =
        # int64-min sentinel); guard the subtraction against wrap
        has_wm = prior > np.iinfo(np.int64).min // 2
        late = has_wm & (t_o < prior - lateness_us)
        win = t_o // window_us
        kv = keys.take(pa.array(o, pa.int64()))
        # pre-combine inside the bucket
        tbl = pa.table({key_col: kv, "win": pa.array(win),
                        "ok": pa.array((~late).astype(np.int64)),
                        "late": pa.array(late.astype(np.int64))})
        return tbl

    parts = evs.groupby("bkt").map_groups(classify,
                                          batch_format="pyarrow")
    agg2 = parts.groupby([key_col, "win"]).aggregate(Sum("ok"),
                                                     Sum("late"))

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "win" not in b.schema.names:
            return pa.table({key_col: pa.array([], pa.string()),
                             "win": pa.array([], pa.int64()),
                             "n_ok": pa.array([], pa.int64()),
                             "n_late": pa.array([], pa.int64())})
        return pa.table({key_col: b.column(key_col),
                         "win": b.column("win"),
                         "n_ok": b.column("sum(ok)"),
                         "n_late": b.column("sum(late)")})

    return agg2.map_batches(fin, batch_format="pyarrow")
