"""Temporal stream joins Ray Data lacks natively: as-of join and
interval (range) join.

Neither exists in the reference (its temporal surface is the Allen
predicate family, temporal/*.java) nor in Ray Data 2.49; both are core
to event-log processing at corpus scale, so they are implemented here
as first-class operators using the same salt-bucket shape as
``sessionize`` (ops/temporal.py): hash-partition on the equi-key (or
time-bucket), then ONE vectorized numpy pass per group — group count is
proportional to cluster size, never to key cardinality.

Partitioning assumptions (documented per the custom-operator contract):

* ``asof_join``: all rows of one key (both sides) land in one salt
  bucket — guaranteed by hashing the key. Bucket skew is bounded by key
  skew / num_buckets; a pathological single hot key degrades to one
  sorted merge over that key's rows (still O(n log n) vectorized).
* ``interval_join``: a point lives in exactly ONE time bucket; an
  interval is replicated to every bucket it overlaps, so each matching
  pair is emitted exactly once (in the point's bucket) and no dedup
  pass is needed. ``bucket_us`` should be >= the typical interval
  length so replication stays O(1) per interval; a single interval
  spanning the whole corpus would replicate to every bucket (cap via
  ``max_buckets_per_interval``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..text.hashing import mix64

_TS_US = pa.timestamp("us")


def _ts_i64(col) -> np.ndarray:
    """int64 microseconds view of a timestamp/int column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        return col.cast(_TS_US).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _null_col(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, type=typ)


def _schema_types(ds) -> dict[str, pa.DataType]:
    s = ds.schema()
    return dict(zip(s.names, s.types))


def asof_join(left_ds, right_ds, *, left_key: str, right_key: str,
              left_ts: str, right_ts: str,
              right_cols: list[str], direction: str = "backward",
              tolerance_us: int | None = None, right_tiebreak: str | None = None,
              num_buckets: int = 64, suffix: str = ""):
    """For each left row, attach the right row of the same ``key`` with
    the greatest ``right_ts`` <= ``left_ts`` (backward, inclusive) or the
    least ``right_ts`` >= ``left_ts`` (forward). Unmatched left rows keep
    nulls (left-outer semantics, matching SQL ``ASOF LEFT JOIN``).

    ``right_tiebreak`` names an orderable right column used to break
    exact-``right_ts`` ties deterministically (the max wins); without it
    tied right rows resolve in block order, which is not stable across
    retries — pass one whenever ties are possible.

    Shape: both sides are hashed on ``key`` into ``num_buckets`` salt
    groups and unioned under one null-padded schema; each group is
    lexsorted once ((key, ts, side, tiebreak)) and matched in a single
    vectorized pass (running maximum.accumulate of last-seen right row
    index). No per-key Python calls.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    sgn = 1 if direction == "backward" else -1

    l_types = _schema_types(left_ds)
    r_all = _schema_types(right_ds)
    left_cols = list(l_types)
    r_types = {c: r_all[c] for c in right_cols}
    out_right = {c: c + suffix for c in right_cols}
    tb_type = (r_all[right_tiebreak]
               if right_tiebreak is not None else pa.int64())

    def union_schema_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = batch.column(left_key).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = mix64(k.view(np.uint64)) % np.uint64(num_buckets)
        ts = _ts_i64(batch.column(left_ts)) * sgn
        cols = {"_aj_bucket": pa.array(b.view(np.int64)),
                "_aj_side": pa.array(np.ones(n, dtype=np.int8)),
                "_aj_key": pa.array(k),
                "_aj_ts": pa.array(ts),
                "_aj_tb": _null_col(n, tb_type)}
        for c in left_cols:
            cols[c] = batch.column(c)
        for c in right_cols:
            cols[out_right[c]] = _null_col(n, r_types[c])
        return pa.table(cols)

    def union_schema_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = batch.column(right_key).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = mix64(k.view(np.uint64)) % np.uint64(num_buckets)
        ts = _ts_i64(batch.column(right_ts)) * sgn
        tb = (batch.column(right_tiebreak) if right_tiebreak is not None
              else _null_col(n, tb_type))
        cols = {"_aj_bucket": pa.array(b.view(np.int64)),
                "_aj_side": pa.array(np.zeros(n, dtype=np.int8)),
                "_aj_key": pa.array(k),
                "_aj_ts": pa.array(ts),
                "_aj_tb": tb}
        for c in left_cols:
            cols[c] = _null_col(n, l_types[c])
        for c in right_cols:
            cols[out_right[c]] = batch.column(c)
        return pa.table(cols)

    def match(group: pa.Table) -> pa.Table:
        n = group.num_rows
        k = group.column("_aj_key").to_numpy(zero_copy_only=False)
        ts = group.column("_aj_ts").to_numpy(zero_copy_only=False)
        side = group.column("_aj_side").to_numpy(zero_copy_only=False)
        keys = [side, ts, k]   # primary: key, then ts, right(0) before left
        if right_tiebreak is not None:
            # tiebreak below side in significance: it only orders rows tied
            # on (key, ts, side), i.e. tied RIGHT rows — the max sorts last
            # and wins maximum.accumulate. Left rows' fill value is inert.
            fill = "" if (pa.types.is_string(tb_type)
                          or pa.types.is_large_string(tb_type)) else 0
            tb = pc.fill_null(group.column("_aj_tb"), fill) \
                .to_numpy(zero_copy_only=False)
            keys.insert(0, tb)
        order = np.lexsort(keys)
        k_s, ts_s, side_s = k[order], ts[order], side[order]
        # running index of the most recent right row at or before position
        own = np.where(side_s == 0, np.arange(n), -1)
        last_r = np.maximum.accumulate(own)
        # first position of each key run — a match is valid only if the
        # right row it points at belongs to the same key run
        new_key = np.empty(n, dtype=bool)
        if n:
            new_key[0] = True
            new_key[1:] = k_s[1:] != k_s[:-1]
        run_id = np.cumsum(new_key) - 1
        run_start = np.nonzero(new_key)[0]
        left_pos = np.nonzero(side_s == 1)[0]
        idx = last_r[left_pos]
        valid = idx >= run_start[run_id[left_pos]]
        if tolerance_us is not None:
            gap = ts_s[left_pos] - ts_s[np.clip(idx, 0, None)]
            valid &= gap <= tolerance_us
        take_left = pa.array(order[left_pos], type=pa.int64())
        safe = np.where(valid, idx, 0)
        take_right = pa.array(order[safe], type=pa.int64())
        vmask = pa.array(valid)
        cols = {}
        for c in left_cols:
            cols[c] = group.column(c).take(take_left)
        for c in right_cols:
            oc = out_right[c]
            taken = group.column(oc).take(take_right)
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            cols[oc] = pc.if_else(vmask, taken, pa.scalar(None, r_types[c]))
        return pa.table(cols)

    lu = left_ds.map_batches(union_schema_left, batch_format="pyarrow")
    ru = right_ds.map_batches(union_schema_right, batch_format="pyarrow")
    return lu.union(ru).groupby("_aj_bucket") \
        .map_groups(match, batch_format="pyarrow")


def interval_join(point_ds, interval_ds, *, point_ts: str,
                  interval_start: str, interval_end: str,
                  point_cols: list[str], interval_cols: list[str],
                  bucket_us: int = 3_600_000_000,
                  max_buckets_per_interval: int = 1024,
                  closed: str = "both"):
    """Emit one row per (interval, point) pair whose ``point_ts`` falls
    inside [interval_start, interval_end] (closed both ends by default;
    ``closed`` in {'both','left','right','neither'}).

    Shape: points are keyed by their single time bucket
    (``ts // bucket_us``); intervals are replicated (vectorized
    np.repeat expansion, no Python loop) to every bucket they overlap.
    Within a bucket, points are sorted by ts once and each interval
    resolves to a contiguous [lo, hi) point range via two
    ``searchsorted`` calls; pairs are materialized with the standard
    cumsum/repeat range-expansion trick. Each pair appears in exactly
    one bucket (the point's), so there is no dedup pass.
    """
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError("closed must be both|left|right|neither")
    lo_side = "left" if closed in ("both", "left") else "right"
    hi_side = "right" if closed in ("both", "right") else "left"

    p_all = _schema_types(point_ds)
    i_all = _schema_types(interval_ds)
    p_types = {c: p_all[c] for c in point_cols}
    i_types = {c: i_all[c] for c in interval_cols}
    if set(point_cols) & set(interval_cols):
        raise ValueError("point_cols and interval_cols must be disjoint")

    def points(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = _ts_i64(batch.column(point_ts))
        cols = {"_ij_bucket": pa.array(ts // bucket_us),
                "_ij_side": pa.array(np.ones(n, dtype=np.int8)),
                "_ij_ts": pa.array(ts),
                "_ij_start": pa.array(np.zeros(n, dtype=np.int64)),
                "_ij_end": pa.array(np.zeros(n, dtype=np.int64))}
        for c in point_cols:
            cols[c] = batch.column(c)
        for c in interval_cols:
            cols[c] = _null_col(n, i_types[c])
        return pa.table(cols)

    def intervals(batch: pa.Table) -> pa.Table:
        s = _ts_i64(batch.column(interval_start))
        e = _ts_i64(batch.column(interval_end))
        b0 = s // bucket_us
        b1 = np.maximum(e // bucket_us, b0)
        counts = np.minimum(b1 - b0 + 1, max_buckets_per_interval)
        total = int(counts.sum())
        rep = np.repeat(np.arange(len(s)), counts)
        run_starts = np.cumsum(counts) - counts
        within = np.arange(total) - np.repeat(run_starts, counts)
        bucket = b0[rep] + within
        n = total
        cols = {"_ij_bucket": pa.array(bucket),
                "_ij_side": pa.array(np.zeros(n, dtype=np.int8)),
                "_ij_ts": pa.array(np.zeros(n, dtype=np.int64)),
                "_ij_start": pa.array(s[rep]),
                "_ij_end": pa.array(e[rep])}
        take = pa.array(rep, type=pa.int64())
        for c in point_cols:
            cols[c] = _null_col(n, p_types[c])
        for c in interval_cols:
            cols[c] = batch.column(c).take(take)
        return pa.table(cols)

    def match(group: pa.Table) -> pa.Table:
        side = group.column("_ij_side").to_numpy(zero_copy_only=False)
        ppos = np.nonzero(side == 1)[0]
        ipos = np.nonzero(side == 0)[0]
        out_cols = interval_cols + point_cols
        if len(ppos) == 0 or len(ipos) == 0:
            return pa.table({c: _null_col(0, (i_types | p_types)[c])
                             for c in out_cols})
        ts = group.column("_ij_ts").to_numpy(zero_copy_only=False)[ppos]
        order = np.argsort(ts, kind="stable")
        ts_s = ts[order]
        s = group.column("_ij_start").to_numpy(zero_copy_only=False)[ipos]
        e = group.column("_ij_end").to_numpy(zero_copy_only=False)[ipos]
        lo = np.searchsorted(ts_s, s, side=lo_side)
        hi = np.searchsorted(ts_s, e, side=hi_side)
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return pa.table({c: _null_col(0, (i_types | p_types)[c])
                             for c in out_cols})
        irep = np.repeat(np.arange(len(s)), counts)
        run_starts = np.cumsum(counts) - counts
        within = np.arange(total) - np.repeat(run_starts, counts)
        prow = lo[irep] + within
        take_i = pa.array(ipos[irep], type=pa.int64())
        take_p = pa.array(ppos[order[prow]], type=pa.int64())
        cols = {}
        for c in interval_cols:
            cols[c] = group.column(c).take(take_i)
        for c in point_cols:
            cols[c] = group.column(c).take(take_p)
        return pa.table(cols)

    pu = point_ds.map_batches(points, batch_format="pyarrow")
    iu = interval_ds.map_batches(intervals, batch_format="pyarrow")
    return pu.union(iu).groupby("_ij_bucket") \
        .map_groups(match, batch_format="pyarrow")
