"""Allen-interval temporal operators over struct<from_ts, to_ts> columns.

Reference: temporal/*.java — e.g. After.java:9-20 is
``range1.from.after(range2.to)``. Here periods are Arrow
struct<from_ts: timestamp, to_ts: timestamp> columns and every predicate is
a vectorized timestamp comparison.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .registry import register_op


def _f(col):
    return pc.struct_field(col, "from_ts")


def _t(col):
    return pc.struct_field(col, "to_ts")


def make_period(from_ts, to_ts) -> pa.StructArray:
    from_ts = pa.array(from_ts) if not isinstance(from_ts, (pa.Array, pa.ChunkedArray)) else from_ts
    to_ts = pa.array(to_ts) if not isinstance(to_ts, (pa.Array, pa.ChunkedArray)) else to_ts
    if isinstance(from_ts, pa.ChunkedArray):
        from_ts = from_ts.combine_chunks()
    if isinstance(to_ts, pa.ChunkedArray):
        to_ts = to_ts.combine_chunks()
    return pa.StructArray.from_arrays([from_ts, to_ts], ["from_ts", "to_ts"])


@register_op("t_after", 2, "temporal")
def t_after(a, b):
    """After.java:9 — a.from > b.to."""
    return pc.greater(_f(a), _t(b))


@register_op("t_before", 2, "temporal")
def t_before(a, b):
    """Before.java:9 — a.to < b.from."""
    return pc.less(_t(a), _f(b))


@register_op("t_during", 2, "temporal")
def t_during(a, b):
    """During.java:9 — b.from < a.from and a.to < b.to."""
    return pc.and_(pc.less(_f(b), _f(a)), pc.less(_t(a), _t(b)))


@register_op("t_contains", 2, "temporal")
def t_contains(a, b):
    """PeriodContains.java:9 — a.from < b.from and b.to < a.to."""
    return pc.and_(pc.less(_f(a), _f(b)), pc.less(_t(b), _t(a)))


@register_op("t_equals", 2, "temporal")
def t_equals(a, b):
    """EqualsPeriod.java:9."""
    return pc.and_(pc.equal(_f(a), _f(b)), pc.equal(_t(a), _t(b)))


@register_op("t_starts", 2, "temporal")
def t_starts(a, b):
    """Starts.java:9 — same start, a ends first."""
    return pc.and_(pc.equal(_f(a), _f(b)), pc.less(_t(a), _t(b)))


@register_op("t_finishes", 2, "temporal")
def t_finishes(a, b):
    """Finishes.java:9 — same end, a starts later."""
    return pc.and_(pc.equal(_t(a), _t(b)), pc.greater(_f(a), _f(b)))


@register_op("t_meets", 2, "temporal")
def t_meets(a, b):
    """Meets (stub in reference; standard Allen: a.to == b.from)."""
    return pc.equal(_t(a), _f(b))


@register_op("t_overlaps", 2, "temporal")
def t_overlaps(a, b):
    """PeriodOverlaps (stub in reference; standard Allen interval
    intersection test)."""
    return pc.and_(pc.less(_f(a), _t(b)), pc.less(_f(b), _t(a)))


@register_op("t_period_start", 1, "temporal")
def t_period_start(a):
    """PeriodStart.java:11."""
    return _f(a)


@register_op("t_period_end", 1, "temporal")
def t_period_end(a):
    """PeriodEnd.java:11."""
    return _t(a)


@register_op("t_minus", 2, "temporal")
def t_minus(a, b):
    """Minus.java:11 — clamp a by removing overlap with b (keeps the
    leading part of a, reference behavior)."""
    new_to = pc.if_else(t_overlaps(a, b), pc.min_element_wise(_t(a), _f(b)), _t(a))
    return make_period(_f(a), new_to)


def sessionize(ds, user_col="user_id", ts_col="ts", order_col=None,
               gap_us=30 * 60 * 1_000_000, num_buckets=64,
               out_col="session_idx"):
    """Gap-based sessionization at key-cardinality scale.

    Instead of groupby(user).map_groups — one Python invocation per user
    key, the slowest shape Ray offers at 10^9 users — users are hashed
    into `num_buckets` salt groups (size ∝ cluster, NOT key count); each
    group is lexsorted by (user, ts[, order]) once and session
    boundaries are detected in a single vectorized numpy pass: a new
    session starts where the user changes or the time gap exceeds
    `gap_us`. Per-user session indexes come from one global cumsum with
    the value at each user's first row subtracted out.

    Returns the input rows (all columns preserved) + int64 `out_col`.
    Partitioning assumption: all rows of a user land in one bucket
    (guaranteed by hashing the user key)."""
    import numpy as np

    from ..text.hashing import mix64

    def bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = mix64(uid.view(np.uint64)) % np.uint64(num_buckets)
        return batch.append_column("_sess_bucket",
                                   pa.array(b.view(np.int64)))

    def sessions(group: pa.Table) -> pa.Table:
        n = group.num_rows
        uid = group.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = group.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keys = [ts, uid]
        if order_col is not None:
            keys.insert(0, group.column(order_col).to_numpy(
                zero_copy_only=False))
        order = np.lexsort(keys)
        uid_s, ts_s = uid[order], ts[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid_s[1:] != uid_s[:-1]
        new_sess = np.zeros(n, dtype=np.int64)
        new_sess[1:] = ((ts_s[1:] - ts_s[:-1]) > gap_us).astype(np.int64)
        new_sess[new_user] = 0
        c = np.cumsum(new_sess)
        first = np.nonzero(new_user)[0]
        runs = np.diff(np.append(first, n))
        sess_idx = c - np.repeat(c[first], runs)
        out = group.take(pa.array(order, type=pa.int64()))
        out = out.drop_columns(["_sess_bucket"])
        return out.append_column(out_col, pa.array(sess_idx))

    return ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_sess_bucket").map_groups(sessions,
                                            batch_format="pyarrow")
