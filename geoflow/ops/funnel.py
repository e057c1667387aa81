"""Ordered-funnel analysis over an event stream — the product-analytics
primitive: for each user, the earliest chain of step events in strict
temporal order (step k+1 must occur strictly AFTER the matched step k;
the standard "first touch" funnel, not windowed).

Shape: one groupby(user) shuffle + a vectorized in-group pass (events
per user are small; heavy users bound the group size — salt or cap
upstream if a single user's events exceed worker memory). Timestamps
leave as int64 epoch-MICROSECONDS (``*_us`` columns, -1 = step not
reached) because cross-engine timestamp hashing is unit-sensitive
(CLAUDE.md) and int64 is exact on both engines."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def funnel_steps(ds, steps, user_col: str = "user_id",
                 type_col: str = "event_type", ts_col: str = "ts"):
    """One row per user: ``steps_completed`` (0..len(steps)) and a
    ``t{i}_us`` int64 epoch-microsecond column per step (-1 when the
    funnel stopped earlier). ``steps`` is the ordered list of
    event-type strings."""
    steps = list(steps)
    names = [f"t{i + 1}_us" for i in range(len(steps))]

    def fn(group: pa.Table) -> pa.Table:
        uid = group.column(user_col)[0].as_py()
        et = group.column(type_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).to_numpy(zero_copy_only=False)
        t = ts.astype("datetime64[us]").astype(np.int64)
        prev = np.int64(-(1 << 62))
        out = {}
        done = 0
        reached = True
        for i, step in enumerate(steps):
            tcur = np.int64(-1)
            if reached:
                m = (et == step) & (t > prev)
                if m.any():
                    tcur = t[m].min()
                    prev = tcur
                    done += 1
                else:
                    reached = False
            out[names[i]] = tcur
        cols = {user_col: pa.array([uid], pa.int64()),
                "steps_completed": pa.array([done], pa.int64())}
        for nm in names:
            cols[nm] = pa.array([int(out[nm])], pa.int64())
        return pa.table(cols)

    return ds.groupby(user_col).map_groups(fn, batch_format="pyarrow")
