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


def event_transitions(ds, user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts", id_col: str = "event_id"):
    """Markov transition counts over per-user event streams: one row
    per (prev_type, next_type) with the number of consecutive-event
    occurrences, ordered by (ts, id) — id breaks timestamp ties so the
    bigram set is a total-order invariant (SQL LEAD twin).

    Shape: ONE groupby(user) shuffle; each group emits its pair counts
    pre-combined (np.unique over joined type strings — at most
    |types|² rows per user, not |events|), then a transition-sized
    groupby sum. Heavy users bound group size, as in funnel_steps."""

    def per_user(group: pa.Table) -> pa.Table:
        t = (group.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        eid = group.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        et = group.column(type_col).to_numpy(
            zero_copy_only=False).astype(str)
        order = np.lexsort((eid, t))
        et = et[order]
        if len(et) < 2:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        key = np.char.add(np.char.add(et[:-1], "\x1f"), et[1:])
        u, c = np.unique(key, return_counts=True)
        split = np.char.partition(u, "\x1f")
        return pa.table({"prev_type": pa.array(split[:, 0]),
                         "next_type": pa.array(split[:, 2]),
                         "n": pa.array(c.astype(np.int64))})

    per = ds.groupby(user_col).map_groups(per_user,
                                          batch_format="pyarrow")
    out = per.groupby(["prev_type", "next_type"]).sum("n")

    def rename(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if "prev_type" not in batch.schema.names or batch.num_rows == 0:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n_pairs": pa.array([], pa.int64())})
        return pa.table({"prev_type": batch.column("prev_type"),
                         "next_type": batch.column("next_type"),
                         "n_pairs": pc.cast(batch.column("sum(n)"),
                                            pa.int64())})

    return out.map_batches(rename, batch_format="pyarrow")


def retention_cohorts(ds, user_col: str = "user_id",
                      ts_col: str = "ts"):
    """Cohort retention matrix: cohort = each user's first active DAY
    (epoch days, integer); one output row per (cohort_day,
    week_offset) with the count of distinct users from that cohort
    active in that week. Day/week indices are pure int64 arithmetic
    (epoch_us // 86_400e6, offset // 7) — exact on both engines
    (date_trunc('week') is deliberately avoided: engine week-start
    conventions differ).

    Shape: a per-(user, day) dedup inside map_batches feeds ONE
    groupby(user) shuffle; each group emits its distinct (cohort_day,
    week_offset) rows (<= active days per user), and a second,
    cohort-sized groupby counts users — distinct-by-construction, no
    count-distinct aggregate needed."""

    def to_days(batch: pa.Table) -> pa.Table:
        u = batch.column(user_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = batch.column(ts_col).to_numpy(zero_copy_only=False)
        day = (t.astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        k = np.unique(u * (1 << 20) + (day & ((1 << 20) - 1)))
        # in-batch dedup only (cross-batch dups collapse in the
        # group pass); day fits 20 bits until year 4840
        return pa.table({user_col: k >> 20,
                         "day": k & ((1 << 20) - 1)})

    def per_user(group: pa.Table) -> pa.Table:
        uid = group.column(user_col)[0].as_py()
        days = np.unique(group.column("day").to_numpy(
            zero_copy_only=False))
        cohort = int(days.min())
        offs = np.unique((days - cohort) // 7)
        return pa.table({
            "cohort_day": np.full(len(offs), cohort, np.int64),
            "week_offset": offs.astype(np.int64),
            "uid": np.full(len(offs), uid, np.int64)})

    per = (ds.map_batches(to_days, batch_format="pyarrow")
           .groupby(user_col).map_groups(per_user,
                                         batch_format="pyarrow"))
    out = per.groupby(["cohort_day", "week_offset"]).count()

    def rename(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if "cohort_day" not in batch.schema.names or batch.num_rows == 0:
            return pa.table({"cohort_day": pa.array([], pa.int64()),
                             "week_offset": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        return pa.table({"cohort_day": batch.column("cohort_day"),
                         "week_offset": batch.column("week_offset"),
                         "n_users": pc.cast(batch.column("count()"),
                                            pa.int64())})

    return out.map_batches(rename, batch_format="pyarrow")
