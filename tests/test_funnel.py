"""Ordered funnel (ops/funnel.py). Driver gate: the `funnel` oracle
query; here: ordering semantics on hand-built event streams."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.ops.funnel import funnel_steps


def _run(rows, steps=("view", "click", "purchase")):
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([np.datetime64(r[2], "us") for r in rows],
                       pa.timestamp("us"))})
    out = funnel_steps(ray.data.from_arrow(t), list(steps)).to_pandas()
    return out.set_index("user_id")


def test_full_funnel_and_order():
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T00:01:00"),
        (1, "purchase", "2024-01-01T00:02:00"),
        # user 2: click BEFORE view -> funnel stops after view
        (2, "click", "2024-01-01T00:00:00"),
        (2, "view", "2024-01-01T00:01:00"),
        (2, "purchase", "2024-01-01T00:02:00"),
        # user 3: never views
        (3, "click", "2024-01-01T00:00:00"),
    ]
    out = _run(rows)
    assert out.loc[1, "steps_completed"] == 3
    assert out.loc[1, "t3_us"] > out.loc[1, "t2_us"] > out.loc[1, "t1_us"]
    # user 2: view matched, but no click after the view -> stops at 1
    # (purchase after view does NOT count without the click step)
    assert out.loc[2, "steps_completed"] == 1
    assert out.loc[2, "t2_us"] == -1 and out.loc[2, "t3_us"] == -1
    assert out.loc[3, "steps_completed"] == 0
    assert out.loc[3, "t1_us"] == -1


def test_earliest_chain_not_any_chain():
    # first view at t0; clicks exist only BEFORE t0's first click...
    # verify min-after semantics: the matched click is the EARLIEST
    # one after the first view, not the one enabling a purchase
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T00:05:00"),   # matched (earliest)
        (1, "purchase", "2024-01-01T00:03:00"),  # before click -> lost
    ]
    out = _run(rows)
    assert out.loc[1, "steps_completed"] == 2
    assert out.loc[1, "t2_us"] == int(
        np.datetime64("2024-01-01T00:05:00", "us").astype(np.int64))


def test_strictly_after_ties_do_not_chain():
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T00:00:00"),   # same instant -> no
    ]
    out = _run(rows)
    assert out.loc[1, "steps_completed"] == 1


def test_retention_cohorts():
    from geoflow.ops.funnel import retention_cohorts
    rows = [
        # user 1: first day 0, active days 0, 8 (week 1), 15 (week 2)
        (1, "2024-01-01T10:00:00"), (1, "2024-01-01T11:00:00"),
        (1, "2024-01-09T00:00:00"), (1, "2024-01-16T00:00:00"),
        # user 2: same cohort day, only week 0
        (2, "2024-01-01T23:00:00"),
        # user 3: later cohort (day 7), weeks 0 and 1
        (3, "2024-01-08T00:00:00"), (3, "2024-01-15T00:00:00"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       pa.timestamp("us"))})
    out = retention_cohorts(ray.data.from_arrow(t)).to_pandas()
    d0 = int(np.datetime64("2024-01-01", "us").astype(np.int64)
             // 86_400_000_000)
    got = {(r.cohort_day, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(d0, 0): 2, (d0, 1): 1, (d0, 2): 1,
                   (d0 + 7, 0): 1, (d0 + 7, 1): 1}


def test_event_transitions_counts_and_tie_order():
    from geoflow.ops.funnel import event_transitions
    # user 1: a->b->a (ts order), with a TS TIE broken by event_id
    # user 2: single event (no pairs)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    tbl = pa.table({
        "event_id": pa.array([4, 2, 3, 9], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["b", "a", "a", "x"]),
        # events 2 and 3 tie on ts: event_id orders a(2) before a(3)?
        # no — 2 is at t0, 3 ties with 4 at t0+1: id 3 < 4 => a then b
        "ts": pa.array([t0 + 1, t0, t0 + 1, t0], pa.timestamp("us")),
    })
    out = event_transitions(ray.data.from_arrow(tbl)).to_pandas()
    got = {(r.prev_type, r.next_type): r.n_pairs
           for r in out.itertuples()}
    assert got == {("a", "a"): 1, ("a", "b"): 1}


def test_event_transitions_partial_combine():
    from geoflow.ops.funnel import event_transitions
    # one user, repeated bigram: per-user combiner emits n=3 once
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    n = 7
    tbl = pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "user_id": pa.array([5] * n, pa.int64()),
        "event_type": pa.array(["p", "q"] * 3 + ["p"]),
        "ts": pa.array([t0 + i for i in range(n)], pa.timestamp("us")),
    })
    out = event_transitions(ray.data.from_arrow(tbl)).to_pandas()
    got = {(r.prev_type, r.next_type): r.n_pairs
           for r in out.itertuples()}
    assert got == {("p", "q"): 3, ("q", "p"): 3}
