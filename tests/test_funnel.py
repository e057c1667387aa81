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
