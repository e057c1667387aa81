"""Apriori itemset counting (ops/itemsets.py) + areal-weighted
interpolation (ops/areal.py). Driver gates: `freq_pairs`,
`freq_triples`, `areal_interp`; here: semantics on hand-built rows."""

import numpy as np
import pyarrow as pa
import ray.data


def test_frequent_pairs_dedup_and_threshold(ray_session):
    from geoflow.ops.itemsets import frequent_pairs
    # u1: a,a,b,c (dup a collapses); u2: a,b; u3: b,c
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "event_type": pa.array(
            list("aabcabbc"), pa.string())}))
    out = frequent_pairs(ds, min_support=2).to_pandas()
    got = {(r.item_a, r.item_b): r.support for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "c"): 2}  # (a,c) support 1


def test_frequent_triples(ray_session):
    from geoflow.ops.itemsets import frequent_triples
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
        "event_type": pa.array(list("abcabcd"), pa.string())}))
    out = frequent_triples(ds, min_support=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.item_a, r.item_b, r.item_c, r.support) == \
        ("a", "b", "c", 2)


def test_areal_interpolate_floor_per_source(ray_session):
    from geoflow.ops.areal import SCALE, areal_interpolate
    # source A: 10x10 at origin, value 7, half in target 0 / half in
    # target 1 -> each gets floor(7*50*SCALE/100).
    src = ray.data.from_arrow(pa.table({
        "x0": pa.array([0], pa.int64()), "y0": pa.array([0], pa.int64()),
        "x1": pa.array([10], pa.int64()),
        "y1": pa.array([10], pa.int64()),
        "value": pa.array([7], pa.int64())}))
    targets = pa.table({
        "target_id": pa.array([0, 1, 2], pa.int64()),
        "x0": pa.array([0, 5, 50], pa.int64()),
        "y0": pa.array([0, 0, 50], pa.int64()),
        "x1": pa.array([5, 10, 60], pa.int64()),
        "y1": pa.array([10, 10, 60], pa.int64())})
    out = areal_interpolate(src, targets).to_pandas() \
        .sort_values("target_id")
    assert out.target_id.tolist() == [0, 1]   # untouched target absent
    assert out.est_units.tolist() == [(7 * 50 * SCALE) // 100] * 2
