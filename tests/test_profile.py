"""Distributed table profiling (geoflow/ops/profile.py)."""

import numpy as np
import pyarrow as pa

from geoflow.ops.profile import profile_batch, profile_columns


def _tbl():
    return pa.table({
        "i": pa.array([3, None, 7, 1], type=pa.int64()),
        "f": pa.array([1.5, 2.5, None, -4.0], type=pa.float64()),
        "s": pa.array(["ab", None, "", "héllo"], type=pa.string()),
        "b": pa.array([True, False, None, True]),
        "t": pa.array([1_000_000, 2_000_000, 3_000_000, None],
                      type=pa.timestamp("us")),
        "dead": pa.array([None] * 4, type=pa.float64()),
        "lst": pa.array([[1], [2], None, [3]],
                        type=pa.list_(pa.int32()))})


def test_profile_batch_types_and_nulls():
    out = {r["col_name"]: r for r in profile_batch(_tbl()).to_pylist()}
    assert out["i"] == {"col_name": "i", "n_rows": 4, "n_nulls": 1,
                        "min_v": 1.0, "max_v": 7.0}
    assert out["f"]["min_v"] == -4.0 and out["f"]["max_v"] == 2.5
    # string: BYTE length (héllo = 6 utf-8 bytes), nulls excluded
    assert out["s"]["min_v"] == 0.0 and out["s"]["max_v"] == 6.0
    assert out["b"]["min_v"] == 0.0 and out["b"]["max_v"] == 1.0
    assert out["t"]["min_v"] == 1e6 and out["t"]["max_v"] == 3e6
    # all-null column: counts yes, extremes null
    assert out["dead"]["n_nulls"] == 4 and out["dead"]["min_v"] is None
    # unprofilable type (list): counted, extremes null
    assert out["lst"]["n_nulls"] == 1 and out["lst"]["max_v"] is None


def test_profile_columns_grouped():
    import ray
    tbl = pa.table({
        "src": pa.array(["a", "a", "b", "b", "b"], type=pa.string()),
        "v": pa.array([1, None, 10, 20, 30], type=pa.int64())})
    out = {(r["src"], r["col_name"]): r for r in
           profile_columns(ray.data.from_arrow(tbl), ["v"],
                           group_by="src").take_all()}
    assert out[("a", "v")] == {"src": "a", "col_name": "v", "n_rows": 2,
                               "n_nulls": 1, "min_v": 1.0, "max_v": 1.0}
    assert out[("b", "v")]["n_rows"] == 3
    assert out[("b", "v")]["min_v"] == 10.0
    assert out[("b", "v")]["max_v"] == 30.0


def test_profile_columns_distributed_merge():
    import ray
    ds = ray.data.from_arrow(_tbl()).union(
        ray.data.from_arrow(pa.table({
            "i": pa.array([100, -5], type=pa.int64()),
            "f": pa.array([9.0, None], type=pa.float64()),
            "s": pa.array(["longest-string", "x"], type=pa.string()),
            "b": pa.array([False, False]),
            "t": pa.array([500, None], type=pa.timestamp("us")),
            "dead": pa.array([None, None], type=pa.float64()),
            "lst": pa.array([[9], []], type=pa.list_(pa.int32()))})))
    out = {r["col_name"]: r for r in
           profile_columns(ds, ["i", "f", "s", "dead"]).take_all()}
    assert out["i"] == {"col_name": "i", "n_rows": 6, "n_nulls": 1,
                        "min_v": -5.0, "max_v": 100.0}
    assert out["f"]["n_nulls"] == 2 and out["f"]["max_v"] == 9.0
    assert out["s"]["max_v"] == 14.0
    assert out["dead"]["n_nulls"] == 6 and out["dead"]["min_v"] is None


def test_profile_columns_null_group_key():
    # NULL group keys must land in a dedicated NULL group (SQL GROUP BY
    # semantics), not silently vanish from the counts (ADVICE r3).
    import ray
    tbl = pa.table({
        "src": pa.array(["a", None, "b", None, "b"], type=pa.string()),
        "v": pa.array([1, 2, 10, None, 30], type=pa.int64())})
    rows = profile_columns(ray.data.from_arrow(tbl), ["v"],
                           group_by="src").take_all()
    out = {(r["src"], r["col_name"]): r for r in rows}
    assert out[(None, "v")]["n_rows"] == 2
    assert out[(None, "v")]["n_nulls"] == 1
    assert out[(None, "v")]["min_v"] == 2.0
    # total row count across groups == table rows
    assert sum(r["n_rows"] for r in rows) == 5
