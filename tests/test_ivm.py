"""Incremental view maintenance (geoflow/io/ivm.py): exactness
under append / COW delete / compaction, only-delta processing,
no-op re-update, and view time-travel via versioned state."""
import numpy as np
import pyarrow as pa
import ray.data

from geoflow.io.ivm import read_view, update_view
from geoflow.io.snapshots import append, compact, delete_where

LANGS = ["en", "de", "fr"]


def _ds(ids):
    ids = np.asarray(list(ids), np.int64)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "lang": pa.array([LANGS[i % 3] for i in ids])}))


def _counts(state_dir):
    _s, t = read_view(state_dir)
    return dict(zip(t.column("lang").to_pylist(),
                    t.column("cnt").to_pylist()))


def test_ivm_append_delete_compact_exact(tmp_path):
    td, sd = str(tmp_path / "t"), str(tmp_path / "s")
    append(_ds(range(0, 60)), td, "doc_id")
    assert update_view(td, sd, "lang") == 1
    assert _counts(sd) == {"en": 20, "de": 20, "fr": 20}
    append(_ds(range(60, 90)), td, "doc_id")
    update_view(td, sd, "lang")
    assert _counts(sd) == {"en": 30, "de": 30, "fr": 30}
    # delete ids 0..29 -> removes 10 per lang
    delete_where(td, "doc_id", 0, 29)
    update_view(td, sd, "lang")
    assert _counts(sd) == {"en": 20, "de": 20, "fr": 20}
    # compaction is a net-zero diff for the view
    compact(td, target_rows=50)
    update_view(td, sd, "lang")
    assert _counts(sd) == {"en": 20, "de": 20, "fr": 20}


def test_ivm_noop_and_view_time_travel(tmp_path):
    td, sd = str(tmp_path / "t"), str(tmp_path / "s")
    append(_ds(range(0, 30)), td, "doc_id")
    update_view(td, sd, "lang")
    # re-update at same snapshot: no-op, same state id
    assert update_view(td, sd, "lang") == 1
    append(_ds(range(30, 60)), td, "doc_id")
    update_view(td, sd, "lang")
    # older view state still readable (versioned)
    _s1, t1 = read_view(sd, 1)
    assert sum(t1.column("cnt").to_pylist()) == 30
    _s2, t2 = read_view(sd, 2)
    assert sum(t2.column("cnt").to_pylist()) == 60


def test_ivm_group_vanishes_when_count_zero(tmp_path):
    td, sd = str(tmp_path / "t"), str(tmp_path / "s")
    # only lang 'en' ids (multiples of 3)
    append(_ds([0, 3, 6]), td, "doc_id")
    update_view(td, sd, "lang")
    assert _counts(sd) == {"en": 3}
    delete_where(td, "doc_id", 0, 10)
    update_view(td, sd, "lang")
    assert _counts(sd) == {}
