"""Snapshot table layer (geoflow/io/snapshots.py): atomic commits,
time travel, copy-on-write file carry-over, manifest pruning,
idempotent re-append, stale-tmp tolerance, concurrent-commit
detection."""
import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geoflow.io.snapshots import (append, delete_where,
                                  list_snapshots, read_manifest,
                                  read_snapshot)


def _ds(ids):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, np.int64)),
        "v": pa.array(np.asarray(ids, np.int64) * 10)}))


def test_append_time_travel_and_delete(tmp_path):
    td = str(tmp_path / "t")
    s1 = append(_ds(range(0, 100)).repartition(4), td, "doc_id")
    s2 = append(_ds(range(100, 200)).repartition(4), td, "doc_id")
    assert (s1, s2) == (1, 2)
    assert read_snapshot(td, 1).count() == 100
    assert read_snapshot(td, 2).count() == 200
    # COW delete of even ids in [0, 50)
    s3 = delete_where(td, "doc_id", 0, 49,
                      predicate=lambda b: b.column("doc_id")
                      .to_numpy(zero_copy_only=False) % 2 == 0)
    assert s3 == 3
    ids3 = sorted(r["doc_id"] for r in read_snapshot(td, 3).take_all())
    want = [i for i in range(200) if not (i < 50 and i % 2 == 0)]
    assert ids3 == want
    # older snapshots untouched (time travel)
    assert read_snapshot(td, 2).count() == 200
    assert read_snapshot(td, 1).count() == 100


def test_cow_carries_disjoint_files(tmp_path):
    td = str(tmp_path / "t")
    append(_ds(range(0, 50)), td, "doc_id")
    append(_ds(range(1000, 1050)), td, "doc_id")
    man2 = read_manifest(td, 2)
    delete_where(td, "doc_id", 0, 10)
    man3 = read_manifest(td, 3)
    # the [1000,1050) file(s) must be carried over by path identity
    hi = {f["path"] for f in man2["files"] if f["key_min"] >= 1000}
    assert hi and hi <= {f["path"] for f in man3["files"]}
    assert read_snapshot(td, 3).count() == 50 + 50 - 11


def test_manifest_pruning_reads_fewer_files(tmp_path):
    td = str(tmp_path / "t")
    for lo in (0, 1000, 2000, 3000):
        append(_ds(range(lo, lo + 100)), td, "doc_id")
    pruned = read_snapshot(td, None, key_lo=2000, key_hi=2099)
    assert pruned.count() == 100
    full = read_snapshot(td)
    assert full.count() == 400
    # pruning happened at the manifest level: fewer input files
    assert len(pruned.input_files()) < len(full.input_files())


def test_idempotent_reappend_and_empty(tmp_path):
    td = str(tmp_path / "t")
    append(_ds(range(10)), td, "doc_id")
    n_files = len(os.listdir(os.path.join(td, "data")))
    append(_ds(range(10)), td, "doc_id")  # same content
    assert len(os.listdir(os.path.join(td, "data"))) == n_files
    assert read_snapshot(td, 2).count() == 20  # same file listed twice
    with pytest.raises(ValueError):
        read_manifest(td, 999)
    assert read_snapshot(str(tmp_path / "nope"), None) is None


def test_stale_tmp_ignored_and_concurrent_commit(tmp_path):
    td = str(tmp_path / "t")
    append(_ds(range(10)), td, "doc_id")
    # a crashed commit leaves a .tmp — readers must ignore it
    stale = os.path.join(td, "meta", "snap-00000009.json.tmp-999")
    with open(stale, "w") as f:
        f.write("{")
    assert list_snapshots(td) == [1]
    # simulating a concurrent winner: same snapshot id already present
    man = read_manifest(td)
    man2 = dict(man, snapshot=man["snapshot"])
    from geoflow.io.snapshots import _commit
    with pytest.raises(RuntimeError):
        _commit(td, man2)
    # key_col mismatch guard
    with pytest.raises(ValueError):
        append(_ds(range(5)), td, "v")


def test_delete_everything_yields_empty_snapshot(tmp_path):
    td = str(tmp_path / "t")
    append(_ds(range(20)), td, "doc_id")
    delete_where(td, "doc_id", 0, 100)
    man = read_manifest(td)
    assert man["files"] == []
    assert read_snapshot(td) is None
    # lineage intact: snapshot 1 still reads
    assert read_snapshot(td, 1).count() == 20


def test_compaction_preserves_content_and_shrinks_files(tmp_path):
    from geoflow.io.snapshots import compact
    td = str(tmp_path / "t")
    # many tiny appends -> many small files
    for lo in range(0, 100, 10):
        append(_ds(range(lo, lo + 10)), td, "doc_id")
    man = read_manifest(td)
    assert len(man["files"]) == 10
    s = compact(td, target_rows=40)
    man2 = read_manifest(td, s)
    assert len(man2["files"]) < 10
    ids = sorted(r["doc_id"] for r in read_snapshot(td, s).take_all())
    assert ids == list(range(100))
    # time travel still intact; stats present on compacted files
    assert read_snapshot(td, 5).count() == 50
    for f in man2["files"]:
        assert f["key_min"] <= f["key_max"]


def test_snapshot_row_diff_cdc(tmp_path):
    from geoflow.io.snapshots import snapshot_row_diff
    td = str(tmp_path / "t")
    append(_ds(range(0, 40)), td, "doc_id")
    append(_ds(range(40, 60)), td, "doc_id")
    delete_where(td, "doc_id", 10, 19)
    d12 = {r["doc_id"]: r["delta"] for r in
           snapshot_row_diff(td, 1, 2, "doc_id").take_all()}
    assert d12 == {i: 1 for i in range(40, 60)}
    d23 = {r["doc_id"]: r["delta"] for r in
           snapshot_row_diff(td, 2, 3, "doc_id").take_all()}
    assert d23 == {i: -1 for i in range(10, 20)}
    # carried rows cancel: 1->3 is insert(40..60) minus delete(10..20)
    d13 = {r["doc_id"]: r["delta"] for r in
           snapshot_row_diff(td, 1, 3, "doc_id").take_all()}
    want = {i: 1 for i in range(40, 60)}
    want.update({i: -1 for i in range(10, 20)})
    assert d13 == want
    # identical snapshots: empty diff
    assert snapshot_row_diff(td, 2, 2, "doc_id").count() == 0


def test_upsert_replaces_and_appends(tmp_path):
    from geoflow.io.snapshots import upsert
    td = str(tmp_path / "t")
    append(_ds(range(0, 30)), td, "doc_id")
    # upsert: replace ids 5..9 with new v values, add 100..104
    newt = pa.table({
        "doc_id": pa.array(list(range(5, 10)) + list(range(100, 105)),
                           pa.int64()),
        "v": pa.array([-1] * 10, pa.int64())})
    s = upsert(ray.data.from_arrow(newt), td, "doc_id")
    rows = {r["doc_id"]: r["v"] for r in
            read_snapshot(td, s).take_all()}
    assert len(rows) == 35
    for i in range(5, 10):
        assert rows[i] == -1
    for i in range(100, 105):
        assert rows[i] == -1
    for i in list(range(0, 5)) + list(range(10, 30)):
        assert rows[i] == i * 10
    # pre-upsert snapshot unchanged (time travel)
    old = {r["doc_id"]: r["v"] for r in
           read_snapshot(td, 1).take_all()}
    assert old[5] == 50 and len(old) == 30


def test_expire_snapshots_gc(tmp_path):
    from geoflow.io.snapshots import expire_snapshots, list_snapshots
    td = str(tmp_path / "t")
    append(_ds(range(0, 20)), td, "doc_id")        # snap 1
    append(_ds(range(20, 40)), td, "doc_id")       # snap 2
    delete_where(td, "doc_id", 0, 39)              # snap 3 (empty)
    append(_ds(range(50, 60)), td, "doc_id")       # snap 4
    res = expire_snapshots(td, keep_last=2)
    assert res["expired"] == [1, 2] and res["kept"] == [3, 4]
    # snaps 1-2's files are referenced by nobody kept -> deleted
    assert res["files_deleted"] > 0
    assert list_snapshots(td) == [3, 4]
    # kept snapshots still read fine
    assert read_snapshot(td, 4).count() == 10
    assert read_snapshot(td, 3) is None
    import pytest as _pt
    with _pt.raises(ValueError):
        read_manifest(td, 1)
    # expiring again is a no-op
    res2 = expire_snapshots(td, keep_last=2)
    assert res2["expired"] == [] and res2["files_deleted"] == 0


def test_expire_keeps_files_shared_with_kept_snapshots(tmp_path):
    from geoflow.io.snapshots import expire_snapshots
    td = str(tmp_path / "t")
    append(_ds(range(0, 30)), td, "doc_id")        # snap 1
    append(_ds(range(30, 40)), td, "doc_id")       # snap 2 shares 1's files
    expire_snapshots(td, keep_last=1)
    # snap 2 references snap 1's data files -> they must survive
    assert read_snapshot(td, 2).count() == 40


def test_mad_and_theilsen_queries_smoke():
    # window-adjacent regression pins for the two robust-stat
    # queries (oracle-gated at three scales; this is the fast local
    # guard): hand data with known med/MAD and slope
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry
    t = entry.queries()["mad_stats"]("/root/testdata/sf0.001")
    assert t.num_rows == 5 and t.column_names == [
        "event_type", "med", "mad"]
    assert all(v >= 0 for v in t.column("mad").to_pylist())
    ds = entry.queries()["theilsen_trend"]("/root/testdata/sf0.001")
    rows = ds.take_all()
    assert len(rows) == 150
    assert all(r["n_pairs"] > 0 for r in rows)


def test_column_metrics_pruning(tmp_path):
    td = str(tmp_path / "t")
    # v ranges disjoint per append -> prunable on the NON-key column
    append(_ds(range(0, 50)), td, "doc_id")      # v in [0, 490]
    append(_ds(range(100, 150)), td, "doc_id")   # v in [1000, 1490]
    full = read_snapshot(td)
    pruned = read_snapshot(td, where={"v": (1000, 1200)})
    assert pruned.count() == 50                  # file-level prune
    assert len(pruned.input_files()) < len(full.input_files())
    # range matching nothing -> all files pruned away
    assert read_snapshot(td, where={"v": (5000, 6000)}) is None
    # unknown column: conservatively keeps everything
    assert read_snapshot(td, where={"zzz": (0, 1)}).count() == 100
