"""Crawl snapshot diffing — text/snapshots.py."""
import pyarrow as pa

from geoflow.text.snapshots import snapshot_diff


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _diff(old, new):
    out = snapshot_diff(_ds(old), _ds(new), num_partitions=2)
    return {r["url"]: (r["sig_old"], r["sig_new"], r["status"])
            for r in out.take_all()}


def test_all_four_statuses(ray_session):
    old = [{"url": "a", "sig": 1}, {"url": "b", "sig": 2},
           {"url": "c", "sig": 3}]
    new = [{"url": "b", "sig": 2}, {"url": "c", "sig": 9},
           {"url": "d", "sig": 4}]
    got = _diff(old, new)
    assert got == {"a": (1, None, "deleted"),
                   "b": (2, 2, "same"),
                   "c": (3, 9, "changed"),
                   "d": (None, 4, "added")}


def test_empty_sides(ray_session):
    got = _diff([], [{"url": "x", "sig": 7}])
    assert got == {"x": (None, 7, "added")}
    got = _diff([{"url": "y", "sig": 5}], [])
    assert got == {"y": (5, None, "deleted")}
    assert _diff([], []) == {}


def test_disjoint_snapshots(ray_session):
    old = [{"url": f"o{i}", "sig": i} for i in range(20)]
    new = [{"url": f"n{i}", "sig": i} for i in range(20)]
    got = _diff(old, new)
    assert len(got) == 40
    assert all(v[2] == "deleted" for k, v in got.items()
               if k.startswith("o"))
    assert all(v[2] == "added" for k, v in got.items()
               if k.startswith("n"))
