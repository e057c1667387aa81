"""Round-5 batch 3 kernels: SURT keys, interval coverage edge
cases, lattice RLE."""
import numpy as np
import pyarrow as pa
import ray.data

from geoflow.text.urls import surt_keys


def test_surt_published_shape():
    got = surt_keys(pa.array([
        "http://www.Example.com/p/1",
        "https://a.b.c.example.org/x?q=1",
        "not a url 7",
        "https://single/",
        "http://example.com",
    ])).to_pylist()
    assert got == ["com,example,www)/p/1",
                   "org,example,c,b,a)/x?q=1",
                   "",
                   "single)/",
                   "com,example)"]


def test_interval_coverage_touching(ray_session):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry_t3", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    # hand events: user 1 has touching intervals (gap exactly 30 s ->
    # t == pmax -> merge), user 2 has a 31 s gap -> two islands
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [(1, base), (1, base + 30_000_000),
            (2, base), (2, base + 31_000_000)]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]"))})
    import tempfile
    import pyarrow.parquet as pq
    import os
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    df = m.q_interval_coverage(d).to_pandas().set_index("user_id")
    assert df.loc[1, "n_islands"] == 1
    assert df.loc[1, "covered_us"] == 60_000_000
    assert df.loc[2, "n_islands"] == 2
    assert df.loc[2, "covered_us"] == 60_000_000


def test_lattice_rle_hand(ray_session):
    from geoflow.ops.spatialstats import _tile_counts  # noqa: F401
    # brute-verify via the same keys path: emulate with direct math
    keys = np.sort(np.array(
        [10 * (1 << 32) + 5, 11 * (1 << 32) + 5, 13 * (1 << 32) + 5,
         10 * (1 << 32) + 6], np.int64))
    tx, ty = keys // (1 << 32), keys % (1 << 32)
    o = np.lexsort((tx, ty))
    tx, ty = tx[o], ty[o]
    newrow = np.r_[True, ty[1:] != ty[:-1]]
    newrun = newrow | np.r_[True, (tx[1:] - tx[:-1]) != 1]
    ys = ty[newrow]
    n_occ = np.diff(np.r_[np.flatnonzero(newrow), len(ty)])
    rid = np.cumsum(newrow) - 1
    n_runs = np.zeros(len(ys), np.int64)
    np.add.at(n_runs, rid, newrun.astype(np.int64))
    got = dict(zip(ys.tolist(),
                   zip(n_occ.tolist(), n_runs.tolist())))
    # row y=5 has tx {10,11,13}: 3 occupied, 2 runs; row y=6: 1/1
    assert got == {5: (3, 2), 6: (1, 1)}
