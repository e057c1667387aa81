"""Bucket-partitioned storage + co-partitioned shuffle-free join
(geoflow/io/bucketed.py): bucket assignment determinism, layout,
join parity vs a brute-force pandas merge, missing buckets, outer
joins, idempotent re-write."""
import os

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.io.bucketed import (copartitioned_join, write_bucketed,
                                 _bucket_of)


def _write(tmp, name, key, table, n=8):
    p = str(tmp / name)
    write_bucketed(ray.data.from_arrow(table).repartition(3),
                   p, key, n).take_all()
    return p


def test_join_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(21)
    lt = pa.table({"k": pa.array(rng.integers(0, 50, 400),
                                 pa.int64()),
                   "lv": pa.array(np.arange(400), pa.int64())})
    rt = pa.table({"k2": pa.array(rng.integers(0, 50, 60),
                                  pa.int64()),
                   "rv": pa.array(np.arange(60) * 7, pa.int64())})
    lp = _write(tmp_path, "l", "k", lt)
    rp = _write(tmp_path, "r", "k2", rt)
    out = copartitioned_join(lp, rp, "k", "k2",
                             n_buckets=8).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    import pandas as pd
    want = lt.to_pandas().merge(rt.to_pandas(), left_on="k",
                                right_on="k2")
    want = sorted(map(tuple, want[["k", "lv", "rv"]].values.tolist()))
    assert got == want


def test_bucket_layout_and_determinism(tmp_path):
    t = pa.table({"k": pa.array(np.arange(100), pa.int64()),
                  "v": pa.array(np.arange(100), pa.int64())})
    p = _write(tmp_path, "t", "k", t)
    dirs = sorted(os.listdir(p))
    assert all(d.startswith("bucket=") for d in dirs)
    # every row is in the bucket its key hashes to
    import pyarrow.parquet as pq
    for d in dirs:
        bid = int(d.split("=")[1])
        for f in os.listdir(os.path.join(p, d)):
            ks = pq.read_table(os.path.join(p, d, f)).column("k") \
                .to_numpy(zero_copy_only=False)
            assert (_bucket_of(ks, 8) == bid).all()
    # idempotent re-write: same content-hash files
    before = {d: sorted(os.listdir(os.path.join(p, d))) for d in dirs}
    write_bucketed(ray.data.from_arrow(t).repartition(3), p, "k",
                   8).take_all()
    after = {d: sorted(os.listdir(os.path.join(p, d))) for d in dirs}
    assert before == after


def test_missing_buckets_and_left_outer(tmp_path):
    # left keys hash into few buckets; right side sparse
    lt = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                   "lv": pa.array([10, 20, 30], pa.int64())})
    rt = pa.table({"k2": pa.array([2], pa.int64()),
                   "rv": pa.array([99], pa.int64())})
    lp = _write(tmp_path, "l", "k", lt)
    rp = _write(tmp_path, "r", "k2", rt)
    inner = copartitioned_join(lp, rp, "k", "k2",
                               n_buckets=8).take_all()
    assert [(r["k"], r["rv"]) for r in inner] == [(2, 99)]
    lo = copartitioned_join(lp, rp, "k", "k2", n_buckets=8,
                            join_type="left outer").take_all()
    assert sorted((r["k"], r["rv"]) for r in lo) == \
        [(1, None), (2, 99), (3, None)]


def test_rebucket_locally_splits_and_preserves_join(tmp_path):
    from geoflow.io.bucketed import rebucket
    rng = np.random.default_rng(5)
    lt = pa.table({"k": pa.array(rng.integers(0, 200, 500),
                                 pa.int64()),
                   "lv": pa.array(np.arange(500), pa.int64())})
    rt = pa.table({"k2": pa.array(rng.integers(0, 200, 80),
                                  pa.int64()),
                   "rv": pa.array(np.arange(80), pa.int64())})
    lp = _write(tmp_path, "l", "k", lt, n=4)
    rp = _write(tmp_path, "r", "k2", rt, n=8)
    # grow left 4 -> 8 buckets, then join co-partitioned at 8
    lp2 = str(tmp_path / "l8")
    stats = rebucket(lp, lp2, "k", 4, factor=2).take_all()
    assert sum(r["rows"] for r in stats) == 500
    assert {int(d.split("=")[1]) for d in os.listdir(lp2)} <= set(range(8))
    out = copartitioned_join(lp2, rp, "k", "k2",
                             n_buckets=8).take_all()
    import pandas as pd
    want = lt.to_pandas().merge(rt.to_pandas(), left_on="k",
                                right_on="k2")
    assert sorted((r["k"], r["lv"], r["rv"]) for r in out) == \
        sorted(map(tuple, want[["k", "lv", "rv"]].values.tolist()))
