"""Persisted tile-partitioned spatial index (io/spatialindex.py)."""
import os

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.io.spatialindex import bbox_query, build_spatial_index


def _pts(tmpdir):
    rng = np.random.default_rng(5)
    # two far-apart clusters + a sprinkle
    xa = rng.uniform(-10, 10, 200)
    ya = rng.uniform(-10, 10, 200)
    xb = rng.uniform(120, 150, 100)
    yb = rng.uniform(40, 60, 100)
    x = np.r_[xa, xb]
    y = np.r_[ya, yb]
    ids = np.arange(len(x), dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "x": pa.array(x), "y": pa.array(y)}))


def test_bbox_query_exact_and_pruned(ray_session, tmp_path):
    idx = str(tmp_path / "sidx")
    ds = _pts(tmp_path)
    build_spatial_index(ds, idx, zoom=4)
    dirs = [d for d in os.listdir(idx) if d.startswith("bucket=")]
    assert len(dirs) > 4                     # actually partitioned
    out = bbox_query(idx, -10.0, -10.0, 10.0, 10.0,
                     zoom=4).to_pandas()
    assert ((out.x >= -10) & (out.x <= 10)
            & (out.y >= -10) & (out.y <= 10)).all()
    # every cluster-A point within the box is found (exactness):
    full = ds.to_pandas()
    want = full[(full.x >= -10) & (full.x <= 10)
                & (full.y >= -10) & (full.y <= 10)]
    assert sorted(out.doc_id) == sorted(want.doc_id)
    # cluster B's buckets must not be touched by the A-box: the
    # A-box tile range at z4 misses B's tiles entirely
    from geoflow.cells.tiles import lonlat_to_tile
    atx, _ = lonlat_to_tile(np.array([-10.0, 10.0]),
                            np.array([0.0, 0.0]), 4)
    btx, _ = lonlat_to_tile(np.array([120.0]), np.array([50.0]), 4)
    assert btx[0] > atx.max()


def test_bbox_query_no_match(ray_session, tmp_path):
    idx = str(tmp_path / "sidx2")
    build_spatial_index(_pts(tmp_path), idx, zoom=4)
    out = bbox_query(idx, 60.0, -80.0, 61.0, -79.0, zoom=4)
    assert out.count() == 0


def test_index_append(ray_session, tmp_path):
    # a second build into the same dir APPENDS (Ray writes unique
    # file names; bucket dirs merge) — the incremental-ingest shape
    idx = str(tmp_path / "sidx3")
    a = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "x": pa.array([1.0, 2.0]), "y": pa.array([1.0, 2.0])}))
    b = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "x": pa.array([1.5]), "y": pa.array([1.5])}))
    build_spatial_index(a, idx, zoom=4)
    build_spatial_index(b, idx, zoom=4)
    out = bbox_query(idx, 0.0, 0.0, 3.0, 3.0, zoom=4).to_pandas()
    assert sorted(out.doc_id) == [1, 2, 3]
