"""Geohash cells (cells/geohash.py)."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.cells.geohash import ALPHABET, geohash_cells, geohash_encode


def test_published_vectors():
    # Niemeyer's canonical example + Wikipedia's odd-precision vector
    gh, _ = geohash_encode(np.array([-5.6]), np.array([42.6]), 5)
    assert gh[0] == "ezs42"
    gh, _ = geohash_encode(np.array([10.40744]),
                           np.array([57.64911]), 11)
    assert gh[0] == "u4pruydqqvj"
    gh, _ = geohash_encode(np.array([0.0]), np.array([0.0]), 8)
    assert gh[0] == "s0000000"


def test_prefix_hierarchy():
    # precision-k geohash is a prefix of the precision-(k+1) geohash
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    prev = None
    for p in range(1, 12):
        gh, _ = geohash_encode(lon, lat, p)
        if prev is not None:
            assert all(g[:p - 1] == q for g, q in zip(gh, prev))
        prev = gh


def test_cell_key_matches_string():
    # the int64 key re-encodes to the same base32 string
    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 100)
    lat = rng.uniform(-90, 90, 100)
    gh, v = geohash_encode(lon, lat, 8)
    for g, k in zip(gh, v):
        s = "".join(ALPHABET[(int(k) >> (5 * (7 - i))) & 31]
                    for i in range(8))
        assert s == g


def test_bounds_clamp():
    gh, _ = geohash_encode(np.array([180.0, -180.0, 200.0]),
                           np.array([90.0, -90.0, 99.0]), 4)
    assert gh[0] == "zzzz" and gh[1] == "0000" and gh[2] == "zzzz"


def test_precision_guard():
    with pytest.raises(ValueError):
        geohash_encode(np.array([0.0]), np.array([0.0]), 13)


def test_dataset_api(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "x": pa.array([-5.6, 10.40744]),
        "y": pa.array([42.6, 57.64911])}))
    out = geohash_cells(ds, precision=5).to_pandas() \
        .sort_values("doc_id")
    assert out.geohash.tolist() == ["ezs42", "u4pru"]
