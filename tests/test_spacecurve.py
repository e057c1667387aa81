"""Space-filling-curve keys (ops/spacecurve.py). Driver gate: the
`curve_keys` query (16-level Hilbert CTE chain + 32-term Morton SQL);
here: bijection + unit-step continuity on full grids, published small
vectors, and the locality property spatial_sort exists for."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.ops.spacecurve import curve_keys, hilbert_key, morton_key, \
    spatial_sort


def test_morton_small_vectors():
    x = np.array([0, 1, 0, 3, 65535])
    y = np.array([0, 0, 1, 5, 65535])
    got = morton_key(x, y, 16)
    assert got.tolist() == [0, 1, 2, 39, (1 << 32) - 1]


def test_hilbert_order1_quadrants():
    # classic U: (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    got = hilbert_key(np.array([0, 0, 1, 1]),
                      np.array([0, 1, 1, 0]), 1)
    assert got.tolist() == [0, 1, 2, 3]


def _full_grid(bits):
    n = 1 << bits
    xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return xx.ravel(), yy.ravel()


def test_hilbert_bijection_and_unit_steps():
    bits = 4
    x, y = _full_grid(bits)
    d = hilbert_key(x, y, bits)
    n2 = 1 << (2 * bits)
    assert sorted(d.tolist()) == list(range(n2))   # bijection
    order = np.argsort(d)
    dx = np.abs(np.diff(x[order])) + np.abs(np.diff(y[order]))
    assert (dx == 1).all()                         # continuity

def test_morton_bijection():
    bits = 4
    x, y = _full_grid(bits)
    d = morton_key(x, y, bits)
    assert sorted(d.tolist()) == list(range(1 << (2 * bits)))


def test_curve_keys_and_spatial_sort_locality():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-170, 170, 400)
    lat = rng.uniform(-80, 80, 400)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(400), pa.int64()),
        "x": lon, "y": lat}))
    out = curve_keys(ds, zoom=16).to_pandas()
    assert set(out.columns) == {"doc_id", "tile_x", "tile_y",
                                "morton", "hilbert"}
    assert out.hilbert.between(0, (1 << 32) - 1).all()

    srt = spatial_sort(
        ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(400), pa.int64()),
            "x": lon, "y": lat})), zoom=16).to_pandas()
    def mean_step(df):
        return (np.abs(np.diff(df.tile_x.to_numpy()))
                + np.abs(np.diff(df.tile_y.to_numpy()))).mean()
    # hilbert order is far more local than insertion order
    assert mean_step(srt) < 0.25 * mean_step(
        out.sort_values("doc_id"))
