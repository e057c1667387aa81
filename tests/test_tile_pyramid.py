"""Hierarchical tile-count pyramid (cells/tiles.pyramid_counts).
Driver gate: the `tile_pyramid` oracle query; here: rollup invariants
on random points."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geoflow.cells.tiles import lonlat_to_tile, pyramid_counts


def _points(n, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({"x": rng.uniform(-179, 179, n),
                     "y": rng.uniform(-84, 84, n)})


def test_pyramid_invariants():
    t = _points(400)
    out = pyramid_counts(ray.data.from_arrow(t)).to_pandas()
    # every zoom level accounts for every point
    for z in (4, 6, 8, 10, 12):
        assert out[out["zoom"] == z]["n_points"].sum() == 400, z
    # parent tile count == sum of its children two levels down
    z12 = out[out["zoom"] == 12]
    z10 = out[out["zoom"] == 10].set_index(["tile_x", "tile_y"])
    child_sum = z12.groupby([z12["tile_x"] // 4,
                             z12["tile_y"] // 4])["n_points"].sum()
    for (px, py), n in child_sum.items():
        assert z10.loc[(px, py), "n_points"] == n
    # base zoom matches direct assignment
    tx, ty = lonlat_to_tile(t.column("x").to_numpy(),
                            t.column("y").to_numpy(), 12)
    direct = len(set(zip(tx.tolist(), ty.tolist())))
    assert len(z12) == direct


def test_pyramid_zoom_validation():
    with pytest.raises(ValueError, match="base_zoom"):
        pyramid_counts(ray.data.from_arrow(_points(5)),
                       base_zoom=8, zooms=(4, 10))
