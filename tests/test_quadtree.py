"""Adaptive quadtree aggregation (spatialstats.quadtree_cells)."""
import numpy as np
import pyarrow as pa
import ray.data

from geoflow.cells.tiles import tile_bounds
from geoflow.ops.spatialstats import quadtree_cells


def _center(tx, ty, z):
    x0, y0, x1, y1 = tile_bounds(np.asarray([tx]), np.asarray([ty]), z)
    return (x0[0] + x1[0]) / 2, (y0[0] + y1[0]) / 2


def _pts(counts, z=8):
    xs, ys = [], []
    for (tx, ty), n in counts.items():
        cx, cy = _center(tx, ty, z)
        xs.extend([cx] * n)
        ys.extend([cy] * n)
    return ray.data.from_arrow(pa.table({
        "x": pa.array(xs, pa.float64()),
        "y": pa.array(ys, pa.float64())}))


def test_quadtree_levels(ray_session):
    # z8 tiles (0..15 x, 0..15 y) all live under z4 cell (0,0)
    # (16x16 z8 tiles per z4 cell). Cluster A: 10 points in one z8
    # tile under z4 (0,0) -> that z4 cell is over threshold 3;
    # its z6 cell (0,0) also over -> forced to z8.
    # Cluster B: 2 points in a far z8 tile (240,240) -> its z4 cell
    # (15,15) holds only these -> assigned at z4.
    counts = {(5, 5): 10, (240, 240): 2}
    df = quadtree_cells(_pts(counts), zooms=(4, 6, 8),
                        threshold=3).to_pandas()
    rows = {(r.z, r.tile_x, r.tile_y): r.n_pts for r in df.itertuples()}
    assert rows == {(8, 5, 5): 10, (4, 15, 15): 2}


def test_quadtree_mid_level(ray_session):
    # 3 points spread over three z8 tiles of ONE z6 cell, plus 4
    # points in another z6 cell of the SAME z4 cell: the z4 count is
    # 7 (> 3), first z6 cell count 3 (<= 3) -> z6; second z6 cell
    # count 4 (> 3) -> its tiles fall to z8.
    counts = {(0, 0): 1, (1, 1): 1, (2, 2): 1,       # z6 cell (0,0)
              (4, 4): 2, (5, 5): 2}                  # z6 cell (1,1)
    df = quadtree_cells(_pts(counts), zooms=(4, 6, 8),
                        threshold=3).to_pandas()
    rows = {(r.z, r.tile_x, r.tile_y): r.n_pts for r in df.itertuples()}
    assert rows == {(6, 0, 0): 3, (8, 4, 4): 2, (8, 5, 5): 2}
    # conservation: every point lands in exactly one cell
    assert df.n_pts.sum() == sum(counts.values())
