"""Focal slope / peaks / morphology over the occupied tile lattice
(geoflow/ops/spatialstats.py focal_slope_tiles / tile_peaks /
tile_morphology): hand grids + brute-force cross-checks."""
import numpy as np
import pyarrow as pa
import ray.data

from geoflow.cells.tiles import tile_bounds
from geoflow.ops.spatialstats import (focal_slope_tiles, tile_morphology,
                                      tile_peaks)


def _tile_center(tx, ty, z):
    x0, y0, x1, y1 = tile_bounds(np.asarray([tx]), np.asarray([ty]), z)
    return (x0[0] + x1[0]) / 2, (y0[0] + y1[0]) / 2


def _points_at_tiles(counts, z=8):
    xs, ys = [], []
    for (tx, ty), n in counts.items():
        cx, cy = _tile_center(tx, ty, z)
        xs.extend([cx] * n)
        ys.extend([cy] * n)
    return ray.data.from_arrow(pa.table({
        "x": pa.array(xs, pa.float64()),
        "y": pa.array(ys, pa.float64())}))


def _brute_slope(counts):
    out = {}
    for (tx, ty) in counts:
        gx = gy = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                c = counts.get((tx + dx, ty + dy), 0)
                gx += dx * (2 - abs(dy)) * c
                gy += dy * (2 - abs(dx)) * c
        ax, ay = abs(gx), abs(gy)
        if gx == 0 and gy == 0:
            a = 0
        elif ax > ay:
            a = 1 if gx > 0 else 2
        elif ay > ax:
            a = 3 if gy > 0 else 4
        else:
            a = {(1, 1): 5, (1, -1): 6, (-1, 1): 7, (-1, -1): 8}[
                (1 if gx > 0 else -1, 1 if gy > 0 else -1)]
        out[(tx, ty)] = (gx, gy, gx * gx + gy * gy, a)
    return out


def test_focal_slope_single_tile_flat(ray_session):
    # an isolated tile: all neighbors zero -> gradients cancel? no:
    # the CENTER has weight 0 in Horn, neighbors are all 0 -> flat.
    df = focal_slope_tiles(_points_at_tiles({(100, 100): 7})).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert (r.gx, r.gy, r.slope_sq, r.aspect_class) == (0, 0, 0, 0)


def test_focal_slope_step_east(ray_session):
    # column of high counts at tx=101, low at tx=100: gradient +x
    counts = {(100, 100 + d): 1 for d in (-1, 0, 1)}
    counts.update({(101, 100 + d): 5 for d in (-1, 0, 1)})
    df = focal_slope_tiles(_points_at_tiles(counts)).to_pandas()
    got = {(r.tile_x, r.tile_y): (r.gx, r.gy, r.slope_sq, r.aspect_class)
           for r in df.itertuples()}
    assert got == _brute_slope(counts)
    # the center-west tile sees the full 1-2-1 rise to its east
    assert got[(100, 100)][3] == 1                 # aspect +x


def test_focal_slope_brute_random(ray_session):
    rng = np.random.default_rng(7)
    counts = {}
    for _ in range(40):
        counts[(int(rng.integers(50, 60)), int(rng.integers(50, 60)))] = \
            int(rng.integers(1, 9))
    df = focal_slope_tiles(_points_at_tiles(counts)).to_pandas()
    got = {(r.tile_x, r.tile_y): (r.gx, r.gy, r.slope_sq, r.aspect_class)
           for r in df.itertuples()}
    assert got == _brute_slope(counts)


def test_tile_peaks_hand(ray_session):
    counts = {(10, 10): 5, (11, 10): 3, (10, 11): 3, (12, 12): 2,
              (30, 30): 1}
    df = tile_peaks(_points_at_tiles(counts)).to_pandas()
    got = {(r.tile_x, r.tile_y): r for r in df.itertuples()}
    # (10,10): neighbors (11,10) c3, (10,11) c3, (11,11)? not occupied
    r = got[(10, 10)]
    assert (r.c, r.n_neighbors, r.n_ge, r.n_le) == (5, 2, 0, 2)
    assert (r.is_peak, r.is_pit) == (1, 0)
    # (12,12) has one neighbor (11,11)? none — (11,10)/(10,11) are
    # Chebyshev 2 away; only (11,11) would be adjacent. It has ZERO
    # occupied neighbors -> both peak and pit (isolated).
    r = got[(12, 12)]
    assert (r.n_neighbors, r.is_peak, r.is_pit) == (0, 1, 1)
    # (11,10) neighbors: (10,10) c5, (10,11) c3 (diagonal) -> n_ge=2
    r = got[(11, 10)]
    assert (r.n_neighbors, r.n_ge, r.n_le) == (2, 2, 1)
    assert (r.is_peak, r.is_pit) == (0, 0)


def test_tile_morphology_hand(ray_session):
    # 3x3 fully-occupied block: center erodes, everything else not;
    # dilation adds the surrounding ring (5x5 = 25 rows total)
    counts = {(100 + dx, 100 + dy): 1
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)}
    df = tile_morphology(_points_at_tiles(counts)).to_pandas()
    assert len(df) == 25
    got = {(r.tile_x, r.tile_y): r for r in df.itertuples()}
    assert got[(100, 100)].eroded == 1
    assert got[(100, 100)].n_occ_neighbors == 8
    assert sum(r.eroded for r in got.values()) == 1
    assert sum(r.occupied for r in got.values()) == 9
    # a dilation-ring corner sees exactly 1 occupied neighbor
    assert got[(98, 98)].occupied == 0
    assert got[(98, 98)].n_occ_neighbors == 1


def test_tile_morphology_border_clip(ray_session):
    # tile at the lattice corner (0,0): dilation must not emit
    # out-of-range tiles
    df = tile_morphology(_points_at_tiles({(0, 0): 2})).to_pandas()
    assert set(zip(df.tile_x, df.tile_y)) == {(0, 0), (0, 1), (1, 0),
                                              (1, 1)}
    got = {(r.tile_x, r.tile_y): r for r in df.itertuples()}
    assert got[(0, 0)].occupied == 1 and got[(0, 0)].eroded == 0


def test_focal_smooth_hand_grid():
    from geoflow.ops.spatialstats import focal_smooth_tiles
    counts = {(100, 100): 4, (101, 100): 2, (102, 102): 1}
    ds = _points_at_tiles(counts)
    rows = {(r["tile_x"], r["tile_y"]): (r["smooth"], r["wsum"])
            for r in focal_smooth_tiles(ds, zoom=8,
                                        radius=2).take_all()}
    # (100,100): self 9*4 + (101,100) d=(1,0) w=6 -> 12 + (102,102)
    # d=(2,2) w=1 -> 1; wsum 9+6+1
    assert rows[(100, 100)] == (36 + 12 + 1, 16)
    # (102,102): self 9*1 + (101,100) d=(-1,-2) w=2 -> 4 + (100,100)
    # d=(-2,-2) w=1 -> 4; wsum 9+2+1
    assert rows[(102, 102)] == (9 + 4 + 4, 12)


def test_tile_rank_equalize_hand_grid():
    from geoflow.ops.spatialstats import tile_rank_equalize
    counts = {(10, 10): 5, (11, 10): 2, (12, 10): 5, (13, 10): 9}
    ds = _points_at_tiles(counts)
    rows = {(r["tile_x"], r["tile_y"]):
            (r["rnk"], r["n_levels"], r["n_darker"])
            for r in tile_rank_equalize(ds, zoom=8).take_all()}
    assert rows[(11, 10)] == (1, 3, 0)
    assert rows[(10, 10)] == (2, 3, 1)
    assert rows[(12, 10)] == (2, 3, 1)
    assert rows[(13, 10)] == (3, 3, 3)
