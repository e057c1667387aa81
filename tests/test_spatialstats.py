"""Moran's I over tile counts (ops/spatialstats.py). Driver gate: the
`morans_i` oracle query; here: sign/semantics on planted patterns and
a brute-force check."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geoflow.cells.tiles import lonlat_to_tile, tile_bounds
from geoflow.ops.spatialstats import morans_i_tiles


def _tile_center(tx, ty, z):
    # tile_bounds returns (lon0, lat0, lon1, lat1)
    x0, y0, x1, y1 = tile_bounds(np.asarray([tx]), np.asarray([ty]), z)
    return (x0[0] + x1[0]) / 2, (y0[0] + y1[0]) / 2


def _points_at_tiles(counts, z=8):
    """counts: dict (tx, ty) -> n. Place n points at each tile center."""
    xs, ys = [], []
    for (tx, ty), n in counts.items():
        cx, cy = _tile_center(tx, ty, z)
        xs.extend([cx] * n)
        ys.extend([cy] * n)
    return pa.table({"x": pa.array(xs, pa.float64()),
                     "y": pa.array(ys, pa.float64())})


def _run(counts, z=8):
    t = _points_at_tiles(counts, z)
    out = morans_i_tiles(ray.data.from_arrow(t), zoom=z).to_pandas()
    return out.iloc[0]


def _brute(counts):
    ks = sorted(counts)
    n = len(ks)
    s = sum(counts.values())
    dev = {k: n * counts[k] - s for k in ks}
    num = w = 0
    for (tx, ty) in ks:
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (tx + dx, ty + dy)
            if nb in counts:
                w += 1
                num += dev[(tx, ty)] * dev[nb]
    den = sum(v * v for v in dev.values())
    return n, w, num, den


def test_clustered_pattern_positive_i():
    # two separated 2x2 blobs: high next to high, low next to low
    counts = {(10, 10): 9, (11, 10): 9, (10, 11): 9, (11, 11): 9,
              (40, 40): 1, (41, 40): 1, (40, 41): 1, (41, 41): 1}
    row = _run(counts)
    n, w, num, den = _brute(counts)
    assert (row["n_tiles"], row["w_pairs"]) == (n, w)
    assert (row["moran_num"], row["moran_den"]) == (num, den)
    assert row["moran_i"] > 0.9


def test_checkerboard_negative_i():
    counts = {(x, y): (9 if (x + y) % 2 == 0 else 1)
              for x in range(20, 24) for y in range(20, 24)}
    row = _run(counts)
    n, w, num, den = _brute(counts)
    assert (row["moran_num"], row["moran_den"]) == (num, den)
    assert row["moran_i"] < -0.9


def test_constant_field_zero():
    counts = {(x, y): 5 for x in range(30, 33) for y in range(30, 33)}
    row = _run(counts)
    assert row["moran_den"] == 0 and row["moran_i"] == 0.0


def test_tile_cap_guard():
    counts = {(10, 10): 3, (11, 10): 1}
    t = _points_at_tiles(counts)
    with pytest.raises(ValueError, match="max_broadcast_tiles"):
        morans_i_tiles(ray.data.from_arrow(t), zoom=8,
                       max_broadcast_tiles=1)


def test_getis_ord_local_sums():
    from geoflow.ops.spatialstats import getis_ord_tiles
    counts = {(10, 10): 5, (11, 10): 3, (11, 11): 2, (30, 30): 7}
    t = _points_at_tiles(counts)
    out = getis_ord_tiles(ray.data.from_arrow(t),
                          zoom=8).to_pandas().set_index(
        ["tile_x", "tile_y"])
    # (10,10): neighbors (11,10),(11,11) -> local 5+3+2, w=3
    assert out.loc[(10, 10), "local_sum"] == 10
    assert out.loc[(10, 10), "w_i"] == 3
    # isolated hot tile: only itself
    assert out.loc[(30, 30), "local_sum"] == 7
    assert out.loc[(30, 30), "w_i"] == 1
    assert (out["n_tiles"] == 4).all() and (out["total"] == 17).all()


def test_idw_tiles_hand_grid():
    from geoflow.ops.spatialstats import idw_tiles
    import geoflow.cells.tiles as tiles
    # three occupied tiles at known z8 positions: place points at tile
    # centers via tile_bounds midpoints
    def center(tx, ty):
        lon0, lat0, lon1, lat1 = tiles.tile_bounds(
            np.array([tx]), np.array([ty]), 8)
        return (lon0[0] + lon1[0]) / 2, (lat0[0] + lat1[0]) / 2
    pts = []
    # (100,100)x2 points, (101,100)x1, (103,100)x5 (out of radius-2 of
    # (100,100)? dx=3 -> excluded from its sum, included for (101,100))
    for tx, ty, k in [(100, 100, 2), (101, 100, 1), (103, 100, 5)]:
        lon, lat = center(tx, ty)
        pts += [(lon, lat)] * k
    ds = ray.data.from_arrow(pa.table({
        "x": np.array([p[0] for p in pts]),
        "y": np.array([p[1] for p in pts])}))
    out = idw_tiles(ds, zoom=8, radius=2).to_pandas()
    got = {(r.tile_x, r.tile_y): (r.n_points, r.idw_num, r.idw_den)
           for r in out.itertuples()}
    w1 = 65536 // 1
    w4 = 65536 // 4
    # (100,100): neighbor (101,100) d2=1 only -> num=1*w1 den=w1
    assert got[(100, 100)] == (2, 1 * w1, w1)
    # (101,100): (100,100) d2=1 c=2 ; (103,100) d2=4 c=5
    assert got[(101, 100)] == (1, 2 * w1 + 5 * w4, w1 + w4)
    # (103,100): (101,100) d2=4 c=1
    assert got[(103, 100)] == (5, 1 * w4, w4)


def test_idw_tiles_isolated_tile_omitted():
    from geoflow.ops.spatialstats import idw_tiles
    ds = ray.data.from_arrow(pa.table({
        "x": np.array([0.0, 50.0]), "y": np.array([0.0, 40.0])}))
    out = idw_tiles(ds, zoom=8, radius=2).to_pandas()
    assert len(out) == 0


def test_ripley_pair_counts_cross_cell(ray_session):
    import ray

    from geoflow.ops.spatialstats import ripley_pair_counts

    # max radius 10 -> cell 10. Points 9 and 11 straddle a cell
    # border 2 apart (the ghost-zone must co-locate them exactly
    # once per direction); 30 is isolated; 9 & 9 duplicate coords of
    # DISTINCT ids must count (id-based self-exclusion, not d2==0).
    pts = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "cx": pa.array([9, 11, 30, 9], pa.int64()),
        "cy": pa.array([0, 0, 0, 0], pa.int64())})
    out = ripley_pair_counts(ray.data.from_arrow(pts), [1, 10]) \
        .to_pandas().sort_values("r")
    assert out.n_points.tolist() == [4, 4]
    # r=1: (1,4) dup-coord pair both directions = 2
    # r=10: add (1,2),(2,1),(2,4),(4,2) -> 6
    assert out.n_pairs.tolist() == [2, 6]
