"""Raster hydrology over the occupied tile lattice: D8 flow
direction, bounded-round flow accumulation, and pointer-jumping
basin (sink) labeling.

The per-tile point COUNT plays the role of elevation (as in the
focal kernels, ops/spatialstats.py): unoccupied neighbors are
elevation 0, i.e. every border tile eventually drains "off-lattice"
(the ocean).  All arithmetic is int64-exact so the outputs hash
identically against the SQL twins.

D8 direction (O'Callaghan & Mark 1984): flow goes to the steepest
DOWNHILL neighbor of the 8, slopes distance-weighted (orthogonal
distance 1, diagonal sqrt(2)).  The comparison is exact via
cross-multiplied squares: for strictly positive drops d,

    slope_a > slope_b  <=>  d_a^2 * dist_b^2 > d_b^2 * dist_a^2

so the ranking key is ``d^2 * w`` with w = 2 for orthogonal and
1 for diagonal neighbors; ties break to the SMALLEST direction code.
Codes run clockwise from east: 1=E 2=SE 3=S 4=SW 5=W 6=NW 7=N 8=NE
(tile_y grows southward on the slippy grid).  A tile with no strictly
positive drop (a pit or interior flat) gets code 0 and points to
itself.

Flow accumulation is the bounded-round upstream-count recursion
(acc_0 = 1; acc_{t+1}[c] = 1 + sum over occupied n flowing into c of
acc_t[n]), i.e. after K rounds acc[c] counts the cells whose flow
path reaches c in at most K steps, c included — the same
bounded-round contract the graph layer uses for kcore/label_prop.
Basin labels use pointer jumping (ptr <- ptr[ptr], the binary-
doubling shape): D doublings resolve flow paths up to 2^D steps;
strict drops make the pointer graph acyclic, so converged cells carry
their true terminal sink.

Scale shape: the lattice is bounded by 4^zoom (65k tiles at the z8
default) — the single point-sized shuffle is the shared
``_tile_counts`` groupby; the iteration rounds are vectorized numpy
over the bounded tile table, never over points.  Reference surface:
jena-geo has no hydrology ops — this is beyond-reference widening in
the raster map-algebra family (SURVEY.md §2 #24).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ops.spatialstats import _neighbor_matrix, _tile_counts

# direction code order (clockwise from east) -> (dx, dy, weight)
_D8_DX = np.array([1, 1, 0, -1, -1, -1, 0, 1], np.int64)
_D8_DY = np.array([0, 1, 1, 1, 0, -1, -1, -1], np.int64)
_D8_W = np.array([2, 1, 2, 1, 2, 1, 2, 1], np.int64)

# _neighbor_matrix column order is (dx,dy) row-major over (-1,0,1)^2:
# NW W SW N C S NE E SE -> our code order E SE S SW W NW N NE
_D8_COLS = np.array([7, 8, 5, 2, 1, 0, 3, 6], np.int64)


def _flow_arrays(keys: np.ndarray, cnts: np.ndarray):
    """(tx, ty, z, code, drop_v, flow_tx, flow_ty) int64 arrays for
    the sorted packed-key tile table."""
    n = len(keys)
    tx, ty, v, _ok = _neighbor_matrix(keys, cnts)
    z = cnts
    if n and int(z.max()) > 2_100_000_000:
        raise ValueError("tile count too large for exact d^2*w "
                         "ranking (needs max_count^2*2 < 2^63)")
    drops = z[:, None] - v[:, _D8_COLS]          # (n, 8)
    rank = np.where(drops > 0, drops * drops * _D8_W[None, :],
                    np.int64(-1))
    best = np.argmax(rank, axis=1)               # first max = min code
    rows = np.arange(n)
    has = rank[rows, best] > 0
    code = np.where(has, best + 1, 0).astype(np.int64)
    drop_v = np.where(has, drops[rows, best], 0).astype(np.int64)
    flow_tx = tx + np.where(has, _D8_DX[best], 0)
    flow_ty = ty + np.where(has, _D8_DY[best], 0)
    return tx, ty, z, code, drop_v, flow_tx, flow_ty


def _empty(cols):
    import ray.data
    return ray.data.from_arrow(pa.table(
        {c: pa.array([], pa.int64()) for c in cols}))


def flow_direction_tiles(ds, x_col: str = "x", y_col: str = "y",
                         zoom: int = 8,
                         max_broadcast_tiles: int = 50_000_000):
    """Per occupied tile: (tile_x, tile_y, z, flow_code, drop_v,
    flow_tx, flow_ty) — D8 steepest-descent direction with exact
    cross-multiplied distance weighting (module docstring)."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    if len(keys) == 0:
        return _empty(["tile_x", "tile_y", "z", "flow_code",
                       "drop_v", "flow_tx", "flow_ty"])
    tx, ty, z, code, drop_v, ftx, fty = _flow_arrays(keys, cnts)
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(tx), "tile_y": pa.array(ty),
        "z": pa.array(z), "flow_code": pa.array(code),
        "drop_v": pa.array(drop_v),
        "flow_tx": pa.array(ftx), "flow_ty": pa.array(fty)}))


def _target_index(keys: np.ndarray, code: np.ndarray,
                  ftx: np.ndarray, fty: np.ndarray):
    """Index of each tile's flow target in the sorted key table, -1
    when the flow leaves the lattice (or code 0 -> self handled by
    the caller).  Negative/overflow-free: lattice coords are bounded
    by 2^zoom << 2^32, and an off-by-one border target packs to a key
    outside the occupied set (ty' = 2^32-1 is never occupied)."""
    n = len(keys)
    tgt_key = ftx * (1 << 32) + fty
    pos = np.searchsorted(keys, tgt_key)
    hit = (pos < n) & (keys[np.minimum(pos, n - 1)] == tgt_key) \
        & (code > 0)
    idx = np.where(hit, np.minimum(pos, n - 1), -1)
    return idx


def flow_accumulation_tiles(ds, x_col: str = "x", y_col: str = "y",
                            zoom: int = 8, rounds: int = 5,
                            max_broadcast_tiles: int = 50_000_000):
    """Bounded-round D8 flow accumulation: (tile_x, tile_y, acc)
    where acc counts cells whose flow path reaches the tile in at
    most ``rounds`` steps (self included)."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    if len(keys) == 0:
        return _empty(["tile_x", "tile_y", "acc"])
    tx, ty, z, code, _d, ftx, fty = _flow_arrays(keys, cnts)
    idx = _target_index(keys, code, ftx, fty)
    src = np.nonzero(idx >= 0)[0]
    dst = idx[src]
    n = len(keys)
    acc = np.ones(n, np.int64)
    for _ in range(rounds):
        nxt = np.ones(n, np.int64)
        np.add.at(nxt, dst, acc[src])
        acc = nxt
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(tx), "tile_y": pa.array(ty),
        "acc": pa.array(acc)}))


def flow_basin_tiles(ds, x_col: str = "x", y_col: str = "y",
                     zoom: int = 8, doublings: int = 3,
                     max_broadcast_tiles: int = 50_000_000):
    """Pointer-jumping basin labels: (tile_x, tile_y, sink_x,
    sink_y) = the tile reached by following D8 pointers for
    2^doublings steps (pits and off-lattice drains point to
    themselves, so converged cells carry their terminal sink)."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    if len(keys) == 0:
        return _empty(["tile_x", "tile_y", "sink_x", "sink_y"])
    tx, ty, z, code, _d, ftx, fty = _flow_arrays(keys, cnts)
    idx = _target_index(keys, code, ftx, fty)
    n = len(keys)
    ptr = np.where(idx >= 0, idx, np.arange(n))
    for _ in range(doublings):
        ptr = ptr[ptr]
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(tx), "tile_y": pa.array(ty),
        "sink_x": pa.array(tx[ptr]), "sink_y": pa.array(ty[ptr])}))
