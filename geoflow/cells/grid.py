"""Equirectangular degree-grid cells (uint64) — the engine's default
spatial-join key.

Unlike S2/H3, bbox→cell covering on a lon/lat grid is exact closed-form
floor arithmetic, so the cell-keyed shuffle join provably never misses a
candidate pair. Resolution 7 (the default) uses 0.1°×0.1° cells — area
comparable to H3 res-7 hexes at mid latitudes (north_rule: H3 res-7 /
S2 level-13 cell-keyed shuffles).

Cell id layout: (res:uint8 << 56) | (ix:uint28 << 28) | iy:uint28, where
ix = floor((lon+180)/step), iy = floor((lat+90)/step), step = 36/2^res.
"""

from __future__ import annotations

import numpy as np

DEFAULT_RES = 7


def cell_step(res: int) -> float:
    """Cell edge in degrees: res 7 → 36/2^7 ≈ 0.28°? No: 36/128=0.28125.
    We use step = 36.0 / (1 << res); res 7 = 0.28125°, res 9 = 0.0703°."""
    return 36.0 / (1 << res)


def lonlat_to_grid(lon, lat, res: int = DEFAULT_RES):
    """Vectorized lon/lat → grid cell id."""
    step = cell_step(res)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.floor((lon + 180.0) / step).astype(np.int64)
    iy = np.floor((lat + 90.0) / step).astype(np.int64)
    nx = int(np.ceil(360.0 / step))
    ny = int(np.ceil(180.0 / step))
    ix = np.clip(ix, 0, nx - 1)
    iy = np.clip(iy, 0, ny - 1)
    return ((np.uint64(res) << np.uint64(56))
            | (ix.astype(np.uint64) << np.uint64(28))
            | iy.astype(np.uint64))


def grid_cell_bounds(cell):
    """cell id(s) → (xmin, ymin, xmax, ymax) arrays."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(56)).astype(np.int64)
    ix = ((cell >> np.uint64(28)) & np.uint64((1 << 28) - 1)).astype(np.int64)
    iy = (cell & np.uint64((1 << 28) - 1)).astype(np.int64)
    step = 36.0 / (np.int64(1) << res)
    xmin = ix * step - 180.0
    ymin = iy * step - 90.0
    return xmin, ymin, xmin + step, ymin + step


def cover_boxes(xmin, ymin, xmax, ymax, res: int = DEFAULT_RES):
    """Exact grid covering of bboxes.

    Input: (n,) bbox component arrays. Output: (row_idx, cell_id) COO — one
    output row per (bbox, covered cell). Fully vectorized per bbox-row
    batch: computes per-row cell-count then expands with repeat/cumsum (no
    Python loop over rows).
    """
    step = cell_step(res)
    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    ix0 = np.floor((xmin + 180.0) / step).astype(np.int64)
    ix1 = np.floor((xmax + 180.0) / step).astype(np.int64)
    iy0 = np.floor((ymin + 90.0) / step).astype(np.int64)
    iy1 = np.floor((ymax + 90.0) / step).astype(np.int64)
    nx_cells = ix1 - ix0 + 1
    ny_cells = iy1 - iy0 + 1
    counts = nx_cells * ny_cells
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(xmin), dtype=np.int64), counts)
    # local index within each bbox's cell block
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    lx = local // np.repeat(ny_cells, counts)
    ly = local % np.repeat(ny_cells, counts)
    ix = np.repeat(ix0, counts) + lx
    iy = np.repeat(iy0, counts) + ly
    cells = ((np.uint64(res) << np.uint64(56))
             | (ix.astype(np.uint64) << np.uint64(28))
             | iy.astype(np.uint64))
    return row_idx, cells


def neighbors(cell):
    """8-neighborhood (plus self) of grid cells → (row_idx, cell_id) COO."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(56)).astype(np.int64)
    ix = ((cell >> np.uint64(28)) & np.uint64((1 << 28) - 1)).astype(np.int64)
    iy = (cell & np.uint64((1 << 28) - 1)).astype(np.int64)
    offs = np.array([(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
                     (1, -1), (1, 0), (1, 1)], dtype=np.int64)
    n = len(cell)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), len(offs))
    nix = (ix[:, None] + offs[None, :, 0]).ravel()
    niy = (iy[:, None] + offs[None, :, 1]).ravel()
    nres = np.repeat(res, len(offs))
    step = 36.0 / (np.int64(1) << nres)
    nx = np.ceil(360.0 / step).astype(np.int64)
    nix = nix % nx  # wrap longitude
    valid = (niy >= 0) & (niy < np.ceil(180.0 / step).astype(np.int64))
    cells = ((nres.astype(np.uint64) << np.uint64(56))
             | (nix.astype(np.uint64) << np.uint64(28))
             | niy.astype(np.uint64))
    return row_idx[valid], cells[valid]
