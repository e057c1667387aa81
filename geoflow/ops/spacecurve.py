"""Space-filling-curve keys over the Web-Mercator tile grid — the
locality-preserving partitioning primitive for 100-TB spatial data.

Why this exists at scale: range-partitioning a point corpus by a
Hilbert (or Morton) key co-locates spatially adjacent records in the
same blocks, so tile aggregations, neighbor joins and kNN probes touch
O(1) partitions instead of all of them. ``spatial_sort`` is the
repartitioning helper (one Ray Data range sort — the single all-to-all
this buys); ``curve_keys`` is the per-batch key kernel (zero shuffle).

Both curves are exact integer bit machines, reproducible in plain SQL:

- Morton (Z-order): bit interleave, key = Σ_b ((x>>b)&1)·4^b·(1)
  + ((y>>b)&1)·4^b·2. Cheap, but has the well-known z-jump seams.
- Hilbert: the classic Wikipedia/Warren xy2d rotation walk (per level
  s = 2^(bits-1) .. 1: d += s²·((3·rx) XOR ry), then flip with
  (n-1-·) and swap when ry==0) — unit-step continuity means block
  boundaries cut O(perimeter) neighbor pairs, the property the sort
  is for. Unrolled per level into a SQL CTE chain by the oracle.

Reference surface: the reference exposes GeoHash/S2/H3 cell keys as
shuffle keys (same role); the curve keys here add the strictly
monotone 1-D ordering those prefix codes lack at mixed precision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cells.tiles import lonlat_to_tile


def morton_key(x, y, bits: int = 16) -> np.ndarray:
    """Interleave ``bits``-bit non-negative ints x (even positions)
    and y (odd positions) → int64 Z-order key."""
    x = np.asarray(x).astype(np.int64)
    y = np.asarray(y).astype(np.int64)
    out = np.zeros(len(x), np.int64)
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def hilbert_key(x, y, bits: int = 16) -> np.ndarray:
    """Hilbert curve distance d of cell (x, y) on the 2^bits grid —
    vectorized xy2d (classic rotation formulation, flips use the FULL
    grid extent n-1 like the published reference code; the SQL oracle
    unrolls the identical levels)."""
    x = np.asarray(x).astype(np.int64).copy()
    y = np.asarray(y).astype(np.int64).copy()
    n1 = (1 << bits) - 1
    d = np.zeros(len(x), np.int64)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate: when ry==0, optionally flip (rx==1), then swap x/y
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, n1 - x, x)
        yf = np.where(flip, n1 - y, y)
        swap = ry == 0
        x = np.where(swap, yf, xf)
        y = np.where(swap, xf, yf)
        s >>= 1
    return d


def curve_keys(ds, x_col: str = "x", y_col: str = "y",
               zoom: int = 16, keep_cols=("doc_id",)):
    """Append (tile_x, tile_y, morton, hilbert) int64 columns computed
    from lon/lat at ``zoom`` — one zero-shuffle map_batches pass."""
    keep = list(keep_cols)

    def assign(batch: pa.Table) -> pa.Table:
        lon = batch.column(x_col).to_numpy(zero_copy_only=False)
        lat = batch.column(y_col).to_numpy(zero_copy_only=False)
        tx, ty = lonlat_to_tile(lon, lat, zoom)
        tx = tx.astype(np.int64)
        ty = ty.astype(np.int64)
        cols = {c: batch.column(c) for c in keep
                if c in batch.schema.names}
        cols["tile_x"] = pa.array(tx, pa.int64())
        cols["tile_y"] = pa.array(ty, pa.int64())
        cols["morton"] = pa.array(morton_key(tx, ty, zoom), pa.int64())
        cols["hilbert"] = pa.array(hilbert_key(tx, ty, zoom),
                                   pa.int64())
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def spatial_sort(ds, x_col: str = "x", y_col: str = "y",
                 zoom: int = 16, curve: str = "hilbert",
                 keep_cols=("doc_id",)):
    """Range-sort the dataset by its space-filling-curve key so block
    boundaries become spatial boundaries (Ray's sort range-partitions:
    downstream per-block tile work is then spatially local). ONE
    all-to-all; everything before and after streams."""
    if curve not in ("hilbert", "morton"):
        raise ValueError("curve must be hilbert|morton")
    return curve_keys(ds, x_col, y_col, zoom, keep_cols).sort(curve)
