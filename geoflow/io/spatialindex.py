"""Persisted tile-partitioned spatial index over point Datasets —
the geospatial twin of text/invindex.py's build-once/search-many
shape, and the storage-side lever for 100-TB bbox queries: points
are written ONCE as Parquet partitioned by coarse tile bucket
(slippy tiles at ``zoom``), and a bbox query reads ONLY the bucket
directories whose tiles intersect the box (directory pruning), then
applies the exact per-row filter. A query touching 1% of the world
reads ~1% of the bytes; no shuffle, no full scan.

Resumability rides the partitioned layout: each bucket directory is
an independent unit (the repo-wide partitioned-parquet convention).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["build_spatial_index", "bbox_query"]


def build_spatial_index(ds, index_dir: str, x_col: str = "x",
                        y_col: str = "y", zoom: int = 4):
    """Write ``ds`` (point rows) to ``index_dir`` partitioned by the
    packed slippy-tile bucket at ``zoom`` (bucket = tx·2^zoom + ty).
    Returns the bucket column name."""
    from ..cells.tiles import lonlat_to_tile

    side = 1 << zoom

    def assign(b: pa.Table) -> pa.Table:
        x = b.column(x_col).to_numpy(zero_copy_only=False)
        y = b.column(y_col).to_numpy(zero_copy_only=False)
        tx, ty = lonlat_to_tile(x, y, zoom)
        return b.append_column(
            "bucket", pa.array((tx.astype(np.int64) * side
                                + ty.astype(np.int64))))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"])
    return "bucket"


def bbox_query(index_dir: str, x0: float, y0: float, x1: float,
               y1: float, zoom: int = 4, x_col: str = "x",
               y_col: str = "y", columns=None):
    """Dataset of index rows with x_col∈[x0,x1] and y_col∈[y0,y1]
    (inclusive), reading ONLY bucket directories whose tile
    intersects the box. Returns an empty in-memory Dataset when no
    bucket matches."""
    import ray.data

    from ..cells.tiles import lonlat_to_tile

    side = 1 << zoom
    cx = np.array([x0, x1], np.float64)
    cy = np.array([y0, y1], np.float64)
    tx, ty = lonlat_to_tile(cx, cy, zoom)
    tx0, tx1 = int(tx.min()), int(tx.max())
    # tile y grows SOUTH: the north edge (max lat) has the smaller ty
    ty0, ty1 = int(ty.min()), int(ty.max())
    want = set()
    for a in range(tx0, tx1 + 1):
        for b in range(ty0, ty1 + 1):
            want.add(a * side + b)
    # read_parquet accepts directories singly but not in a list —
    # expand matching partition dirs to their parquet files
    # (text/invindex.py convention)
    paths = []
    for d in sorted(os.listdir(index_dir)):
        if not d.startswith("bucket="):
            continue
        try:
            bucket = int(d.split("=", 1)[1])
        except ValueError:
            continue
        if bucket in want:
            full = os.path.join(index_dir, d)
            paths.extend(os.path.join(full, f)
                         for f in sorted(os.listdir(full))
                         if f.endswith(".parquet"))
    if not paths:
        return ray.data.from_arrow(pa.table({
            x_col: pa.array([], pa.float64()),
            y_col: pa.array([], pa.float64())}))
    cols = columns
    if cols is not None:
        cols = list(dict.fromkeys(list(cols) + [x_col, y_col]))
    out = ray.data.read_parquet(paths, columns=cols)

    def exact(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(b.column(x_col), x0),
                    pc.less_equal(b.column(x_col), x1)),
            pc.and_(pc.greater_equal(b.column(y_col), y0),
                    pc.less_equal(b.column(y_col), y1)))
        return b.filter(m)

    return out.map_batches(exact, batch_format="pyarrow")
