"""Flagship pipeline: corpus → extract WKT → parse → cells → spatial join →
z12 tiles → partitioned parquet with lineage (the north-rule headline job).

Stages (all streaming, no mid-pipeline materialization of the corpus):
  1. read corpus (url, warc_ts, html, text, lang) — `html` is projected
     away immediately (wide-row rule, SURVEY §7.4)
  2. ExtractWkt map_batches → (url, geom_idx, wkt, geom_wkb, envelope)
  3. point view + cell/tile assignment (vectorized)
  4. spatial join vs polygon corpus (broadcast STRtree actor pool by
     default; cell-keyed shuffle join when the polygon side is large)
  5. tile assignment for every extracted geometry
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cells import grid, s2, tiles
from ..extract import ExtractWkt
from ..geom.wkb import wkb_to_points


def extract_geoms(corpus_ds):
    """corpus → geoms table; html column dropped before any work."""
    slim = corpus_ds.select_columns(["url", "text"])
    return slim.map_batches(ExtractWkt(), batch_format="pyarrow")


def to_points(geoms_ds):
    """geoms → rows that are 2D points, with x/y + cell + s2 + tile columns
    (single vectorized pass)."""

    def pts(batch: pa.Table) -> pa.Table:
        bufs = batch.column("geom_wkb").to_pylist()
        is_pt = np.array([b is not None and len(b) == 21 for b in bufs])
        rows = np.nonzero(is_pt)[0]
        sub = batch.take(pa.array(rows, type=pa.int64()))
        dec = wkb_to_points([bufs[i] for i in rows])
        if dec is None:
            x = np.empty(0)
            y = np.empty(0)
        else:
            x, y = dec
        cell = grid.lonlat_to_grid(x, y)
        s2c = s2.lonlat_to_cell(x, y, 13)
        tx, ty = tiles.lonlat_to_tile(x, y, 12)
        return (sub.append_column("x", pa.array(x))
                .append_column("y", pa.array(y))
                .append_column("cell", pa.array(cell.view(np.int64)))
                .append_column("s2_13", pa.array(s2c.view(np.int64)))
                .append_column("tile_x", pa.array(tx))
                .append_column("tile_y", pa.array(ty)))

    return geoms_ds.map_batches(pts, batch_format="pyarrow")


def assign_tiles(geoms_ds, zoom: int = 12):
    """Every geometry (point or not) → covering z12 tiles via envelope
    (FIXTURES.md `tiles` table: url, geom_idx, z, x, y)."""

    def cover(batch: pa.Table) -> pa.Table:
        xmin = batch.column("xmin").to_numpy(zero_copy_only=False)
        ymin = batch.column("ymin").to_numpy(zero_copy_only=False)
        xmax = batch.column("xmax").to_numpy(zero_copy_only=False)
        ymax = batch.column("ymax").to_numpy(zero_copy_only=False)
        ok = np.isfinite(xmin)
        rows = np.nonzero(ok)[0]
        ri, tx, ty = tiles.cover_boxes_tiles(xmin[rows], ymin[rows],
                                             xmax[rows], ymax[rows], zoom)
        take = pa.array(rows[ri], type=pa.int64())
        return pa.table({
            "url": batch.column("url").take(take),
            "geom_idx": batch.column("geom_idx").take(take),
            "z": pa.array(np.full(len(ri), zoom, dtype=np.int8)),
            "x": pa.array(tx),
            "y": pa.array(ty),
        })

    return geoms_ds.map_batches(cover, batch_format="pyarrow")


def run_flagship(corpus_ds, polygons_table, out_dir=None, join_mode="broadcast",
                 knn_neighbors=None, concurrency=None):
    """Full pipeline; returns dict of result Datasets (lazy).

    join_mode: 'broadcast' (polygon side ray.put once) or 'cell'
    (groupby-shuffle with salting)."""
    import ray

    from ..join import BroadcastPIPJoin, PolygonIndex, cell_join

    geoms = extract_geoms(corpus_ds)
    points = to_points(geoms)

    if join_mode == "broadcast":
        ref = ray.put(PolygonIndex(polygons_table))
        join = points.map_batches(
            BroadcastPIPJoin, fn_constructor_args=(ref,),
            fn_constructor_kwargs={"x_col": "x", "y_col": "y"},
            batch_format="pyarrow",
            concurrency=concurrency or 4)
    else:
        polys_ds = ray.data.from_arrow(polygons_table)
        join = cell_join(points, polys_ds)

    tile_assign = assign_tiles(geoms)

    out = {"geoms": geoms, "points": points, "join": join,
           "tiles": tile_assign}
    if knn_neighbors is not None:
        from ..join import KnnBroadcast
        nref = ray.put(knn_neighbors)
        out["knn"] = points.map_batches(
            KnnBroadcast, fn_constructor_args=(nref,),
            fn_constructor_kwargs={"k": 5}, batch_format="pyarrow",
            concurrency=concurrency or 4)
    if out_dir is not None:
        join.write_parquet(f"{out_dir}/join")
        tile_assign.write_parquet(f"{out_dir}/tiles")
    return out
