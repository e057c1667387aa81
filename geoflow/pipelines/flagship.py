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

    # large batches: per-task overhead (driver scheduling + actor RPC)
    # dwarfs the vectorized work at the default 1024-row batch size
    return geoms_ds.map_batches(pts, batch_format="pyarrow",
                                batch_size=32768)


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

    return geoms_ds.map_batches(cover, batch_format="pyarrow",
                                batch_size=32768)


class FusedJoinTiles:
    """Single-pass actor stage: geometry rows → join rows + z12 tile rows
    in one union-schema output (kind='join' | 'tile').

    The scale-friendly shape of the flagship job: ONE streaming pass over
    the extracted geometries, no materialize barrier, no per-branch
    re-execution; downstream writes partition by `kind`."""

    def __init__(self, index_ref, zoom: int = 12):
        import ray

        from ..join.broadcast import PolygonIndex
        self.idx = index_ref if isinstance(index_ref, PolygonIndex) \
            else ray.get(index_ref)
        self.tree = self.idx.build_tree()  # once per actor
        self.zoom = zoom

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geom.pip import pip_pairs
        bufs = batch.column("geom_wkb").to_pylist()
        xmin = batch.column("xmin").to_numpy(zero_copy_only=False)
        ymin = batch.column("ymin").to_numpy(zero_copy_only=False)
        xmax = batch.column("xmax").to_numpy(zero_copy_only=False)
        ymax = batch.column("ymax").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        # --- tile covering for every geometry (vectorized) ---
        ok = np.isfinite(xmin)
        rows = np.nonzero(ok)[0]
        ri, tx, ty = tiles.cover_boxes_tiles(xmin[rows], ymin[rows],
                                             xmax[rows], ymax[rows],
                                             self.zoom)
        tile_take = rows[ri]
        # --- point probe against the broadcast polygon index ---
        is_pt = np.array([b is not None and len(b) == 21 for b in bufs])
        pt_rows = np.nonzero(is_pt)[0]
        dec = wkb_to_points([bufs[i] for i in pt_rows])
        if dec is not None and len(pt_rows):
            px, py = dec
            pi, poly_i = self.tree.query_points(px, py)
            keep = pip_pairs(px, py, pi, poly_i, self.idx.csr)
            join_take = pt_rows[pi[keep]]
            join_poly = self.idx.ids[poly_i[keep]]
        else:
            join_take = np.empty(0, dtype=np.int64)
            join_poly = np.empty(0, dtype=np.int64)
        # --- union output ---
        # url/kind are dictionary-encoded: the tile expansion multiplies
        # row count ~10x, and copying the url strings per output row was
        # the pipeline's dominant memory traffic — indices into the
        # batch's url array cost 4 bytes/row instead
        nt, nj = len(tile_take), len(join_take)
        take = np.concatenate([tile_take, join_take]).astype(np.int32)
        url_dict = batch.column("url")
        if isinstance(url_dict, pa.ChunkedArray):
            url_dict = url_dict.combine_chunks()
        kind_idx = np.concatenate([np.zeros(nt, dtype=np.int8),
                                   np.ones(nj, dtype=np.int8)])
        return pa.table({
            "kind": pa.DictionaryArray.from_arrays(
                pa.array(kind_idx), pa.array(["tile", "join"])),
            "url": pa.DictionaryArray.from_arrays(pa.array(take), url_dict),
            "geom_idx": batch.column("geom_idx").take(
                pa.array(take, type=pa.int64())),
            "z": pa.array(np.concatenate(
                [np.full(nt, self.zoom, dtype=np.int8),
                 np.zeros(nj, dtype=np.int8)])),
            "x": pa.array(np.concatenate(
                [tx.astype(np.int32), np.zeros(nj, dtype=np.int32)])),
            "y": pa.array(np.concatenate(
                [ty.astype(np.int32), np.zeros(nj, dtype=np.int32)])),
            "poly_id": pa.array(np.concatenate(
                [np.full(nt, -1, dtype=np.int64), join_poly])),
        })


# per-worker-process cache of the fused stage (keyed by object ref):
# worker processes persist across tasks, so a task-pool stage amortizes the
# index load exactly like an actor pool — without paying actor-pool
# startup/autoscaling lag on every execution
_FUSED_CACHE: dict = {}


def _fused_stage(batch: pa.Table, index_ref, zoom: int) -> pa.Table:
    key = index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref)
    stage = _FUSED_CACHE.get(key)
    if stage is None:
        stage = FusedJoinTiles(index_ref, zoom)
        _FUSED_CACHE.clear()
        _FUSED_CACHE[key] = stage
    return stage(batch)


def run_flagship_fused(corpus_ds, polygons_table, concurrency=None,
                       zoom: int = 12):
    """Streaming single-pass flagship: corpus → extract → fused
    join+tiles. Returns one Dataset (kind column distinguishes outputs).

    Task-pool stage (concurrency is ignored; Ray schedules on every CPU)
    with the polygon index broadcast via ray.put and cached per worker
    process."""
    import functools

    import ray

    from ..join import PolygonIndex

    geoms = extract_geoms(corpus_ds)
    ref = ray.put(PolygonIndex(polygons_table))
    return geoms.map_batches(
        functools.partial(_fused_stage, index_ref=ref, zoom=zoom),
        batch_format="pyarrow", batch_size=32768)


def run_flagship(corpus_ds, polygons_table, out_dir=None, join_mode="broadcast",
                 knn_neighbors=None, concurrency=None,
                 share_extract=False):
    """Full pipeline; returns dict of result Datasets (lazy).

    join_mode: 'broadcast' (polygon side ray.put once) or 'cell'
    (groupby-shuffle with salting).

    share_extract=True materializes the extracted-geometry stage once so
    the join branch and the tile branch don't each re-execute the corpus
    read + extraction (Ray Datasets re-run lineage per consumer). The
    materialized table is envelope+WKB only — tiny next to the corpus."""
    import ray

    from ..join import BroadcastPIPJoin, PolygonIndex, cell_join

    geoms = extract_geoms(corpus_ds)
    if share_extract:
        geoms = geoms.materialize()
    points = to_points(geoms)

    if join_mode == "broadcast":
        ref = ray.put(PolygonIndex(polygons_table))
        join = points.map_batches(
            BroadcastPIPJoin, fn_constructor_args=(ref,),
            fn_constructor_kwargs={"x_col": "x", "y_col": "y"},
            batch_format="pyarrow", batch_size=32768,
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
