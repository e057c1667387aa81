"""Pipeline-builder API — the engine's replacement for the reference's
SPARQL → ARQ algebra surface (SURVEY.md §3.4):

    Pipeline([ExtractGeoms(), CellIndex(h3=7),
              SpatialJoin(pred="intersects", right=polys),
              TileAssign(z=12)]).compile(corpus_ds)

Each Stage maps a `ray.data.Dataset` to a `ray.data.Dataset`; `compile`
folds the stage list into ONE lazy Dataset chain — nothing executes
until the caller consumes it, so the streaming executor schedules and
pipelines every stage together (no query language, no mid-pipeline
materialization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class Stage:
    """A Dataset → Dataset transform with a readable repr."""

    def apply(self, ds):
        raise NotImplementedError

    def __repr__(self):
        args = ", ".join(f"{k}={v!r}" for k, v in vars(self).items()
                         if not k.startswith("_"))
        return f"{type(self).__name__}({args})"


class ExtractGeoms(Stage):
    """Corpus (url, text, …) → extracted geometry rows (url, geom_idx,
    wkt, geom_wkb); the wide html column never leaves the read."""

    def apply(self, ds):
        from .flagship import extract_geoms
        return extract_geoms(ds)


class ToPoints(Stage):
    """Keep 2D-point rows and add x/y columns (vectorized WKB decode)."""

    def apply(self, ds):
        from .flagship import to_points
        return to_points(ds)


class CellIndex(Stage):
    """Add cell-id columns: h3=<res> → `h3_<res>`, s2=<level> →
    `s2_<level>`, grid=<res> → `cell`. Requires x/y columns (ToPoints
    runs implicitly when geom_wkb is present but x/y are not)."""

    def __init__(self, h3=None, s2=None, grid=None):
        self.h3 = h3
        self.s2 = s2
        self.grid = grid

    def apply(self, ds):
        h3_res, s2_lvl, grid_res = self.h3, self.s2, self.grid

        def assign(batch: pa.Table) -> pa.Table:
            x = batch.column("x").to_numpy(zero_copy_only=False)
            y = batch.column("y").to_numpy(zero_copy_only=False)
            out = batch
            if h3_res is not None:
                from ..cells import h3 as h3mod
                c = h3mod.lonlat_to_cell(x, y, h3_res)
                out = out.append_column(f"h3_{h3_res}",
                                        pa.array(c.view(np.int64)))
            if s2_lvl is not None:
                from ..cells import s2 as s2mod
                c = s2mod.lonlat_to_cell(x, y, s2_lvl)
                out = out.append_column(f"s2_{s2_lvl}",
                                        pa.array(c.view(np.int64)))
            if grid_res is not None:
                from ..cells import grid as gridmod
                c = gridmod.lonlat_to_grid(x, y, grid_res)
                out = out.append_column("cell",
                                        pa.array(c.view(np.int64)))
            return out

        if "x" not in ds.schema().names:
            ds = ToPoints().apply(ds)
        return ds.map_batches(assign, batch_format="pyarrow")


class SpatialJoin(Stage):
    """Point-in-polygon join against a polygon table (poly_id,
    geom_wkb). mode='broadcast' ships the STRtree index once via
    ray.put (small side); mode='cell' runs the cell-keyed shuffle join
    (large side)."""

    def __init__(self, right, pred="intersects", mode="broadcast",
                 keep_cols=("url", "geom_idx")):
        self.right = right
        self.pred = pred
        self.mode = mode
        self.keep_cols = tuple(keep_cols)

    def apply(self, ds):
        if "x" not in ds.schema().names:
            ds = ToPoints().apply(ds)
        if self.mode == "cell":
            from ..join.celljoin import cell_join
            import ray.data
            right_ds = self.right if not isinstance(self.right, pa.Table) \
                else ray.data.from_arrow(self.right)
            return cell_join(ds, right_ds, keep_cols=self.keep_cols)
        import ray
        from ..join import BroadcastPIPJoin, PolygonIndex
        if isinstance(self.right, pa.Table):
            right_tbl = self.right
        else:   # small polygon side as a Dataset: collect it once
            right_tbl = pa.concat_tables(
                ray.get(self.right.to_arrow_refs()))
        idx_ref = ray.put(PolygonIndex(right_tbl))
        # carry x/y through the join so downstream stages (TileAssign,
        # CellIndex) keep working on the joined rows
        out_cols = tuple(dict.fromkeys(self.keep_cols + ("x", "y")))
        return ds.map_batches(
            BroadcastPIPJoin, fn_constructor_args=(idx_ref,),
            fn_constructor_kwargs={"predicate": self.pred,
                                   "x_col": "x", "y_col": "y",
                                   "out_cols": out_cols},
            batch_format="pyarrow", concurrency=2)


class TileAssign(Stage):
    """Add slippy-map tile columns tile_x/tile_y at zoom z."""

    def __init__(self, z=12):
        self.z = z

    def apply(self, ds):
        z = self.z

        def assign(batch: pa.Table) -> pa.Table:
            from ..cells import tiles
            x = batch.column("x").to_numpy(zero_copy_only=False)
            y = batch.column("y").to_numpy(zero_copy_only=False)
            tx, ty = tiles.lonlat_to_tile(x, y, z)
            out = batch
            for name, arr in (("tile_x", tx), ("tile_y", ty)):
                if name in out.schema.names:
                    out = out.drop_columns([name])
                out = out.append_column(name,
                                        pa.array(arr.astype(np.int64)))
            return out

        if "x" not in ds.schema().names:
            ds = ToPoints().apply(ds)
        return ds.map_batches(assign, batch_format="pyarrow")


class ApplyOp(Stage):
    """Run a registry op over WKB column(s): ApplyOp('st_area',
    in_cols=('geom_wkb',), out_col='area'). Extra op arguments go in
    `args`."""

    def __init__(self, op, in_cols=("geom_wkb",), out_col=None, args=()):
        self.op = op
        self.in_cols = tuple(in_cols)
        self.out_col = out_col or self.op
        self.args = tuple(args)

    def apply(self, ds):
        op_name, in_cols, out_col, extra = (self.op, self.in_cols,
                                            self.out_col, self.args)

        def run(batch: pa.Table) -> pa.Table:
            from ..ops import get_op
            cols = [batch.column(c) for c in in_cols]
            res = get_op(op_name).fn(*cols, *extra)
            if out_col in batch.schema.names:
                batch = batch.drop_columns([out_col])
            return batch.append_column(out_col, res)

        return ds.map_batches(run, batch_format="pyarrow")


class FilterBatch(Stage):
    """Vectorized row filter: fn(batch: pa.Table) -> bool ndarray."""

    def __init__(self, fn):
        self._fn = fn

    def apply(self, ds):
        fn = self._fn

        def filt(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.array(np.asarray(fn(batch), dtype=bool)))

        return ds.map_batches(filt, batch_format="pyarrow")


class DedupExact(Stage):
    """Exact text dedup (broadcast-winner shape — see text/dedup.py)."""

    def __init__(self, text_col="text", key_col="doc_id"):
        self.text_col = text_col
        self.key_col = key_col

    def apply(self, ds):
        from ..text.dedup import exact_dedup
        return exact_dedup(ds, text_col=self.text_col, key_col=self.key_col)


class WriteParquet(Stage):
    """Terminal sink: partitioned parquet (resumable layout is the
    jobs/run_pipeline.py surface; this stage is the plain Dataset
    writer)."""

    def __init__(self, path):
        self.path = path

    def apply(self, ds):
        ds.write_parquet(self.path)
        return ds


class Pipeline:
    """Ordered stage list compiled onto a Dataset — lazy end to end."""

    def __init__(self, stages):
        self.stages = list(stages)

    def compile(self, ds):
        for s in self.stages:
            ds = s.apply(ds)
        return ds

    run = compile

    def __repr__(self):
        inner = ", ".join(repr(s) for s in self.stages)
        return f"Pipeline([{inner}])"
