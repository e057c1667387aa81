"""Cell-keyed shuffle spatial join (the scale path of the north rule).

Both sides are keyed by grid cells (exact bbox covering — no candidate
pair can be missed, see cells/grid.py), unioned into one Dataset and
shuffled ONCE with `groupby(cell).map_groups(refine)`; refinement builds a
per-group STRtree over the polygon rows and runs vectorized PIP.

Dedup: a point belongs to exactly one cell, so point×polygon pairs are
emitted exactly once — no second dedup shuffle. (Polygon×polygon joins
would use the reference-cell rule; not needed for the point probe side.)

Skew: hot cells (dense urban areas — north_rule) are salted. A cheap
pre-pass `groupby(cell).count()` on the build side finds cells whose
polygon count exceeds `hot_threshold`; those cells' POINT rows are split
across `n_salt` subkeys while the POLYGON rows are replicated to every
subkey, bounding the largest group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cells import grid
from ..geom import STRtree, algorithms as alg, from_wkb


def _keep_types(ds, keep_cols) -> dict:
    """Arrow type of each keep column, from the point-side schema."""
    schema = ds.schema()
    types = {}
    for name, typ in zip(schema.names, schema.types):
        if name in keep_cols:
            types[name] = typ
    for c in keep_cols:
        types.setdefault(c, pa.string())
    return types


def prepare_point_side(ds, x_col="x", y_col="y", res=grid.DEFAULT_RES,
                       keep_cols=("url", "geom_idx")):
    """points Dataset → (cell, side=0, keep..., x, y) rows."""
    keep = tuple(keep_cols)

    def assign(batch: pa.Table) -> pa.Table:
        px = batch.column(x_col).to_numpy(zero_copy_only=False)
        py = batch.column(y_col).to_numpy(zero_copy_only=False)
        cells = grid.lonlat_to_grid(px, py, res)
        cols = {"cell": pa.array(cells.view(np.int64)),
                "side": pa.array(np.zeros(len(px), dtype=np.int8)),
                "x": pa.array(px), "y": pa.array(py),
                "poly_id": pa.nulls(len(px), type=pa.int64()),
                "geom_wkb": pa.nulls(len(px), type=pa.binary())}
        for c in keep:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def prepare_polygon_side(ds, wkb_col="geom_wkb", id_col="poly_id",
                         res=grid.DEFAULT_RES, keep_cols=("url", "geom_idx"),
                         keep_types=None):
    """polygons Dataset → one row per (covering cell, polygon)."""
    keep = tuple(keep_cols)
    keep_types = keep_types or {}

    def cover(batch: pa.Table) -> pa.Table:
        from ..geom.wkb import wkb_bounds
        boxes = wkb_bounds(batch.column(wkb_col).to_pylist())
        valid = np.isfinite(boxes[:, 0])
        vidx = np.nonzero(valid)[0]
        ri, cells = grid.cover_boxes(boxes[vidx, 0], boxes[vidx, 1],
                                     boxes[vidx, 2], boxes[vidx, 3], res)
        rows = vidx[ri]
        take = pa.array(rows, type=pa.int64())
        n = len(rows)
        cols = {"cell": pa.array(cells.view(np.int64)),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "x": pa.nulls(n, type=pa.float64()),
                "y": pa.nulls(n, type=pa.float64()),
                "poly_id": batch.column(id_col).take(take),
                "geom_wkb": batch.column(wkb_col).take(take)}
        for c in keep:
            cols[c] = pa.nulls(n, type=keep_types.get(c, pa.string()))
        return pa.table(cols)

    return ds.map_batches(cover, batch_format="pyarrow")


def find_hot_cells(poly_side_ds, hot_threshold: int) -> dict:
    """Pre-pass: polygon count per cell → {cell: count} above threshold.
    The result is tiny (only hot cells) and is broadcast to the salting
    stage."""
    counts = poly_side_ds.groupby("cell").count()
    hot = {}
    for batch in counts.iter_batches(batch_format="pyarrow"):
        cells = batch.column("cell").to_numpy(zero_copy_only=False)
        cnt = batch.column("count()").to_numpy(zero_copy_only=False)
        for c, n in zip(cells[cnt > hot_threshold], cnt[cnt > hot_threshold]):
            hot[int(c)] = int(n)
    return hot


def apply_salt(ds, hot_cells: dict, n_salt: int = 8):
    """Rewrite `cell` → salted key. Point rows in hot cells hash into one
    of n_salt shards; polygon rows replicate into all shards. Non-hot rows
    get salt 0 (key unchanged modulo encoding)."""
    if not hot_cells:
        def encode(batch: pa.Table) -> pa.Table:
            cells = batch.column("cell").to_numpy(zero_copy_only=False)
            return batch.set_column(batch.schema.get_field_index("cell"),
                                    "cell", pa.array(cells * np.int64(64)))
        return ds.map_batches(encode, batch_format="pyarrow")

    hot = set(hot_cells)

    def salt(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell").to_numpy(zero_copy_only=False)
        side = batch.column("side").to_numpy(zero_copy_only=False)
        is_hot = np.isin(cells, np.fromiter(hot, dtype=np.int64))
        base = cells * np.int64(64)  # 6 salt bits
        # points: deterministic shard from coordinates
        x = batch.column("x").to_numpy(zero_copy_only=False)
        xs = np.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
        h = np.where(np.isfinite(x), np.abs(xs * 1e6).astype(np.int64) % n_salt, 0)
        pt_key = base + np.where(is_hot & (side == 0), h, 0)
        # polygons in hot cells: replicate rows n_salt times
        rep_rows = np.nonzero(is_hot & (side == 1))[0]
        out = batch.set_column(batch.schema.get_field_index("cell"),
                               "cell", pa.array(pt_key))
        if len(rep_rows) == 0:
            return out
        tables = [out]
        for s in range(1, n_salt):
            t = batch.take(pa.array(rep_rows, type=pa.int64()))
            t = t.set_column(t.schema.get_field_index("cell"), "cell",
                             pa.array(base[rep_rows] + s))
            tables.append(t)
        return pa.concat_tables(tables)

    return ds.map_batches(salt, batch_format="pyarrow")


def _refine_group(group: pa.Table, keep_cols, keep_types) -> pa.Table:
    """Per-cell exact refinement: STRtree over the group's polygons,
    vectorized PIP of the group's points."""
    side = group.column("side").to_numpy(zero_copy_only=False)
    pt_rows = np.nonzero(side == 0)[0]
    poly_rows = np.nonzero(side == 1)[0]
    empty_cols = {c: pa.array([], type=keep_types.get(c, pa.string()))
                  for c in keep_cols}
    empty_cols["poly_id"] = pa.array([], type=pa.int64())
    empty_cols["predicate"] = pa.array([], type=pa.string())
    empty = pa.table(empty_cols)
    if len(pt_rows) == 0 or len(poly_rows) == 0:
        return empty
    px = group.column("x").to_numpy(zero_copy_only=False)[pt_rows]
    py = group.column("y").to_numpy(zero_copy_only=False)[pt_rows]
    polys = [from_wkb(group.column("geom_wkb")[int(i)].as_py())
             for i in poly_rows]
    boxes = np.array([g.bounds() for g in polys])
    tree = STRtree(boxes)
    pi, gi = tree.query_points(px, py)
    if len(pi) == 0:
        return empty
    from ..geom.pip import SegmentCSR, pip_pairs
    keep = pip_pairs(px, py, pi, gi, SegmentCSR(polys))
    pi, gi = pi[keep], gi[keep]
    take_pt = pa.array(pt_rows[pi], type=pa.int64())
    take_poly = pa.array(poly_rows[gi], type=pa.int64())
    out = {c: group.column(c).take(take_pt) for c in keep_cols}
    out["poly_id"] = group.column("poly_id").take(take_poly)
    out["predicate"] = pa.array(["intersects"] * len(pi), type=pa.string())
    return pa.table(out)


def cell_join_groupby(points_ds, polys_ds, res=grid.DEFAULT_RES,
                      hot_threshold: int = 256, n_salt: int = 8,
                      keep_cols=("url", "geom_idx")):
    """Cell-keyed PIP join via union + groupby(cell).map_groups with
    hot-cell salting. Correct but pays per-group call overhead; kept as
    the explicit-salting variant."""
    keep_cols = tuple(keep_cols)
    keep_types = _keep_types(points_ds, keep_cols)
    pts = prepare_point_side(points_ds, res=res, keep_cols=keep_cols)
    pol = prepare_polygon_side(polys_ds, res=res, keep_cols=keep_cols,
                               keep_types=keep_types)
    if hot_threshold:
        # materialize the (small) covering side once: the hot-cell count
        # pre-pass must not force a second execution of the covering stage
        pol = pol.materialize()
        hot = find_hot_cells(pol, hot_threshold)
    else:
        hot = {}
    unioned = apply_salt(pts.union(pol), hot, n_salt)

    def refine(group: pa.Table) -> pa.Table:
        return _refine_group(group, keep_cols, keep_types)

    return unioned.groupby("cell").map_groups(refine, batch_format="pyarrow")


# Per-worker-process caches for _refine_pairs (task pool → workers persist
# across tasks; no actor pool → no CPU-slot reservation that could starve
# the join's aggregator actors).
#   _PAIR_WKB_MAP:   join-token → {poly_id: wkb} (one ray.get per worker
#                    process per join, not per batch)
#   _PAIR_GEOM_CACHE: (join-token, poly_id) → decoded Geometry. The token
#                    keys the cache per join run: two joins in one session
#                    over different polygon corpora that reuse poly_ids
#                    (e.g. nation 0-24 vs make_polygon_table 0-N) must not
#                    refine against each other's stale geometries.
_PAIR_WKB_MAP: dict = {}
_PAIR_GEOM_CACHE: dict = {}


def _refine_pairs(batch: pa.Table, keep_cols, lookup_ref=None,
                  token: str = "") -> pa.Table:
    """Per-batch refinement of hash-join candidate pairs: vectorized PIP
    per unique polygon in the batch. Geometry comes from the broadcast
    {poly_id: wkb} map (`lookup_ref`) — pair rows carry only poly_id, so
    the shuffle never ships WKB bytes per candidate pair."""
    n = batch.num_rows
    if n == 0:
        out = {c: batch.column(c) for c in keep_cols}
        out["poly_id"] = batch.column("poly_id")
        out["predicate"] = pa.array([], type=pa.string())
        return pa.table(out)
    px = batch.column("x").to_numpy(zero_copy_only=False)
    py = batch.column("y").to_numpy(zero_copy_only=False)
    pid = batch.column("poly_id").to_numpy(zero_copy_only=False)
    wkb_map = _PAIR_WKB_MAP.get(token)
    if wkb_map is None:
        import ray
        wkb_map = ray.get(lookup_ref)
        _PAIR_WKB_MAP.clear()   # one live join map per worker is enough
        _PAIR_WKB_MAP[token] = wkb_map
    # decode each unique polygon once (worker-process cache), then refine
    # every pair in ONE vectorized kernel
    from ..geom.pip import SegmentCSR, pip_pairs
    uniq, inv = np.unique(pid, return_inverse=True)
    geoms = []
    for k in range(len(uniq)):
        key = (token, int(uniq[k]))
        g = _PAIR_GEOM_CACHE.get(key)
        if g is None:
            g = from_wkb(wkb_map[int(uniq[k])])
            if len(_PAIR_GEOM_CACHE) > 100_000:
                _PAIR_GEOM_CACHE.clear()
            _PAIR_GEOM_CACHE[key] = g
        geoms.append(g)
    csr = SegmentCSR(geoms)
    keep = pip_pairs(px, py, np.arange(n, dtype=np.int64), inv, csr)
    take = pa.array(np.nonzero(keep)[0], type=pa.int64())
    out = {c: batch.column(c).take(take) for c in keep_cols}
    out["poly_id"] = batch.column("poly_id").take(take)
    out["predicate"] = pa.array(["intersects"] * len(take), type=pa.string())
    return pa.table(out)


def cell_join(points_ds, polys_ds, res=grid.DEFAULT_RES,
              num_partitions: int | None = None,
              keep_cols=("url", "geom_idx"),
              concurrency=None, hot_threshold=None, n_salt=None):
    """Cell-keyed PIP join: hash `Dataset.join` on the covering cell, then
    per-batch vectorized exact refinement. The shuffle moves only
    (cell, point, poly_id) candidate rows — never the corpus payload and
    never polygon WKB: geometry is resolved inside the refine stage from
    a broadcast {poly_id: wkb} map (`ray.put` once, fetched once per
    worker process, decoded polygons cached per (join, poly_id)).

    Scale assumption: the polygon side fits in the object store (the
    north-star shape — polygon corpus ≪ page corpus). When it does not,
    use cell_join_groupby, which shuffles WKB once per covering cell
    instead of broadcasting.

    hot_threshold/n_salt accepted for API compat with cell_join_groupby
    (the hash-join path handles skew by partitioning pairs, not groups).

    num_partitions defaults to the cluster CPU count (the join operator
    schedules one aggregator actor per partition; more partitions than
    CPUs deadlocks on small clusters)."""
    keep_cols = tuple(keep_cols)
    if num_partitions is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        # each partition costs an aggregator actor (~0.3s startup + memory
        # reservation): cpus/4 amortizes well from laptop to node scale;
        # large multi-node jobs should pass num_partitions explicitly
        # (rule of thumb: total input bytes / 512 MiB)
        num_partitions = max(2, min(cpus // 4, 16))

    def pts_prep(batch: pa.Table) -> pa.Table:
        px = batch.column("x").to_numpy(zero_copy_only=False)
        py = batch.column("y").to_numpy(zero_copy_only=False)
        cells = grid.lonlat_to_grid(px, py, res)
        cols = {"cell": pa.array(cells.view(np.int64)),
                "x": pa.array(px), "y": pa.array(py)}
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def pol_prep(batch: pa.Table) -> pa.Table:
        from ..geom.wkb import wkb_bounds
        boxes = wkb_bounds(batch.column("geom_wkb").to_pylist())
        valid = np.isfinite(boxes[:, 0])
        vidx = np.nonzero(valid)[0]
        ri, cells = grid.cover_boxes(boxes[vidx, 0], boxes[vidx, 1],
                                     boxes[vidx, 2], boxes[vidx, 3], res)
        rows = vidx[ri]
        take = pa.array(rows, type=pa.int64())
        return pa.table({"cell": pa.array(cells.view(np.int64)),
                         "poly_id": batch.column("poly_id").take(take)})

    import ray

    # broadcast the polygon WKB lookup once (small side); materialize the
    # polygon Dataset first so the cover stage below does not re-execute
    # its lineage a second time
    polys_ds = polys_ds.materialize()
    wkb_map: dict = {}
    for b in polys_ds.select_columns(["poly_id", "geom_wkb"]).iter_batches(
            batch_format="pyarrow"):
        wkb_map.update(zip(b.column("poly_id").to_pylist(),
                           b.column("geom_wkb").to_pylist()))
    lookup_ref = ray.put(wkb_map)
    token = lookup_ref.hex()   # unique per join run → no stale cache reuse

    pts = points_ds.map_batches(pts_prep, batch_format="pyarrow")
    pol = polys_ds.map_batches(pol_prep, batch_format="pyarrow")
    pairs = pts.join(pol, join_type="inner", num_partitions=num_partitions,
                     on=("cell",))
    import functools
    return pairs.map_batches(functools.partial(_refine_pairs,
                                               keep_cols=keep_cols,
                                               lookup_ref=lookup_ref,
                                               token=token),
                             batch_format="pyarrow")


def cell_join_h3(points_ds, polys_ds, res: int = 4,
                 num_partitions: int | None = None,
                 keep_cols=("url", "geom_idx")):
    """H3-keyed PIP join — the north-star shuffle shape verbatim: both
    sides keyed by H3 cells (points by their own cell, polygons by the
    exact-by-construction `h3.cover_boxes` bbox cover), hash join on the
    cell, per-batch vectorized exact refinement with broadcast geometry
    (same poly_id-only shuffle and per-join-token cache as cell_join).

    `res` keys the shuffle: res 4 (~50 km cells) suits continent-scale
    polygons; raise it for street-scale polygon corpora."""
    from ..cells import h3
    keep_cols = tuple(keep_cols)
    if num_partitions is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))

    def pts_prep(batch: pa.Table) -> pa.Table:
        px = batch.column("x").to_numpy(zero_copy_only=False)
        py = batch.column("y").to_numpy(zero_copy_only=False)
        cells = h3.lonlat_to_cell(px, py, res)
        cols = {"cell": pa.array(cells.view(np.int64)),
                "x": pa.array(px), "y": pa.array(py)}
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def pol_prep(batch: pa.Table) -> pa.Table:
        from ..geom.wkb import wkb_bounds
        boxes = wkb_bounds(batch.column("geom_wkb").to_pylist())
        valid = np.isfinite(boxes[:, 0])
        vidx = np.nonzero(valid)[0]
        ri, cells = h3.cover_boxes(boxes[vidx, 0], boxes[vidx, 1],
                                   boxes[vidx, 2], boxes[vidx, 3], res)
        rows = vidx[ri]
        take = pa.array(rows, type=pa.int64())
        return pa.table({"cell": pa.array(cells.view(np.int64)),
                         "poly_id": batch.column("poly_id").take(take)})

    import ray

    polys_ds = polys_ds.materialize()
    wkb_map: dict = {}
    for b in polys_ds.select_columns(["poly_id", "geom_wkb"]).iter_batches(
            batch_format="pyarrow"):
        wkb_map.update(zip(b.column("poly_id").to_pylist(),
                           b.column("geom_wkb").to_pylist()))
    lookup_ref = ray.put(wkb_map)
    token = lookup_ref.hex()

    pts = points_ds.map_batches(pts_prep, batch_format="pyarrow")
    pol = polys_ds.map_batches(pol_prep, batch_format="pyarrow")
    pairs = pts.join(pol, join_type="inner", num_partitions=num_partitions,
                     on=("cell",))
    import functools
    return pairs.map_batches(functools.partial(_refine_pairs,
                                               keep_cols=keep_cols,
                                               lookup_ref=lookup_ref,
                                               token=token),
                             batch_format="pyarrow")
