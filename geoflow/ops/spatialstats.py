"""Spatial autocorrelation statistics over tile grids.

Moran's I with rook (4-neighbor) contiguity weights over per-tile
point counts:

    I = (n / W) * sum_ij w_ij (x_i - mean)(x_j - mean)
               / sum_i (x_i - mean)^2

Everything is computed in INTEGER arithmetic by scaling deviations by
n: dev_i = n*x_i - S (S = sum of counts), so

    moran_num = sum over directed neighbor pairs dev_i * dev_j
    moran_den = sum_i dev_i^2
    I         = (n * moran_num) / (W * moran_den)

num/den/W/n are exact int64 on both engines (the SQL oracle is a
self-join on shifted tile coords); the final I is three IEEE double
ops in a fixed order. Neighbors must EXIST as occupied tiles —
empty tiles are not zero-count observations (documented choice,
mirrored in SQL; standard practice for point-pattern lattices).

Shape: one point-level groupby to tile counts (the only shuffle that
sees point-sized data), then the tile table — bounded by 4^zoom, at
most 65k rows at the z8 default, 16M at z12 — streams to the driver
where the 4 shifted-key neighbor lookups run as vectorized
searchsorted passes. ``max_broadcast_tiles`` guards the collect;
integer exactness requires n_tiles * max_tile_count < 3e9 (dev^2
must fit int64) — guarded with a loud ValueError."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def morans_i_tiles(ds, x_col: str = "x", y_col: str = "y",
                   zoom: int = 8,
                   max_broadcast_tiles: int = 50_000_000):
    """1-row Dataset: n_tiles, w_pairs, moran_num, moran_den, moran_i
    for rook-adjacent per-tile point counts at ``zoom``."""
    import ray
    import ray.data

    from ..cells.tiles import lonlat_to_tile

    def assign(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        tx, ty = lonlat_to_tile(x, y, zoom)
        return pa.table({"tile_x": pa.array(tx.astype(np.int64)),
                         "tile_y": pa.array(ty.astype(np.int64))})

    tiles = (ds.map_batches(assign, batch_format="pyarrow")
             .groupby(["tile_x", "tile_y"]).count())

    # tile table is bounded by 4^zoom — collect (key, count)
    keys_l, cnts_l = [], []
    for blk in tiles.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if blk.num_rows == 0 or "tile_x" not in blk.schema.names:
            continue
        tx = blk.column("tile_x").to_numpy(zero_copy_only=False)
        ty = blk.column("tile_y").to_numpy(zero_copy_only=False)
        keys_l.append(tx * (1 << 32) + ty)
        cnts_l.append(blk.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64))
    keys = np.concatenate(keys_l) if keys_l else np.empty(0, np.int64)
    cnts = np.concatenate(cnts_l) if cnts_l else np.empty(0, np.int64)
    if len(keys) > max_broadcast_tiles:
        raise ValueError(f"{len(keys)} tiles exceeds "
                         f"max_broadcast_tiles={max_broadcast_tiles}")
    order = np.argsort(keys)
    keys, cnts = keys[order], cnts[order]
    n = len(keys)
    if n and n * int(cnts.max()) > 3_000_000_000:
        raise ValueError("n_tiles * max_tile_count too large for exact "
                         "int64 deviations; raise zoom to split tiles")
    s = int(cnts.sum())
    dev = n * cnts - s

    num = np.int64(0)
    w = np.int64(0)
    den = int((dev * dev).sum())
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nk = keys + dx * (1 << 32) + dy
        pos = np.searchsorted(keys, nk).clip(0, max(n - 1, 0))
        hit = (keys[pos] == nk) if n else np.zeros(0, bool)
        w += int(hit.sum())
        num += int((dev[hit] * dev[pos[hit]]).sum())
    if w == 0 or den == 0:
        moran_i = 0.0
    else:
        moran_i = (float(n) * float(num)) / (float(w) * float(den))
    return ray.data.from_arrow(pa.table({
        "n_tiles": pa.array([n], pa.int64()),
        "w_pairs": pa.array([int(w)], pa.int64()),
        "moran_num": pa.array([int(num)], pa.int64()),
        "moran_den": pa.array([den], pa.int64()),
        "moran_i": pa.array([moran_i], pa.float64())}))


def _tile_counts(ds, x_col: str, y_col: str, zoom: int,
                 max_broadcast_tiles: int):
    """Point groupby → sorted (packed tile keys, counts) on the
    driver — shared by the tile-lattice statistics (bounded by
    4^zoom; the ONLY point-sized shuffle each stat pays)."""
    from ..cells.tiles import lonlat_to_tile

    def assign(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        tx, ty = lonlat_to_tile(x, y, zoom)
        return pa.table({"tile_x": pa.array(tx.astype(np.int64)),
                         "tile_y": pa.array(ty.astype(np.int64))})

    tiles = (ds.map_batches(assign, batch_format="pyarrow")
             .groupby(["tile_x", "tile_y"]).count())
    keys_l, cnts_l = [], []
    for blk in tiles.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if blk.num_rows == 0 or "tile_x" not in blk.schema.names:
            continue
        tx = blk.column("tile_x").to_numpy(zero_copy_only=False)
        ty = blk.column("tile_y").to_numpy(zero_copy_only=False)
        keys_l.append(tx * (1 << 32) + ty)
        cnts_l.append(blk.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64))
    keys = np.concatenate(keys_l) if keys_l else np.empty(0, np.int64)
    cnts = np.concatenate(cnts_l) if cnts_l else np.empty(0, np.int64)
    if len(keys) > max_broadcast_tiles:
        raise ValueError(f"{len(keys)} tiles exceeds "
                         f"max_broadcast_tiles={max_broadcast_tiles}")
    order = np.argsort(keys)
    return keys[order], cnts[order]


def idw_tiles(ds, x_col: str = "x", y_col: str = "y",
              zoom: int = 8, radius: int = 2,
              max_broadcast_tiles: int = 50_000_000):
    """Inverse-distance-weighted neighbor smoothing of per-tile point
    counts: for each occupied tile, ``idw_num`` = Σ c_j · w_j and
    ``idw_den`` = Σ w_j over occupied tiles within Chebyshev
    ``radius`` (self excluded), with the INTEGER weight
    w = 65536 // (dx² + dy²) — exact int64 on both engines; the
    smoothed value num/den is one client-side IEEE division. Tiles
    with no occupied neighbor in range are omitted (den would be 0;
    the SQL twin's inner join drops them identically)."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    n = len(keys)
    num = np.zeros(n, np.int64)
    den = np.zeros(n, np.int64)
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            if dx == 0 and dy == 0:
                continue
            w = 65536 // (dx * dx + dy * dy)
            nk = keys + dx * (1 << 32) + dy
            pos = np.searchsorted(keys, nk).clip(0, max(n - 1, 0))
            hit = (keys[pos] == nk) if n else np.zeros(0, bool)
            num += np.where(hit, cnts[pos] * w, 0)
            den += np.where(hit, w, 0)
    keep = den > 0
    return ray.data.from_arrow(pa.table({
        "tile_x": (keys[keep] >> 32).astype(np.int64),
        "tile_y": (keys[keep] & ((1 << 32) - 1)).astype(np.int64),
        "n_points": cnts[keep],
        "idw_num": num[keep],
        "idw_den": den[keep]}))


def getis_ord_tiles(ds, x_col: str = "x", y_col: str = "y",
                    zoom: int = 8,
                    max_broadcast_tiles: int = 50_000_000):
    """Getis-Ord Gi* hot-spot ingredients per tile (queen contiguity
    INCLUDING self, the Gi* convention): for each occupied tile,
    ``local_sum`` = sum of counts over self + up-to-8 occupied
    neighbors, ``w_i`` = number of contributing tiles, plus the global
    ``n_tiles`` / ``total`` carried on every row. All int64 — the
    z-score normalization is a client-side float step (never hashes
    cross-engine); hot-spot RANKING only needs these integers.
    Same collect bound and shape as morans_i_tiles."""
    import ray
    import ray.data

    from ..cells.tiles import lonlat_to_tile

    def assign(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        tx, ty = lonlat_to_tile(x, y, zoom)
        return pa.table({"tile_x": pa.array(tx.astype(np.int64)),
                         "tile_y": pa.array(ty.astype(np.int64))})

    tiles = (ds.map_batches(assign, batch_format="pyarrow")
             .groupby(["tile_x", "tile_y"]).count())
    keys_l, cnts_l = [], []
    for blk in tiles.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if blk.num_rows == 0 or "tile_x" not in blk.schema.names:
            continue
        tx = blk.column("tile_x").to_numpy(zero_copy_only=False)
        ty = blk.column("tile_y").to_numpy(zero_copy_only=False)
        keys_l.append(tx * (1 << 32) + ty)
        cnts_l.append(blk.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64))
    keys = np.concatenate(keys_l) if keys_l else np.empty(0, np.int64)
    cnts = np.concatenate(cnts_l) if cnts_l else np.empty(0, np.int64)
    if len(keys) > max_broadcast_tiles:
        raise ValueError(f"{len(keys)} tiles exceeds "
                         f"max_broadcast_tiles={max_broadcast_tiles}")
    order = np.argsort(keys)
    keys, cnts = keys[order], cnts[order]
    n = len(keys)
    total = int(cnts.sum())
    local = cnts.copy()
    w = np.ones(n, np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nk = keys + dx * (1 << 32) + dy
            pos = np.searchsorted(keys, nk).clip(0, max(n - 1, 0))
            hit = (keys[pos] == nk) if n else np.zeros(0, bool)
            local += np.where(hit, cnts[pos.clip(0, max(n - 1, 0))], 0)
            w += hit.astype(np.int64)
    return ray.data.from_arrow(pa.table({
        "tile_x": (keys >> 32).astype(np.int64),
        "tile_y": (keys & ((1 << 32) - 1)).astype(np.int64),
        "n_points": cnts,
        "local_sum": local,
        "w_i": w,
        "n_tiles": np.full(n, n, np.int64),
        "total": np.full(n, total, np.int64)}))


def ripley_pair_counts(ds, radii, x_col: str = "cx",
                       y_col: str = "cy", id_col: str = "doc_id"):
    """Ripley's K ingredient counts (Ripley 1976): for each radius r
    in ``radii``, the number of ORDERED point pairs (i != j) with
    (x_i-x_j)² + (y_i-y_j)² <= r² — coordinates and radii must be
    INTEGERS (e.g. centi-degrees), so every compare is exact int64.
    The K estimate Â·pairs/(n(n-1)) is one client-side float op.

    Shape (ghost-zone pattern): grid cell = max(radii); every point
    lands once as a HOME row in its own cell and 9× as a PROBE row in
    the cell's 3×3 neighborhood, so every within-r pair is co-located
    in exactly one group (cell size >= r). One groupby(cell) shuffle
    of the 10× stream, vectorized pair counting inside the group
    (homes chunked so the distance matrix stays bounded), then a
    driver-side sum of the per-cell partials (|radii| rows each) —
    the morans_i collect pattern. Returns a 1-block Dataset
    (r, n_pairs, n_points)."""
    import ray.data

    radii = np.asarray(sorted(radii), dtype=np.int64)
    if len(radii) == 0 or radii[0] <= 0:
        raise ValueError("radii must be positive integers")
    cell = int(radii[-1])
    r2 = radii * radii

    def emit(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        i = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        kx, ky = x // cell, y // cell
        keys, xs, ys, ids, home = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                keys.append((kx + dx) * (1 << 32) + (ky + dy))
                xs.append(x)
                ys.append(y)
                ids.append(i)
                home.append(np.full(len(x), 0, np.int8))
        keys.append(kx * (1 << 32) + ky)
        xs.append(x); ys.append(y); ids.append(i)
        home.append(np.full(len(x), 1, np.int8))
        return pa.table({
            "cell_key": np.concatenate(keys),
            "px": np.concatenate(xs), "py": np.concatenate(ys),
            "pid": np.concatenate(ids),
            "is_home": np.concatenate(home)})

    def count(group: pa.Table) -> pa.Table:
        h = group.column("is_home").to_numpy(
            zero_copy_only=False).astype(bool)
        px = group.column("px").to_numpy(zero_copy_only=False)
        py = group.column("py").to_numpy(zero_copy_only=False)
        pid = group.column("pid").to_numpy(zero_copy_only=False)
        hx, hy, hid = px[h], py[h], pid[h]
        qx, qy, qid = px[~h], py[~h], pid[~h]
        acc = np.zeros(len(radii), np.int64)
        for st in range(0, len(hx), 512):
            sl = slice(st, st + 512)
            dx = hx[sl][:, None] - qx[None, :]
            dy = hy[sl][:, None] - qy[None, :]
            d2 = dx * dx + dy * dy
            d2[hid[sl][:, None] == qid[None, :]] = np.iinfo(np.int64).max
            acc += np.searchsorted(np.sort(d2.ravel()), r2,
                                   side="right")
        return pa.table({"r": pa.array(radii),
                         "n_pairs": pa.array(acc),
                         "n_home": pa.array(
                             np.full(len(radii), len(hx), np.int64))})

    parts = (ds.map_batches(emit, batch_format="pyarrow")
             .groupby("cell_key").map_groups(count,
                                             batch_format="pyarrow"))
    tot = np.zeros(len(radii), np.int64)
    n_points = 0
    for blk in parts.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if blk.num_rows == 0 or "r" not in blk.schema.names:
            continue
        r = blk.column("r").to_numpy(zero_copy_only=False)
        np_ = blk.column("n_pairs").to_numpy(zero_copy_only=False)
        nh = blk.column("n_home").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(radii, r)
        np.add.at(tot, idx, np_)
        # one row per group carries r == radii[0]; blocks may merge
        # several groups, so harvest n_home from those rows only
        n_points += int(nh[r == radii[0]].sum())
    return ray.data.from_arrow(pa.table({
        "r": pa.array(radii), "n_pairs": pa.array(tot),
        "n_points": pa.array(
            np.full(len(radii), n_points, np.int64))}))


def hausdorff_pairs(ds, pair_col: str = "pair", set_col: str = "side",
                    x_col: str = "x", y_col: str = "y"):
    """Squared directed Hausdorff distances between the two point
    sets of each pair (trajectory/footprint similarity — the exact
    integer sibling of ops/measures.st_hausdorffdistance's float
    geometry op): rows tagged (pair, side ∈ {0,1}, x, y) →
    (pair, n_a, n_b, h2_ab, h2_ba) with h2_ab = max_{a∈A} min_{b∈B}
    d²(a,b). Squared distances stay int64, so rows hash-match the
    SQL cross-join min/max oracle.

    Shape: one map_groups per pair key (group = both sides); the
    kernel is a vectorized (n_a × n_b) squared-distance matrix —
    pairs with huge sets should pre-tile, documented bound."""
    empty = pa.table({"pair": pa.array([], pa.int64()),
                      "n_a": pa.array([], pa.int64()),
                      "n_b": pa.array([], pa.int64()),
                      "h2_ab": pa.array([], pa.int64()),
                      "h2_ba": pa.array([], pa.int64())})

    def hd(group: pa.Table) -> pa.Table:
        side = group.column(set_col).to_numpy(zero_copy_only=False)
        x = group.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = group.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        a, b = side == 0, side == 1
        if not a.any() or not b.any():
            return empty
        dx = x[a][:, None] - x[b][None, :]
        dy = y[a][:, None] - y[b][None, :]
        d2 = dx * dx + dy * dy
        return pa.table({
            "pair": pa.array([group.column(pair_col)[0].as_py()],
                             pa.int64()),
            "n_a": pa.array([int(a.sum())], pa.int64()),
            "n_b": pa.array([int(b.sum())], pa.int64()),
            "h2_ab": pa.array([int(d2.min(axis=1).max())], pa.int64()),
            "h2_ba": pa.array([int(d2.min(axis=0).max())],
                              pa.int64())})

    return ds.groupby(pair_col).map_groups(hd, batch_format="pyarrow")


def emerging_hotspots(ds, key_x: str = "px", key_y: str = "py",
                      ts_col: str = "ts", cell_div: int = 20,
                      grid: int = 5):
    """Emerging-hot-spot ingredients (the space-time-cube composite:
    Getis-Ord-style queen local sums per (tile, day), then the
    Mann-Kendall trend of each tile's local-sum series — ESRI's
    published EHSA shape, in exact integers): output (cx, cy,
    n_days, s_stat, var18). Local sums are defined for every
    (tile, day) where the TILE ITSELF is occupied; the MK series is
    that tile's occupied days in order (mirrored by the SQL).

    Shape: events collapse via ONE (tile, day) groupby; per-day queen
    sums are a dense grid scatter + 8 shifted adds inside
    groupby(day).map_groups; the per-tile MK pass reuses the
    chunked-broadcast sign sum (series length = day span)."""
    from ..ops.timeseries import US_PER_DAY

    def to_cell(batch: pa.Table) -> pa.Table:
        t = (batch.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        x = batch.column(key_x).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = batch.column(key_y).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"cx": pa.array(x // cell_div),
                         "cy": pa.array(y // cell_div),
                         "day": pa.array(t // US_PER_DAY)})

    daily = ds.map_batches(to_cell, batch_format="pyarrow") \
        .groupby(["cx", "cy", "day"]).count()

    def queen(group: pa.Table) -> pa.Table:
        cx = group.column("cx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cy = group.column("cy").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = group.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = np.zeros((grid + 2, grid + 2), np.int64)
        g[cx + 1, cy + 1] = n
        tot = np.zeros_like(g)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tot[1:grid + 1, 1:grid + 1] += \
                    g[1 + dx:grid + 1 + dx, 1 + dy:grid + 1 + dy]
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "day": group.column("day"),
            "gsum": pa.array(tot[cx + 1, cy + 1])})

    local = daily.groupby("day").map_groups(queen,
                                            batch_format="pyarrow")

    def prep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "cx" not in b.schema.names:
            return pa.table({"tile": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int64()),
                             "gsum": pa.array([], pa.int64())})
        cx = b.column("cx").to_numpy(zero_copy_only=False)
        cy = b.column("cy").to_numpy(zero_copy_only=False)
        return pa.table({"tile": pa.array(cx * grid + cy),
                         "day": b.column("day"),
                         "gsum": b.column("gsum")})

    def mk(group: pa.Table) -> pa.Table:
        day = group.column("day").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = group.column("gsum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        from ..ops.timeseries import mk_stats
        v = v[np.argsort(day)]
        n = len(v)
        s, var18 = mk_stats(v)
        tile = int(group.column("tile")[0].as_py())
        return pa.table({
            "cx": pa.array([tile // grid], pa.int64()),
            "cy": pa.array([tile % grid], pa.int64()),
            "n_days": pa.array([n], pa.int64()),
            "s_stat": pa.array([s], pa.int64()),
            "var18": pa.array([var18], pa.int64())})

    return local.map_batches(prep, batch_format="pyarrow") \
        .groupby("tile").map_groups(mk, batch_format="pyarrow")


def segment_crossings(ds, grp_col: str = "grp",
                      cols=("x1", "y1", "x2", "y2")):
    """Proper-crossing pair counts per segment group (the sweep-line
    workload's correctness kernel, in exact integers): segments
    (p1, p2), (q1, q2) properly cross iff the endpoint orientations
    strictly straddle — cross(p2−p1, q1−p1)·cross(p2−p1, q2−p1) < 0
    AND the symmetric test — which excludes touches, shared
    endpoints, collinear overlaps and zero-length segments. Output
    (grp, n_segments, n_crossings), int64, hash-exact vs the SQL
    pairwise self-join.

    Shape: one map_groups per group with a fully vectorized
    (n × n) orientation tensor — group sizes are the planted
    bucket, not the corpus."""
    x1c, y1c, x2c, y2c = cols

    def cross_count(group: pa.Table) -> pa.Table:
        x1 = group.column(x1c).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y1 = group.column(y1c).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x2 = group.column(x2c).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y2 = group.column(y2c).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(x1)
        dx, dy = x2 - x1, y2 - y1

        def orient(px, py):
            # cross(p2-p1, (px,py)-p1) for every (segment i, point j)
            return dx[:, None] * (py[None, :] - y1[:, None]) \
                - dy[:, None] * (px[None, :] - x1[:, None])

        o1 = orient(x1, y1)          # i's line vs j's first endpoint
        o2 = orient(x2, y2)
        straddle_ij = (o1 * o2) < 0  # j straddles i's line
        crossing = straddle_ij & straddle_ij.T
        iu = np.triu_indices(n, 1)
        return pa.table({
            "grp": pa.array([group.column(grp_col)[0].as_py()],
                            pa.int64()),
            "n_segments": pa.array([n], pa.int64()),
            "n_crossings": pa.array([int(crossing[iu].sum())],
                                    pa.int64())})

    return ds.groupby(grp_col).map_groups(cross_count,
                                          batch_format="pyarrow")


def focal_majority_tiles(ds, x_col: str = "x", y_col: str = "y",
                         zoom: int = 8,
                         max_broadcast_tiles: int = 50_000_000):
    """Focal majority filter over the occupied tile lattice (the
    raster focal-statistics MAJORITY op): for each occupied tile, the
    modal COUNT VALUE among itself + its up-to-8 occupied queen
    neighbors — ties break to the SMALLEST value (deterministic, the
    SQL (cnt DESC, value ASC) row-number order). Output (tile_x,
    tile_y, n_contrib, majority_value), all int64.

    Shape: the shared _tile_counts collect (bounded by 4^zoom), then
    one vectorized pass: the 9 shifted neighbor lookups build a
    (n_tiles × 9) value matrix whose per-row mode is computed by one
    lexsort + run-length scan — no Python loop over tiles."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    n = len(keys)
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "tile_x": pa.array([], pa.int64()),
            "tile_y": pa.array([], pa.int64()),
            "n_contrib": pa.array([], pa.int64()),
            "majority_value": pa.array([], pa.int64())}))
    tx, ty = keys // (1 << 32), keys % (1 << 32)
    vals = np.zeros((n, 9), np.int64)
    ok = np.zeros((n, 9), bool)
    j = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            nk = (tx + dx) * (1 << 32) + (ty + dy)
            pos = np.searchsorted(keys, nk)
            hit = (pos < n) & (keys[np.minimum(pos, n - 1)] == nk)
            vals[hit, j] = cnts[np.minimum(pos, n - 1)][hit]
            ok[:, j] = hit
            j += 1
    # per-row mode with (count DESC, value ASC) tiebreak: flatten the
    # valid (row, value) pairs, sort, run-length, then per-row argbest
    rows = np.repeat(np.arange(n), 9)[ok.ravel()]
    v = vals.ravel()[ok.ravel()]
    o = np.lexsort((v, rows))
    rows, v = rows[o], v[o]
    start = np.r_[True, (rows[1:] != rows[:-1]) | (v[1:] != v[:-1])]
    si = np.flatnonzero(start)
    rl = np.diff(np.r_[si, len(v)])          # multiplicity per run
    rrow, rval = rows[si], v[si]
    # best run per row: order by (row, -count, value) and take first
    o2 = np.lexsort((rval, -rl, rrow))
    first = np.r_[True, rrow[o2][1:] != rrow[o2][:-1]]
    maj = np.empty(n, np.int64)
    maj[rrow[o2][first]] = rval[o2][first]
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(tx), "tile_y": pa.array(ty),
        "n_contrib": pa.array(ok.sum(axis=1).astype(np.int64)),
        "majority_value": pa.array(maj)}))


def tile_cluster_labels(ds, x_col: str = "x", y_col: str = "y",
                        zoom: int = 8, rounds: int = 8,
                        max_broadcast_tiles: int = 50_000_000):
    """Connected-cluster labels over the occupied tile lattice
    (4-connectivity) by ``rounds`` synchronous min-label relaxations
    — the raster region-grouping op. Labels start as the packed tile
    key (tx·2^zoom + ty) and converge to the component minimum;
    with ``rounds`` below a component's diameter the result is the
    documented fixed-round prefix, which the SQL oracle unrolls
    identically (kcore/labelprop convention). Output (tile_x,
    tile_y, n_points, label), all int64.

    Shape: the shared _tile_counts collect (4^zoom bound), then
    ``rounds`` vectorized searchsorted min-relaxations on the
    driver arrays — no per-tile Python."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    n = len(keys)
    side = 1 << zoom
    tx, ty = keys // (1 << 32), keys % (1 << 32)
    pk = tx * side + ty
    lab = pk.copy()
    nbr_keys = [(tx + dx) * (1 << 32) + (ty + dy)
                for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1))]
    pos_hit = []
    for nk in nbr_keys:
        pos = np.searchsorted(keys, nk)
        hit = (pos < n) & (keys[np.minimum(pos, n - 1)] == nk)
        pos_hit.append((np.minimum(pos, n - 1), hit))
    for _ in range(rounds):
        new = lab.copy()
        for pos, hit in pos_hit:
            cand = np.where(hit, lab[pos], lab)
            np.minimum(new, cand, out=new)
        if np.array_equal(new, lab):
            break
        lab = new
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(tx), "tile_y": pa.array(ty),
        "n_points": pa.array(cnts), "label": pa.array(lab)}))


def _neighbor_matrix(keys: np.ndarray, cnts: np.ndarray):
    """(vals, ok) 9-column neighbor-count matrices over the occupied
    tile lattice, column order (dx,dy) row-major over (-1,0,1)² —
    the shared gather behind the focal kernels (focal_majority /
    slope / peaks). Missing neighbors: ok False, val 0."""
    n = len(keys)
    tx, ty = keys // (1 << 32), keys % (1 << 32)
    vals = np.zeros((n, 9), np.int64)
    ok = np.zeros((n, 9), bool)
    j = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            nk = (tx + dx) * (1 << 32) + (ty + dy)
            pos = np.searchsorted(keys, nk)
            hit = (pos < n) & (keys[np.minimum(pos, n - 1)] == nk)
            vals[hit, j] = cnts[np.minimum(pos, n - 1)][hit]
            ok[:, j] = hit
            j += 1
    return tx, ty, vals, ok


# _neighbor_matrix column index per (dx,dy): dx→west/east, dy→north/
# south in tile coords (tile_y grows southward on the slippy grid)
_NW, _W, _SW, _N, _C, _S, _NE, _E, _SE = range(9)


def focal_slope_tiles(ds, x_col: str = "x", y_col: str = "y",
                      zoom: int = 8,
                      max_broadcast_tiles: int = 50_000_000):
    """Horn-1981 focal gradient over the occupied tile lattice,
    treating the per-tile point count as elevation (the raster
    slope/aspect map-algebra op, integer-exact form): with missing
    (unoccupied) neighbors contributing 0,

        gx = (zNE + 2·zE + zSE) − (zNW + 2·zW + zSW)
        gy = (zSW + 2·zS + zSE) − (zNW + 2·zN + zNE)

    plus slope_sq = gx² + gy² and an 8-sector aspect class decided by
    INTEGER comparisons only (boundaries on the axes and the exact
    45° diagonals — no trigonometry, hash-exact on both engines):

        0 flat (gx=gy=0);  1 +x / 2 −x when |gx| > |gy|;
        3 +y / 4 −y when |gy| > |gx|;  5..8 the |gx| == |gy|
        diagonals by (sign gx, sign gy): (+,+)=5 (+,−)=6 (−,+)=7
        (−,−)=8.

    Output (tile_x, tile_y, gx, gy, slope_sq, aspect_class), all
    int64. Shape: the shared _tile_counts collect (4^zoom bound) +
    one vectorized 9-shift gather — no per-tile Python."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    if len(keys) == 0:
        return ray.data.from_arrow(pa.table({
            "tile_x": pa.array([], pa.int64()),
            "tile_y": pa.array([], pa.int64()),
            "gx": pa.array([], pa.int64()),
            "gy": pa.array([], pa.int64()),
            "slope_sq": pa.array([], pa.int64()),
            "aspect_class": pa.array([], pa.int64())}))
    tx, ty, v, _ok = _neighbor_matrix(keys, cnts)
    gx = (v[:, _NE] + 2 * v[:, _E] + v[:, _SE]) \
        - (v[:, _NW] + 2 * v[:, _W] + v[:, _SW])
    gy = (v[:, _SW] + 2 * v[:, _S] + v[:, _SE]) \
        - (v[:, _NW] + 2 * v[:, _N] + v[:, _NE])
    ax, ay = np.abs(gx), np.abs(gy)
    aspect = np.zeros(len(keys), np.int64)
    m = ax > ay
    aspect[m] = np.where(gx[m] > 0, 1, 2)
    m = ay > ax
    aspect[m] = np.where(gy[m] > 0, 3, 4)
    m = (ax == ay) & (ax > 0)
    diag = np.where(gx > 0, np.where(gy > 0, 5, 6),
                    np.where(gy > 0, 7, 8))
    aspect[m] = diag[m]
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(tx), "tile_y": pa.array(ty),
        "gx": pa.array(gx), "gy": pa.array(gy),
        "slope_sq": pa.array(gx * gx + gy * gy),
        "aspect_class": pa.array(aspect)}))


def tile_peaks(ds, x_col: str = "x", y_col: str = "y",
               zoom: int = 8,
               max_broadcast_tiles: int = 50_000_000):
    """Local extrema over the occupied tile lattice: per occupied
    tile, its point count c, the number of occupied queen neighbors,
    how many of them have count ≥ c (n_ge) / ≤ c (n_le), and the
    is_peak / is_pit flags (no neighbor ≥ / ≤ — strict extrema;
    an isolated tile is both). The raster TOP/pit-detection op in
    integer form. Output (tile_x, tile_y, c, n_neighbors, n_ge,
    n_le, is_peak, is_pit), all int64."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    if len(keys) == 0:
        return ray.data.from_arrow(pa.table({
            k: pa.array([], pa.int64())
            for k in ("tile_x", "tile_y", "c", "n_neighbors",
                      "n_ge", "n_le", "is_peak", "is_pit")}))
    tx, ty, v, ok = _neighbor_matrix(keys, cnts)
    ok = ok.copy()
    ok[:, _C] = False                       # self is not a neighbor
    c = cnts[:, None]
    n_nb = ok.sum(axis=1).astype(np.int64)
    n_ge = (ok & (v >= c)).sum(axis=1).astype(np.int64)
    n_le = (ok & (v <= c)).sum(axis=1).astype(np.int64)
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(tx), "tile_y": pa.array(ty),
        "c": pa.array(cnts), "n_neighbors": pa.array(n_nb),
        "n_ge": pa.array(n_ge), "n_le": pa.array(n_le),
        "is_peak": pa.array((n_ge == 0).astype(np.int64)),
        "is_pit": pa.array((n_le == 0).astype(np.int64))}))


def tile_morphology(ds, x_col: str = "x", y_col: str = "y",
                    zoom: int = 8,
                    max_broadcast_tiles: int = 50_000_000):
    """Binary morphology over the occupied tile lattice with the 3×3
    queen structuring element: the output lattice is the DILATION
    (every in-range tile within Chebyshev distance 1 of an occupied
    tile); each row carries whether the tile itself is occupied, its
    occupied-neighbor count (self excluded), and eroded = occupied
    AND all 8 neighbors occupied (in-range only — border tiles can
    never be eroded, the standard zero-padding convention). Output
    (tile_x, tile_y, occupied, n_occ_neighbors, eroded), int64.

    Shape: _tile_counts collect (4^zoom bound), 9-shift union +
    9-shift membership — no per-tile Python."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    side = 1 << zoom
    if len(keys) == 0:
        return ray.data.from_arrow(pa.table({
            k: pa.array([], pa.int64())
            for k in ("tile_x", "tile_y", "occupied",
                      "n_occ_neighbors", "eroded")}))
    tx, ty = keys // (1 << 32), keys % (1 << 32)
    shifted = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            nx, ny = tx + dx, ty + dy
            m = (nx >= 0) & (nx < side) & (ny >= 0) & (ny < side)
            shifted.append(nx[m] * (1 << 32) + ny[m])
    dil = np.unique(np.concatenate(shifted))
    dtx, dty = dil // (1 << 32), dil % (1 << 32)
    occ = np.zeros(len(dil), np.int64)
    pos = np.searchsorted(keys, dil)
    hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)]
                               == dil)
    occ[hit] = 1
    n_occ = np.zeros(len(dil), np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nk = (dtx + dx) * (1 << 32) + (dty + dy)
            pos = np.searchsorted(keys, nk)
            h = (pos < len(keys)) & \
                (keys[np.minimum(pos, len(keys) - 1)] == nk)
            n_occ += h
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(dtx), "tile_y": pa.array(dty),
        "occupied": pa.array(occ),
        "n_occ_neighbors": pa.array(n_occ),
        "eroded": pa.array(((occ == 1) & (n_occ == 8))
                           .astype(np.int64))}))


def quadtree_cells(ds, x_col: str = "x", y_col: str = "y",
                   zooms: tuple = (4, 6, 8), threshold: int = 3,
                   max_broadcast_tiles: int = 50_000_000):
    """Adaptive quadtree aggregation (the vector-tile generalization
    op): every point is assigned to the COARSEST cell of the zoom
    ladder whose total count is ≤ ``threshold`` (the finest level
    takes whatever remains, however large). Because all points of a
    finer tile share their ancestors' counts, the output is a set of
    CELLS: a level-z cell appears iff its count fits the threshold
    (or z is the finest) and every coarser ancestor's count does not.
    Output (z, tile_x, tile_y, n_pts), all int64.

    Shape: the shared _tile_counts collect at the FINEST zoom
    (4^zoom bound), coarser levels derived by integer-shift
    aggregation on the driver arrays — points are shuffled once."""
    import ray.data

    zs = sorted(int(z) for z in zooms)
    zf = zs[-1]
    keys, cnts = _tile_counts(ds, x_col, y_col, zf,
                              max_broadcast_tiles)
    if len(keys) == 0:
        return ray.data.from_arrow(pa.table({
            k: pa.array([], pa.int64())
            for k in ("z", "tile_x", "tile_y", "n_pts")}))
    tx = keys // (1 << 32)
    ty = keys % (1 << 32)
    # per-level (key -> count) tables, finest first
    lvl = {zf: (keys, cnts)}
    for z in reversed(zs[:-1]):
        # aggregate from the next finer level present
        fz = min(k for k in lvl if k > z)
        fk, fc = lvl[fz]
        s = 1 << (fz - z)
        ck = (fk // (1 << 32)) // s * (1 << 32) + (fk % (1 << 32)) // s
        uq, inv = np.unique(ck, return_inverse=True)
        cs = np.zeros(len(uq), np.int64)
        np.add.at(cs, inv, fc)
        lvl[z] = (uq, cs)
    out_z, out_x, out_y, out_n = [], [], [], []
    # a level-z cell emits iff its count <= T (or z == finest) AND
    # every coarser ancestor count > T
    for i, z in enumerate(zs):
        k, c = lvl[z]
        anc_over = np.ones(len(k), bool)
        for za in zs[:i]:
            ak, ac = lvl[za]
            s = 1 << (z - za)
            ck = (k // (1 << 32)) // s * (1 << 32) + \
                (k % (1 << 32)) // s
            pos = np.searchsorted(ak, ck)
            anc_over &= ac[np.minimum(pos, len(ak) - 1)] > threshold
        # finest level takes whatever its ancestors rejected,
        # regardless of its own count
        keep = anc_over if z == zf else (c <= threshold) & anc_over
        kk = k[keep]
        out_z.append(np.full(keep.sum(), z, np.int64))
        out_x.append(kk // (1 << 32))
        out_y.append(kk % (1 << 32))
        out_n.append(c[keep])
    return ray.data.from_arrow(pa.table({
        "z": pa.array(np.concatenate(out_z)),
        "tile_x": pa.array(np.concatenate(out_x)),
        "tile_y": pa.array(np.concatenate(out_y)),
        "n_pts": pa.array(np.concatenate(out_n))}))


def contour_cases(ds, x_col: str = "x", y_col: str = "y",
                  zoom: int = 8, threshold: int = 2,
                  max_broadcast_tiles: int = 50_000_000):
    """Marching-squares case classification over the occupied tile
    lattice (the contour-extraction step of raster isoline
    generation): a 2×2 corner block anchored at (tx, ty) gets the
    4-bit case index with bit0=(tx,ty), bit1=(tx+1,ty),
    bit2=(tx+1,ty+1), bit3=(tx,ty+1) — the standard CCW corner
    order — where a corner is "inside" iff its tile exists AND its
    point count ≥ ``threshold``. Only blocks with ≥1 inside corner
    are emitted (case 0 blocks are the empty plane). Output
    (tile_x, tile_y, mcase), all int64."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    inside = cnts >= threshold
    ik = keys[inside]
    if len(ik) == 0:
        return ray.data.from_arrow(pa.table({
            k: pa.array([], pa.int64())
            for k in ("tile_x", "tile_y", "mcase")}))
    itx, ity = ik // (1 << 32), ik % (1 << 32)
    # candidate anchors: every block having at least one inside
    # corner = inside corners shifted by the 4 corner offsets.
    # Anchors can sit at coordinate −1, so they are packed with a +1
    # OFFSET — a negative tile_y in the plain packing would bleed
    # into the previous column's key range and decode wrongly.
    corners = ((0, 0), (1, 0), (1, 1), (0, 1))
    anchors = np.unique(np.concatenate(
        [(itx - dx + 1) * (1 << 32) + (ity - dy + 1)
         for dx, dy in corners]))
    atx = anchors // (1 << 32) - 1
    aty = anchors % (1 << 32) - 1
    case = np.zeros(len(anchors), np.int64)
    for bit, (dx, dy) in enumerate(corners):
        ck = (atx + dx) * (1 << 32) + (aty + dy)
        pos = np.searchsorted(ik, ck)
        hit = (pos < len(ik)) & (ik[np.minimum(pos, len(ik) - 1)]
                                 == ck)
        case |= hit.astype(np.int64) << bit
    keep = case > 0
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(atx[keep]), "tile_y": pa.array(aty[keep]),
        "mcase": pa.array(case[keep])}))


def tile_distance_transform(ds, x_col: str = "x", y_col: str = "y",
                            zoom: int = 8, radius: int = 3,
                            max_broadcast_tiles: int = 50_000_000):
    """Bounded Chebyshev distance transform over the occupied tile
    lattice (the raster proximity op): every in-range tile within
    ``radius`` of an occupied tile gets the distance to its nearest
    occupied tile (0 for occupied tiles themselves); farther tiles
    are absent (unbounded transforms don't stream). Output
    (tile_x, tile_y, dist), int64.

    Shape: _tile_counts collect (4^zoom bound) + (2r+1)² vectorized
    shift-membership passes — no per-tile Python."""
    import ray.data

    keys, _cnts = _tile_counts(ds, x_col, y_col, zoom,
                               max_broadcast_tiles)
    side = 1 << zoom
    if len(keys) == 0:
        return ray.data.from_arrow(pa.table({
            k: pa.array([], pa.int64())
            for k in ("tile_x", "tile_y", "dist")}))
    tx, ty = keys // (1 << 32), keys % (1 << 32)
    shifted = []
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            nx, ny = tx + dx, ty + dy
            m = (nx >= 0) & (nx < side) & (ny >= 0) & (ny < side)
            # +radius offset pack: shifted coords stay non-negative
            shifted.append((nx[m] + radius) * (1 << 32)
                           + (ny[m] + radius))
    cand = np.unique(np.concatenate(shifted))
    ctx = cand // (1 << 32) - radius
    cty = cand % (1 << 32) - radius
    dist = np.full(len(cand), radius + 1, np.int64)
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            ck = (ctx + dx) * (1 << 32) + (cty + dy)
            pos = np.searchsorted(keys, ck)
            hit = (pos < len(keys)) & \
                (keys[np.minimum(pos, len(keys) - 1)] == ck)
            d = max(abs(dx), abs(dy))
            dist[hit] = np.minimum(dist[hit], d)
    keep = dist <= radius
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(ctx[keep]), "tile_y": pa.array(cty[keep]),
        "dist": pa.array(dist[keep])}))


def focal_smooth_tiles(ds, x_col: str = "x", y_col: str = "y",
                       zoom: int = 8, radius: int = 2,
                       max_broadcast_tiles: int = 50_000_000):
    """Integer triangular-kernel focal smoothing (the raster
    low-pass / KDE-on-a-lattice op, exact form): per occupied tile,

        smooth = sum over |dx|,|dy| <= r of
                 (r+1-|dx|)·(r+1-|dy|)·count(tile+d)

    plus the kernel mass actually hit (wsum) so callers can form the
    normalized estimate; both int64 (no float division — the same
    cross-multiply discipline as PerceptualHash). Missing neighbors
    contribute 0 but NOT to wsum (occupied-support normalization).
    One _tile_counts collect + (2r+1)² vectorized shifted
    searchsorted gathers."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    if len(keys) == 0:
        return ray.data.from_arrow(pa.table({
            "tile_x": pa.array([], pa.int64()),
            "tile_y": pa.array([], pa.int64()),
            "smooth": pa.array([], pa.int64()),
            "wsum": pa.array([], pa.int64())}))
    n = len(keys)
    tx, ty = keys // (1 << 32), keys % (1 << 32)
    smooth = np.zeros(n, np.int64)
    wsum = np.zeros(n, np.int64)
    r = radius
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            w = (r + 1 - abs(dx)) * (r + 1 - abs(dy))
            nk = (tx + dx) * (1 << 32) + (ty + dy)
            pos = np.searchsorted(keys, nk)
            hit = (pos < n) & (keys[np.minimum(pos, n - 1)] == nk)
            v = cnts[np.minimum(pos, n - 1)]
            smooth += np.where(hit, v * w, 0)
            wsum += np.where(hit, w, 0)
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(tx), "tile_y": pa.array(ty),
        "smooth": pa.array(smooth), "wsum": pa.array(wsum)}))


def tile_rank_equalize(ds, x_col: str = "x", y_col: str = "y",
                       zoom: int = 8,
                       max_broadcast_tiles: int = 50_000_000):
    """Histogram-equalization ranks over the occupied lattice: per
    tile its DENSE RANK by count (1 = sparsest), the number of
    distinct count levels, and the count of strictly-darker occupied
    tiles (the classic CDF numerator) — the integer core of raster
    contrast stretching, exactly reproducible in SQL windows."""
    import ray.data

    keys, cnts = _tile_counts(ds, x_col, y_col, zoom,
                              max_broadcast_tiles)
    if len(keys) == 0:
        return ray.data.from_arrow(pa.table({
            "tile_x": pa.array([], pa.int64()),
            "tile_y": pa.array([], pa.int64()),
            "rnk": pa.array([], pa.int64()),
            "n_levels": pa.array([], pa.int64()),
            "n_darker": pa.array([], pa.int64())}))
    tx, ty = keys // (1 << 32), keys % (1 << 32)
    levels, inv = np.unique(cnts, return_inverse=True)
    counts_per_level = np.bincount(inv)
    darker = np.concatenate(([0], np.cumsum(counts_per_level)[:-1]))
    return ray.data.from_arrow(pa.table({
        "tile_x": pa.array(tx), "tile_y": pa.array(ty),
        "rnk": pa.array((inv + 1).astype(np.int64)),
        "n_levels": pa.array(
            np.full(len(keys), len(levels), np.int64)),
        "n_darker": pa.array(darker[inv].astype(np.int64))}))
