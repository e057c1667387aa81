"""Cell-keyed kNN — the scale path when the neighbor corpus is too large
to broadcast (SURVEY.md §2.4: per-cell candidate generation with ring
expansion, exact great-circle top-k refinement).

Algorithm:
 1. neighbors → (cell, neighbor) rows at grid resolution `res`
 2. probes → one row per (cell ∈ ring-`disk` neighborhood of the probe's
    cell, probe)  — ring chosen so the disk covers ≥ k neighbors with
    high probability for the corpus density; probes whose disk finds
    fewer than k matches are re-run at a wider ring (driver-side second
    pass over the — typically tiny — remainder)
 3. hash `Dataset.join` on cell → candidate pairs (never the full cross
    product)
 4. per-batch exact distance, then `groupby(probe).map_groups` top-k

Partitioning assumption (documented per SURVEY §2 custom-operator rule):
neighbor density is roughly uniform at the chosen cell resolution; the
hot-cell salting of celljoin.py applies unchanged if it is not.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..cells import grid
from ..geom.greatcircle import vincenty_sphere_m


def _ring_cells(cells: np.ndarray, disk: int):
    """(row_idx, cell) pairs for the (2*disk+1)² cell neighborhood."""
    res = (cells >> np.uint64(56)).astype(np.int64)
    ix = ((cells >> np.uint64(28)) & np.uint64((1 << 28) - 1)).astype(np.int64)
    iy = (cells & np.uint64((1 << 28) - 1)).astype(np.int64)
    offs = np.array([(dx, dy) for dx in range(-disk, disk + 1)
                     for dy in range(-disk, disk + 1)], dtype=np.int64)
    n = len(cells)
    k = len(offs)
    row = np.repeat(np.arange(n, dtype=np.int64), k)
    nix = (ix[:, None] + offs[None, :, 0]).ravel()
    niy = (iy[:, None] + offs[None, :, 1]).ravel()
    nres = np.repeat(res, k)
    step = 36.0 / (np.int64(1) << nres)
    nx = np.ceil(360.0 / step).astype(np.int64)
    ny = np.ceil(180.0 / step).astype(np.int64)
    nix = nix % nx
    ok = (niy >= 0) & (niy < ny)
    out_cells = ((nres.astype(np.uint64) << np.uint64(56))
                 | (nix.astype(np.uint64) << np.uint64(28))
                 | niy.astype(np.uint64))
    return row[ok], out_cells[ok]


def _knn_one_pass(probes_ds, nbrs, k, disk, res, probe_key, neighbor_key,
                  x_col, y_col, num_partitions):
    """One cell-disk kNN pass: ring-expand probes, hash-join on cell,
    exact distance, per-probe top-k. Returns a lazy Dataset
    (probe_key, neighbor_key, dist_m, rank)."""

    def probe_prep(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cells = grid.lonlat_to_grid(x, y, res)
        row, ring = _ring_cells(cells, disk)
        take = pa.array(row, type=pa.int64())
        return pa.table({
            "cell": pa.array(ring.view(np.int64)),
            probe_key: batch.column(probe_key).take(take),
            "px": pa.array(x[row]), "py": pa.array(y[row])})

    probes = probes_ds.map_batches(probe_prep, batch_format="pyarrow")
    pairs = probes.join(nbrs, join_type="inner",
                        num_partitions=num_partitions, on=("cell",))

    def score(batch: pa.Table) -> pa.Table:
        px = batch.column("px").to_numpy(zero_copy_only=False)
        py = batch.column("py").to_numpy(zero_copy_only=False)
        nx = batch.column("nx").to_numpy(zero_copy_only=False)
        ny = batch.column("ny").to_numpy(zero_copy_only=False)
        d = vincenty_sphere_m(px, py, nx, ny)
        # carry the probe latitude so the widening loop can evaluate the
        # coverage guarantee per probe (it shrinks with cos(lat))
        return pa.table({probe_key: batch.column(probe_key),
                         neighbor_key: batch.column(neighbor_key),
                         "dist_m": pa.array(d),
                         "py": batch.column("py")})

    scored = pairs.map_batches(score, batch_format="pyarrow")

    def topk(group: pa.Table) -> pa.Table:
        d = group.column("dist_m").to_numpy(zero_copy_only=False)
        ids = group.column(neighbor_key).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, d))[:k]
        t = group.take(pa.array(order, type=pa.int64()))
        # n_cands (candidates found in the disk, pre-top-k) lets the
        # widening loop decide convergence from a single result scan —
        # no extra hash aggregate per round (see _retry_probe_keys)
        t = t.append_column("rank", pa.array(
            np.arange(1, len(order) + 1, dtype=np.int32)))
        return t.append_column("n_cands", pa.array(
            np.full(len(order), group.num_rows, dtype=np.int64)))

    return scored.groupby(probe_key).map_groups(topk, batch_format="pyarrow")


def _retry_probe_keys(result, probes_ds, k, probe_key,
                      guard_fn, cap: int | None = None):
    """Probe keys needing a wider-disk retry, computed from ONE scan of
    the (≤ k rows/probe) annotated result: short = rank==1 row with
    n_cands<k; unguaranteed = max-dist row (rank==n_cands, capped at k)
    failing ``guard_fn(dist_m, py) -> bool mask``. Probes with ZERO
    candidates are absent from the result entirely — detected by
    comparing the result's rank==1 row count against the probe count
    (cheap), falling back to the distributed probes∪result aggregate of
    _short_probe_keys only when they exist (rare: a disk with no
    neighbors at all).

    ``cap`` bounds the driver-resident key collection (8 B/key):
    returns None as soon as more than ``cap`` keys are flagged, telling
    the caller to run the widening round in distributed join mode
    (_retry_keys_ds + partitioned_key_filter) instead — the same
    max_broadcast escape-hatch pattern as every other driver touchpoint
    (text/dedup.py, join/semijoin.py)."""
    flagged = []
    n_flagged = 0
    n_rank1 = 0
    for b in result.iter_batches(batch_format="pyarrow",
                                 batch_size=65536):
        if b.num_rows == 0 or probe_key not in b.schema.names:
            continue
        hit, r1 = _flag_batch(b, k, probe_key, guard_fn)
        n_rank1 += r1
        if hit is not None:
            flagged.append(hit)
            n_flagged += len(hit)
            if cap is not None and n_flagged > cap:
                return None
    out = (np.unique(np.concatenate(flagged)) if flagged
           else np.empty(0, dtype=np.int64))
    if n_rank1 != probes_ds.count():
        # zero-candidate probes exist — find them distributedly
        out = np.union1d(out,
                         _short_probe_keys(result, probes_ds, k,
                                           probe_key))
        if cap is not None and len(out) > cap:
            return None
    return out


def _flag_batch(b: pa.Table, k, probe_key, guard_fn):
    """Per-batch retry-flag kernel shared by the driver scan and the
    distributed key map: returns (flagged int64 keys or None, rank-1
    row count)."""
    rank = b.column("rank").to_numpy(zero_copy_only=False)
    nc = b.column("n_cands").to_numpy(zero_copy_only=False)
    d = b.column("dist_m").to_numpy(zero_copy_only=False)
    keys = b.column(probe_key).to_numpy(zero_copy_only=False)
    r1 = rank == 1
    short = r1 & (nc < k)
    last = rank == np.minimum(nc, k)
    py = (b.column("py").to_numpy(zero_copy_only=False)
          if "py" in b.schema.names else None)
    over = last & guard_fn(d, py)
    hit = short | over
    return (keys[hit].astype(np.int64) if hit.any() else None,
            int(r1.sum()))


def _retry_keys_ds(result, probes_ds, k, probe_key, guard_fn):
    """Distributed twin of _retry_probe_keys for retry sets too large
    to broadcast: Dataset of (possibly duplicate) probe keys needing a
    retry — the guard/short flags mapped over the result union the
    <k-result-row probes from the probes∪result contribution aggregate
    (which also catches zero-candidate probes absent from the result).
    Consumers: partitioned_key_filter (anti is duplicate-safe; semi
    passes keys_unique=False)."""

    def flag(batch: pa.Table) -> pa.Table:
        hit, _ = _flag_batch(batch, k, probe_key, guard_fn)
        if hit is None:
            hit = np.empty(0, np.int64)
        return pa.table({probe_key: pa.array(hit)})

    def mark0(batch: pa.Table) -> pa.Table:
        return pa.table({probe_key: batch.column(probe_key),
                         "contrib": pa.array(
                             np.zeros(batch.num_rows, dtype=np.int64))})

    def mark1(batch: pa.Table) -> pa.Table:
        return pa.table({probe_key: batch.column(probe_key),
                         "contrib": pa.array(
                             np.ones(batch.num_rows, dtype=np.int64))})

    marks = probes_ds.map_batches(mark0, batch_format="pyarrow").union(
        result.map_batches(mark1, batch_format="pyarrow"))
    counts = marks.groupby(probe_key).sum("contrib")

    def shorts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sum(contrib)" not in batch.schema.names:
            return pa.table({probe_key: pa.array([], type=pa.int64())})
        c = batch.column("sum(contrib)").to_numpy(zero_copy_only=False)
        return pa.table({probe_key: batch.filter(
            pa.array(c < k)).column(probe_key)})

    return result.map_batches(flag, batch_format="pyarrow").union(
        counts.map_batches(shorts, batch_format="pyarrow"))


def _widen_join_mode(result, probes_ds, k, probe_key, guard_fn,
                     num_partitions):
    """One widening round's retry-subset / kept-result split in
    distributed join mode (retry set too large to broadcast).
    Returns (retry_probes, kept_result), or (None, None) when no probe
    needs a retry."""
    from .semijoin import drop_schemaless_blocks, partitioned_key_filter
    keys_ds = _retry_keys_ds(result, probes_ds, k, probe_key,
                             guard_fn).materialize()
    if keys_ds.count() == 0:
        return None, None
    sub = partitioned_key_filter(probes_ds, keys_ds, probe_key,
                                 keys_unique=False,
                                 num_partitions=num_partitions)
    # result is a map_groups lineage → sanitize its 0-column empty
    # blocks before it becomes a join side (semijoin.py helper doc)
    clean, keep = drop_schemaless_blocks(result)
    if clean is None:
        return sub, None
    kept = partitioned_key_filter(clean, keys_ds, probe_key,
                                  anti=True,
                                  num_partitions=num_partitions)
    kept._geoflow_keepalive = keep
    return sub, kept


def _short_probe_keys(result, probes_ds, k, probe_key) -> np.ndarray:
    """Probe keys with fewer than k result rows (including probes with
    ZERO candidates, which are absent from `result` entirely): union
    0-contribution markers from the probe set with 1-contribution rows
    from the result, sum per probe, keep sums < k. Output is one row per
    short probe — the 'typically tiny remainder'."""

    def mark0(batch: pa.Table) -> pa.Table:
        return pa.table({probe_key: batch.column(probe_key),
                         "contrib": pa.array(
                             np.zeros(batch.num_rows, dtype=np.int64))})

    def mark1(batch: pa.Table) -> pa.Table:
        return pa.table({probe_key: batch.column(probe_key),
                         "contrib": pa.array(
                             np.ones(batch.num_rows, dtype=np.int64))})

    marks = probes_ds.map_batches(mark0, batch_format="pyarrow").union(
        result.map_batches(mark1, batch_format="pyarrow"))
    counts = marks.groupby(probe_key).sum("contrib")

    def shorts(batch: pa.Table) -> pa.Table:
        c = batch.column("sum(contrib)").to_numpy(zero_copy_only=False)
        return batch.select([probe_key]).filter(pa.array(c < k))

    out = counts.map_batches(shorts, batch_format="pyarrow").take_all()
    return np.array([r[probe_key] for r in out], dtype=np.int64)


_M_PER_DEG = math.pi / 180.0 * 6371008.7714


def _collect_probe_subset(probes_ds, only_short):
    """Materialize the (tiny) short-probe subset into ONE well-formed
    arrow block. A lazy filter leaves zero-row blocks with degraded
    schemas in the stream, and Ray's join planner races on the first
    bundle's schema ('No match for key field cell') — a single compact
    block sidesteps that entirely and avoids re-reading the probe
    lineage inside the retry."""
    import ray
    parts = []
    for b in probes_ds.map_batches(only_short,
                                   batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if b.num_rows:
            parts.append(b)
    if not parts:
        return None
    return ray.data.from_arrow(pa.concat_tables(parts))


def knn_cell_join(probes_ds, neighbors_ds, k=5, res=5, disk=1,
                  probe_key="doc_id", neighbor_key="neighbor_id",
                  x_col="x", y_col="y", num_partitions=None,
                  max_widen=2, max_broadcast_retry=4_000_000):
    """Returns Dataset (probe_key, neighbor_id, rank, dist_m) with the
    probe's k nearest among neighbors found in its cell disk.

    `res`/`disk` size the candidate pool: at res 5 a cell is ~1.1°; a
    3×3 disk covers ~11°² — pick so expected neighbors-per-disk ≫ k.

    Probes whose disk finds fewer than k matches (including zero) are
    re-run up to `max_widen` times at a 3×-wider disk each time (the
    under-filled remainder is found distributedly, then only its keys are
    collected — assumed small per the uniform-density partitioning
    assumption; probe keys must be int64). After the final widening,
    still-short probes keep whatever neighbors exist (a sparse corpus may
    simply hold fewer than k). Note: the first pass is materialized to
    drive the retry decision, so this operator is eager, with output-sized
    (≤ k rows/probe) memory in the object store."""
    if num_partitions is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))

    def nbr_prep(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cells = grid.lonlat_to_grid(x, y, res)
        return pa.table({
            "cell": pa.array(cells.view(np.int64)),
            neighbor_key: batch.column(neighbor_key),
            "nx": pa.array(x), "ny": pa.array(y)})

    # keyed neighbor corpus is reused by every widening pass — materialize
    # once instead of re-executing the upstream lineage per pass
    nbrs = neighbors_ds.map_batches(
        nbr_prep, batch_format="pyarrow").materialize()
    # probe set is re-read per round (retry-decision count + short-probe
    # subset); materialize once instead of re-executing its lineage
    probes_ds = probes_ds.materialize()

    result = _knn_one_pass(probes_ds, nbrs, k, disk, res, probe_key,
                           neighbor_key, x_col, y_col,
                           num_partitions).materialize()
    wide = disk
    spacing_deg = 36.0 / (1 << res)
    nx_cols = math.ceil(360.0 / spacing_deg)
    for _ in range(max_widen):
        # Latitude-aware exactness criterion for the degree-grid disk:
        # a (2w+1)² disk of spacing-s cells around the probe's cell
        # contains every point within ground distance D iff the point's
        # cell is ≤ w rows AND ≤ w columns away. Row bound: |Δlat| <
        # w·s. Column bound: max longitude excursion within angular
        # distance θ from latitude φ is asin(sinθ/cosφ) ≤ w·s whenever
        # θ ≤ w·s·cos(|φ|+w·s)  (since ws·cos(φ+ws) ≤ cosφ·sin(ws) ⇒
        # sinθ/cosφ ≤ θ/cosφ ≤ sin(ws)). Hence per-probe guarantee
        #   guard(φ) = w·s·cos(min(|φ|+w·s, 90°)) · m-per-deg,
        # 0 at/near the poles → polar probes retried unconditionally.
        # Once the disk wraps every longitude column (2w+1 ≥ n_cols)
        # only the row bound remains: guard = w·s·m-per-deg, which also
        # covers pole-crossing paths (all longitudes present). Probes
        # whose k-th distance meets/exceeds their guard are flagged.
        def grid_guard(d, py, _w=wide):
            base_m = _w * spacing_deg * _M_PER_DEG
            if (2 * _w + 1) >= nx_cols:
                return d >= base_m
            band = np.minimum(np.abs(py) + _w * spacing_deg, 90.0)
            guard = base_m * np.maximum(np.cos(np.radians(band)), 0.0)
            return d >= guard

        short = _retry_probe_keys(result, probes_ds, k, probe_key,
                                  grid_guard, cap=max_broadcast_retry)
        if short is None:  # retry set over the broadcast cap: join mode
            sub, kept = _widen_join_mode(result, probes_ds, k,
                                         probe_key, grid_guard,
                                         num_partitions)
            if sub is None:
                break
            wide = wide * 3 + 1
            retry = _knn_one_pass(
                sub, nbrs, k, wide, res, probe_key, neighbor_key,
                x_col, y_col, num_partitions)
            result = (retry if kept is None
                      else kept.union(retry)).materialize()
            continue
        if len(short) == 0:
            break
        wide = wide * 3 + 1
        sub = _collect_probe_subset(probes_ds, _key_filter(
            probe_key, short, keep=True))
        if sub is None:
            break
        retry = _knn_one_pass(
            sub, nbrs, k, wide, res, probe_key, neighbor_key, x_col,
            y_col, num_partitions)
        result = result.map_batches(
            _key_filter(probe_key, short, keep=False),
            batch_format="pyarrow").union(retry).materialize()
    return result.drop_columns(["py", "n_cands"])


def _key_filter(probe_key, keys: np.ndarray, keep: bool):
    """Vectorized batch filter on int64 key membership."""
    keys = np.sort(keys.astype(np.int64))

    def fn(batch: pa.Table) -> pa.Table:
        kv = batch.column(probe_key).to_numpy(
            zero_copy_only=False).astype(np.int64)
        mask = np.isin(kv, keys)
        return batch.filter(pa.array(mask if keep else ~mask))

    return fn


def _knn_h3_one_pass(probes_ds, nbrs, k, disk, res, probe_key,
                     neighbor_key, x_col, y_col, num_partitions):
    """One H3-keyed kNN pass: probes expand to their grid_disk_cells
    ball, hash-join on the H3 cell, exact distance, per-probe top-k."""
    from ..cells import h3

    def probe_prep(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        row, cells = h3.grid_disk_cells(x, y, disk, res)
        take = pa.array(row, type=pa.int64())
        return pa.table({
            "cell": pa.array(cells.view(np.int64)),
            probe_key: batch.column(probe_key).take(take),
            "px": pa.array(x[row]), "py": pa.array(y[row])})

    probes = probes_ds.map_batches(probe_prep, batch_format="pyarrow")
    pairs = probes.join(nbrs, join_type="inner",
                        num_partitions=num_partitions, on=("cell",))

    def score(batch: pa.Table) -> pa.Table:
        px = batch.column("px").to_numpy(zero_copy_only=False)
        py = batch.column("py").to_numpy(zero_copy_only=False)
        nx = batch.column("nx").to_numpy(zero_copy_only=False)
        ny = batch.column("ny").to_numpy(zero_copy_only=False)
        d = vincenty_sphere_m(px, py, nx, ny)
        return pa.table({probe_key: batch.column(probe_key),
                         neighbor_key: batch.column(neighbor_key),
                         "dist_m": pa.array(d)})

    scored = pairs.map_batches(score, batch_format="pyarrow")

    def topk(group: pa.Table) -> pa.Table:
        d = group.column("dist_m").to_numpy(zero_copy_only=False)
        ids = group.column(neighbor_key).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, d))[:k]
        t = group.take(pa.array(order, type=pa.int64()))
        t = t.append_column("rank", pa.array(
            np.arange(1, len(order) + 1, dtype=np.int32)))
        return t.append_column("n_cands", pa.array(
            np.full(len(order), group.num_rows, dtype=np.int64)))

    return scored.groupby(probe_key).map_groups(topk, batch_format="pyarrow")


def knn_h3_join(probes_ds, neighbors_ds, k=5, res=7, disk=2,
                probe_key="doc_id", neighbor_key="neighbor_id",
                x_col="x", y_col="y", num_partitions=None, max_widen=2,
                max_broadcast_retry=4_000_000):
    """H3-keyed kNN (the north-star 'nearby via H3 grid_disk' shape):
    neighbors keyed by H3 res cell; probes expand to the ball of `disk`
    cell-spacings via grid_disk_cells; hash join on the cell, exact
    great-circle top-k; under-filled probes retried at 2× wider disks
    (same contract as knn_cell_join). Partitioning assumption: neighbor
    density roughly uniform at the chosen res."""
    from ..cells import h3
    if num_partitions is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))

    def nbr_prep(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cells = h3.lonlat_to_cell(x, y, res)
        return pa.table({
            "cell": pa.array(cells.view(np.int64)),
            neighbor_key: batch.column(neighbor_key),
            "nx": pa.array(x), "ny": pa.array(y)})

    nbrs = neighbors_ds.map_batches(
        nbr_prep, batch_format="pyarrow").materialize()
    probes_ds = probes_ds.materialize()

    result = _knn_h3_one_pass(probes_ds, nbrs, k, disk, res, probe_key,
                              neighbor_key, x_col, y_col,
                              num_partitions).materialize()
    wide = disk
    from ..cells.h3 import M_SQRT7, RES0_U_GNOMONIC
    spacing_deg = math.degrees(math.atan(RES0_U_GNOMONIC / M_SQRT7 ** res))
    for _ in range(max_widen):
        # Coverage guarantee for the GEOGRAPHIC sample ball of radius
        # wide·spacing: a point q at distance D from the probe lies in a
        # sampled cell when a sampler-hit disk (radius 0.283·s for the
        # 0.4·s grid_disk_cells step) centered at q's cell center fits
        # inside the ball: D + circumradius + 0.283·s ≤ wide·s. With
        # `spacing` the face-center (maximum — gnomonic sphere scale
        # cos²(r) ≤ 1 only shrinks cells off-center) spacing,
        # circumradius ≤ 0.578·s → D ≤ (wide − 0.87)·s, so (wide−1)·s
        # is a valid guard; the 0.283·s hit radius also reaches the
        # SMALLEST (vertex-distorted ×0.63 → inradius 0.315·s) cells,
        # so no distortion derate is needed at either end.
        guard_m = max(0.0, (wide - 1) * spacing_deg) * _M_PER_DEG

        def h3_guard(d, py, _g=guard_m):
            return d > _g

        short = _retry_probe_keys(result, probes_ds, k, probe_key,
                                  h3_guard, cap=max_broadcast_retry)
        if short is None:  # retry set over the broadcast cap: join mode
            sub, kept = _widen_join_mode(result, probes_ds, k,
                                         probe_key, h3_guard,
                                         num_partitions)
            if sub is None:
                break
            wide = wide * 2 + 1
            retry = _knn_h3_one_pass(
                sub, nbrs, k, wide, res, probe_key, neighbor_key,
                x_col, y_col, num_partitions)
            result = (retry if kept is None
                      else kept.union(retry)).materialize()
            continue
        if len(short) == 0:
            break
        wide = wide * 2 + 1
        sub = _collect_probe_subset(probes_ds, _key_filter(
            probe_key, short, keep=True))
        if sub is None:
            break
        retry = _knn_h3_one_pass(
            sub, nbrs, k, wide, res, probe_key, neighbor_key, x_col,
            y_col, num_partitions)
        result = result.map_batches(
            _key_filter(probe_key, short, keep=False),
            batch_format="pyarrow").union(retry).materialize()
    return result.drop_columns(["n_cands"])
