"""Distributed DBSCAN over point columns — deterministic variant.

Neither Ray Data nor the reference has density clustering (the
reference's whole cluster surface is stubbed: geometry/ClusterKMeans
.java:15, geometry/ClusterWithin.java:14, geometry/ClusterIntersecting
.java:8 all raise UnsupportedOperationException); at corpus scale
DBSCAN is the standard "group nearby geometries" primitive, so it is
implemented here as a first-class operator.

Semantics (deterministic DBSCAN):
* ``|N_eps(p)| >= min_pts`` (count INCLUDES p, ``<= eps`` closed) makes
  p a CORE point.
* Core points within eps of each other share a cluster; the cluster id
  is the MINIMUM point key of the component (stable across runs and
  partitionings, unlike scan-order labels).
* A non-core point within eps of >=1 core point is a BORDER point and
  joins the minimum cluster id among its core neighbors (classic DBSCAN
  leaves border assignment scan-order dependent; taking the min makes
  the output a pure function of the input).
* Everything else is NOISE (cluster = -1).

Distributed shape (all stages streaming, no driver materialization of
points):
1. eps-grid: cell = (floor(x/eps), floor(y/eps)); every point is
   replicated to its 3x3 cell neighborhood (vectorized 9x repeat), so
   any two points within eps co-occur in each other's HOME cell.
   One groupby(cell) pass computes exact global neighbor counts.
2. A second cell pass (now with core flags riding the rows) emits
   core-core edges and border->core candidate edges; 16-byte rows.
3. Connected components by hash-to-min label propagation over the core
   edge set, with a pointer-jumping (label(label(k))) shortcut each
   round -> O(log diameter) rounds, each round = groupby shuffles over
   (key,label) pairs only. Labels are materialized per round (they are
   the only loop-carried state) and convergence is detected by the
   monotone label sum.

Partitioning assumptions: cell occupancy is bounded (the per-cell
kernel is O(|home| * |cell|) vectorized numpy); a pathological cell with
k points costs one k^2 distance matrix — chunked at ``chunk`` home rows
to bound memory. eps should be chosen so typical cells hold O(10-1000)
points; for heavily skewed data shrink eps-cells by salting (future
knob), exactly like hot-key salting in the cell join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OFF = np.int64(1) << np.int64(31)


def _pack_cell(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return ((cx + _OFF) << np.int64(32)) | (cy + _OFF)


def _replicate9(key, x, y, eps, extra=None):
    """9x neighbor-cell replication; returns dict of columns + home flag."""
    n = len(key)
    cx = np.floor(x / eps).astype(np.int64)
    cy = np.floor(y / eps).astype(np.int64)
    dx = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], dtype=np.int64)
    dy = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], dtype=np.int64)
    rep = np.repeat(np.arange(n), 9)
    cell = _pack_cell(cx[rep] + np.tile(dx, n), cy[rep] + np.tile(dy, n))
    home = np.tile((dx == 0) & (dy == 0), n)
    cols = {"cell": cell, "key": key[rep], "x": x[rep], "y": y[rep],
            "home": home}
    if extra is not None:
        for name, arr in extra.items():
            cols[name] = arr[rep]
    return cols


def _counts_pass(ds, eps: float, chunk: int = 4096):
    """(key, x, y, n_neighbors) — exact |N_eps| per point."""
    eps2 = eps * eps

    def replicate(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        c = _replicate9(key, x, y, eps)
        return pa.table({k: pa.array(v) for k, v in c.items()})

    def count(group: pa.Table) -> pa.Table:
        home = group.column("home").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        hp = np.nonzero(home)[0]
        if len(hp) == 0:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "x": pa.array([], type=pa.float64()),
                             "y": pa.array([], type=pa.float64()),
                             "n_neighbors": pa.array([], type=pa.int64())})
        counts = np.empty(len(hp), dtype=np.int64)
        for s in range(0, len(hp), chunk):
            h = hp[s:s + chunk]
            d2 = (x[h][:, None] - x[None, :]) ** 2 \
                + (y[h][:, None] - y[None, :]) ** 2
            counts[s:s + chunk] = (d2 <= eps2).sum(axis=1)
        return pa.table({"key": pa.array(key[hp]),
                         "x": pa.array(x[hp]), "y": pa.array(y[hp]),
                         "n_neighbors": pa.array(counts)})

    return ds.map_batches(replicate, batch_format="pyarrow") \
        .groupby("cell").map_groups(count, batch_format="pyarrow")


def _edges_pass(counted, eps: float, min_pts: int, chunk: int = 4096):
    """From (key,x,y,n_neighbors): emit
    - etype 0: core-core directed edges (a -> b, both directions overall)
    - etype 1: border->core candidate edges (a=border key, b=core key)
    - etype 2: noise markers (a=key, b=-1)
    - etype 3: isolated-core self rows (a=core key, b=a)"""
    eps2 = eps * eps

    def replicate(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        core = (batch.column("n_neighbors").to_numpy(zero_copy_only=False)
                >= min_pts)
        c = _replicate9(key, x, y, eps, extra={"core": core})
        return pa.table({k: pa.array(v) for k, v in c.items()})

    def edges(group: pa.Table) -> pa.Table:
        home = group.column("home").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        core = group.column("core").to_numpy(zero_copy_only=False)
        hp = np.nonzero(home)[0]
        ea, eb, et = [], [], []
        cp = np.nonzero(core)[0]
        for s in range(0, len(hp), chunk):
            h = hp[s:s + chunk]
            if len(cp):
                d2 = (x[h][:, None] - x[cp][None, :]) ** 2 \
                    + (y[h][:, None] - y[cp][None, :]) ** 2
                near = d2 <= eps2
            else:
                near = np.zeros((len(h), 0), dtype=bool)
            hcore = core[h]
            hckeys = key[h[hcore]]
            # home core -> core neighbors (excluding self); isolated
            # cores get an etype-3 self row so they still receive labels
            if near.shape[1]:
                nm = near[hcore] & (hckeys[:, None] != key[cp][None, :])
                ii, jj = np.nonzero(nm)
                ea.append(hckeys[ii]); eb.append(key[cp][jj])
                et.append(np.zeros(len(ii), dtype=np.int8))
                iso = hckeys[~nm.any(axis=1)]
            else:
                iso = hckeys
            ea.append(iso); eb.append(iso)
            et.append(np.full(len(iso), 3, dtype=np.int8))
            # home non-core: border (edges to ALL core neighbors) or noise
            hb = h[~hcore]
            if len(hb):
                nearb = near[~hcore]
                anyc = nearb.any(axis=1) if nearb.shape[1] else \
                    np.zeros(len(hb), dtype=bool)
                if nearb.shape[1]:
                    ii, jj = np.nonzero(nearb)
                    ea.append(key[hb][ii]); eb.append(key[cp][jj])
                    et.append(np.ones(len(ii), dtype=np.int8))
                nz = key[hb][~anyc]
                ea.append(nz); eb.append(np.full(len(nz), -1, np.int64))
                et.append(np.full(len(nz), 2, dtype=np.int8))
        if not ea:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "etype": pa.array([], type=pa.int8())})
        return pa.table({"a": pa.array(np.concatenate(ea)),
                         "b": pa.array(np.concatenate(eb)),
                         "etype": pa.array(np.concatenate(et))})

    return counted.map_batches(replicate, batch_format="pyarrow") \
        .groupby("cell").map_groups(edges, batch_format="pyarrow")


def _propagate_min(labels, cedges):
    """One hash-to-min round: label(k) <- min(label(k),
    min_{(k,b) in E} label(b)). Two 16-byte-row shuffles."""
    def tag_label(batch: pa.Table) -> pa.Table:
        return pa.table({"gk": batch.column("key"),
                         "other": pa.array(
                             np.full(batch.num_rows, -1, np.int64)),
                         "val": batch.column("label")})

    def tag_edge(batch: pa.Table) -> pa.Table:
        # deliver label(b) to a: group by b
        return pa.table({"gk": batch.column("b"),
                         "other": batch.column("a"),
                         "val": pa.array(
                             np.full(batch.num_rows, -1, np.int64))})

    def scatter(group: pa.Table) -> pa.Table:
        other = group.column("other").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        gk = group.column("gk").to_numpy(zero_copy_only=False)
        root = val[other == -1]
        lab = root.min()          # exactly one label row per core key
        dst = other[other != -1]
        keys = np.concatenate([dst, gk[:1]])
        labs = np.concatenate([np.full(len(dst), lab, np.int64), [lab]])
        return pa.table({"key": pa.array(keys), "label": pa.array(labs)})

    from ray.data.aggregate import Min
    msgs = labels.map_batches(tag_label, batch_format="pyarrow").union(
        cedges.map_batches(tag_edge, batch_format="pyarrow"))
    out = msgs.groupby("gk").map_groups(scatter, batch_format="pyarrow") \
        .groupby("key").aggregate(Min("label"))
    return out.map_batches(
        lambda b: pa.table({"key": b.column("key"),
                            "label": b.column("min(label)")}),
        batch_format="pyarrow")


def _shortcut(labels):
    """Pointer jumping: label(k) <- label(label(k)); halves chain depth
    per round (combined with propagation -> O(log diameter) rounds)."""
    def tag_root(batch: pa.Table) -> pa.Table:
        return pa.table({"gk": batch.column("key"),
                         "other": pa.array(
                             np.full(batch.num_rows, -1, np.int64)),
                         "val": batch.column("label")})

    def tag_ptr(batch: pa.Table) -> pa.Table:
        return pa.table({"gk": batch.column("label"),
                         "other": batch.column("key"),
                         "val": pa.array(
                             np.full(batch.num_rows, -1, np.int64))})

    def scatter(group: pa.Table) -> pa.Table:
        other = group.column("other").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        root = val[other == -1]
        lab = root.min()
        dst = other[other != -1]
        return pa.table({"key": pa.array(dst),
                         "label": pa.array(
                             np.full(len(dst), lab, np.int64))})

    msgs = labels.map_batches(tag_root, batch_format="pyarrow").union(
        labels.map_batches(tag_ptr, batch_format="pyarrow"))
    return msgs.groupby("gk").map_groups(scatter, batch_format="pyarrow")


def _cc_min_labels(a: np.ndarray, b: np.ndarray):
    """(nodes, label per node): connected components of the undirected
    edge list, label = min node key in the component. Vectorized numpy
    hash-to-min + pointer jumping; O((m+n) log n)."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[:len(a)], inv[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        la, lb = lab[ia], lab[ib]
        settled = np.array_equal(la, lb)   # every edge label-monochrome
        m = np.minimum(la, lb)
        np.minimum.at(lab, ia, m)
        np.minimum.at(lab, ib, m)
        nxt = lab[lab]                     # pointer jump (lab[k] <= k)
        if settled and np.array_equal(nxt, lab):
            break
        lab = nxt
    # nodes are sorted, so the min INDEX in a component is the min KEY
    return nodes, nodes[lab]


def _distributed_core_labels(all_edges, max_rounds: int):
    """(key, label) for every key appearing as an etype-0 edge source or
    an etype-3 self row: hash-to-min label propagation over the etype-0
    edge set with a pointer-jumping shortcut per round. O(log diameter)
    rounds of (key,label) 16-byte shuffles; convergence detected by the
    monotone label sum."""
    from ray.data.aggregate import Min

    def cedge_pick(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("etype"), pa.scalar(0, pa.int8()))
        return batch.filter(m).select(["a", "b"])

    cedges = all_edges.map_batches(cedge_pick, batch_format="pyarrow")

    def init_labels(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("etype"),
                     value_set=pa.array([0, 3], type=pa.int8()))
        sub = batch.filter(m)
        return pa.table({"key": sub.column("a"), "label": sub.column("a")})

    labels = all_edges.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("key").aggregate(Min("label")).map_batches(
            lambda b: pa.table({"key": b.column("key"),
                                "label": b.column("min(label)")}),
            batch_format="pyarrow").materialize()

    prev_sum = None
    for _ in range(max_rounds):
        labels = _propagate_min(labels, cedges)
        labels = _shortcut(labels).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        import logging
        logging.getLogger(__name__).warning(
            "label propagation hit max_rounds=%d before the monotone "
            "label sum stabilized; labels may be non-minimal", max_rounds)
    return labels


def _finish_driver(counted, all_edges, min_pts: int):
    """Driver-side CC + one distributed attach pass (no shuffles)."""
    et_l, a_l, b_l = [], [], []
    for blk in all_edges.iter_batches(batch_format="pyarrow"):
        et_l.append(blk.column("etype").to_numpy(zero_copy_only=False))
        a_l.append(blk.column("a").to_numpy(zero_copy_only=False))
        b_l.append(blk.column("b").to_numpy(zero_copy_only=False))
    et = np.concatenate(et_l) if et_l else np.empty(0, np.int8)
    a = np.concatenate(a_l) if a_l else np.empty(0, np.int64)
    b = np.concatenate(b_l) if b_l else np.empty(0, np.int64)
    cm = (et == 0) | (et == 3)
    nodes, labels = _cc_min_labels(a[cm], b[cm])
    # border: min core-label over each border key's core neighbors
    bm = et == 1
    bkeys_all = a[bm]
    blabels_all = labels[np.searchsorted(nodes, b[bm])]
    order = np.argsort(bkeys_all, kind="stable")
    bk_s, bl_s = bkeys_all[order], blabels_all[order]
    new = np.empty(len(bk_s), dtype=bool)
    if len(bk_s):
        new[0] = True
        new[1:] = bk_s[1:] != bk_s[:-1]
        bkeys = bk_s[new]
        blabels = np.minimum.reduceat(bl_s, np.nonzero(new)[0])
    else:
        bkeys = bk_s
        blabels = bl_s

    def attach(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        core = (batch.column("n_neighbors").to_numpy(zero_copy_only=False)
                >= min_pts)
        out = np.full(len(key), -1, dtype=np.int64)
        if len(nodes):
            pos = np.searchsorted(nodes, key)
            pos_c = np.clip(pos, 0, len(nodes) - 1)
            hit = core & (nodes[pos_c] == key)
            out[hit] = labels[pos_c[hit]]
        if len(bkeys):
            pos = np.searchsorted(bkeys, key)
            pos_c = np.clip(pos, 0, len(bkeys) - 1)
            hit = (~core) & (bkeys[pos_c] == key)
            out[hit] = blabels[pos_c[hit]]
        return pa.table({"key": pa.array(key),
                         "cluster": pa.array(out),
                         "is_core": pa.array(core)})

    return counted.map_batches(attach, batch_format="pyarrow")


def _min_k_rows(ds, k: int, key_col: str, cols):
    """The k rows with the smallest keys, without a global sort: per-batch
    local top-k (vectorized argpartition) -> driver reduce over k*nblocks
    candidate rows (tiny)."""
    def local(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        if len(key) > k:
            idx = np.argpartition(key, k - 1)[:k]
            batch = batch.take(pa.array(np.sort(idx)))
        return batch.select([key_col, *cols])

    cand = ds.map_batches(local, batch_format="pyarrow")
    t = pa.concat_tables(list(cand.iter_batches(batch_format="pyarrow")))
    order = np.argsort(t.column(key_col).to_numpy(zero_copy_only=False),
                       kind="stable")[:k]
    return t.take(pa.array(order))


def kmeans(ds, *, key_col: str = "key", x_col: str = "x", y_col: str = "y",
           k: int, iters: int = 2, scale: float | None = None,
           reduce_mode: str = "auto"):
    """Distributed Lloyd's k-means over 2-D points, fully deterministic
    (reference surface geometry/ClusterKMeans.java:15 is a stub, so the
    semantics are engine-defined and SQL-reproducible):

    * init: centroids = the ``k`` points with the SMALLEST keys, centroid
      id = rank of the key (0-based) — deterministic and expressible in
      SQL (``ORDER BY key LIMIT k``), unlike random/kmeans++ seeding.
    * each iteration: broadcast the k centroids into a map_batches
      assignment pass (vectorized argmin over the k-column distance
      matrix; ties -> lowest centroid id), accumulate per-batch partial
      (count, sum_x, sum_y) per centroid, reduce the k-row partials, and
      recompute centroids. An empty cluster keeps its previous centroid.
    * output: (key, cluster) after ``iters`` centroid updates (one final
      assignment pass against the last centroids).

    Exact cross-engine parity: when ``scale`` is given, ``x_col``/
    ``y_col`` must be int64 lattice coordinates with true coordinate
    v/scale; centroid updates then use INTEGER partial sums (order-
    independent, unlike float accumulation) and a single double division
    sum/(scale*count), so numpy and SQL produce bit-identical centroids
    and assignments. Without ``scale``, float sums are used and
    determinism holds per engine but not bit-exactly across engines.

    Scale shape: each iteration is one streaming pass; partials are k
    rows per block. ``reduce_mode='driver'`` (auto when blocks*k is
    small) streams the k-row partial tables to the driver; 'groupby' is
    the all-scale path (Ray's sort aggregate pre-combines per block, so
    the shuffle moves k rows per block and the result is k rows)."""
    if reduce_mode not in ("auto", "driver", "groupby"):
        raise ValueError("reduce_mode must be auto|driver|groupby")
    int_coords = scale is not None
    div = float(scale) if int_coords else 1.0

    def norm(batch: pa.Table) -> pa.Table:
        xt = pa.int64() if int_coords else pa.float64()
        return pa.table({
            "key": pc.cast(batch.column(key_col), pa.int64()),
            "xi": pc.cast(batch.column(x_col), xt),
            "yi": pc.cast(batch.column(y_col), xt)})

    pts = ds.map_batches(norm, batch_format="pyarrow").materialize()
    nblocks = pts.num_blocks()

    seed = _min_k_rows(pts, k, "key", ["xi", "yi"])
    if seed.num_rows < k:
        raise ValueError(f"kmeans: k={k} but only {seed.num_rows} points")
    sx = seed.column("xi").to_numpy(zero_copy_only=False).astype(np.float64)
    sy = seed.column("yi").to_numpy(zero_copy_only=False).astype(np.float64)
    cx, cy = sx / div, sy / div

    def coords(batch):
        xi = batch.column("xi").to_numpy(zero_copy_only=False)
        yi = batch.column("yi").to_numpy(zero_copy_only=False)
        return xi, yi, xi / div, yi / div

    def assign(x, y, cxa, cya):
        # (n,k) distance matrix; argmin takes the LOWEST index on ties
        d2 = (x[:, None] - cxa[None, :]) ** 2 + (y[:, None] - cya[None, :]) ** 2
        return np.argmin(d2, axis=1)

    sum_t = np.int64 if int_coords else np.float64
    for _ in range(iters):
        cxa, cya = cx.copy(), cy.copy()

        def partial(batch: pa.Table) -> pa.Table:
            xi, yi, x, y = coords(batch)
            a = assign(x, y, cxa, cya)
            n = np.bincount(a, minlength=k).astype(np.int64)
            sxp = np.zeros(k, dtype=sum_t)
            syp = np.zeros(k, dtype=sum_t)
            np.add.at(sxp, a, xi)
            np.add.at(syp, a, yi)
            return pa.table({"cid": pa.array(np.arange(k, dtype=np.int64)),
                             "n": pa.array(n), "sx": pa.array(sxp),
                             "sy": pa.array(syp)})

        part = pts.map_batches(partial, batch_format="pyarrow")
        if reduce_mode == "groupby" or (reduce_mode == "auto"
                                        and nblocks * k > 5_000_000):
            from ray.data.aggregate import Sum
            red = part.groupby("cid").aggregate(
                Sum("n"), Sum("sx"), Sum("sy"))
            rt = pa.concat_tables(
                list(red.iter_batches(batch_format="pyarrow")))
            cid = rt.column("cid").to_numpy(zero_copy_only=False)
            nn = np.zeros(k, np.int64)
            ssx = np.zeros(k, sum_t)
            ssy = np.zeros(k, sum_t)
            nn[cid] = rt.column("sum(n)").to_numpy(zero_copy_only=False)
            ssx[cid] = rt.column("sum(sx)").to_numpy(zero_copy_only=False)
            ssy[cid] = rt.column("sum(sy)").to_numpy(zero_copy_only=False)
        else:
            nn = np.zeros(k, np.int64)
            ssx = np.zeros(k, sum_t)
            ssy = np.zeros(k, sum_t)
            for blk in part.iter_batches(batch_format="pyarrow"):
                cid = blk.column("cid").to_numpy(zero_copy_only=False)
                np.add.at(nn, cid,
                          blk.column("n").to_numpy(zero_copy_only=False))
                np.add.at(ssx, cid,
                          blk.column("sx").to_numpy(zero_copy_only=False))
                np.add.at(ssy, cid,
                          blk.column("sy").to_numpy(zero_copy_only=False))
        live = nn > 0
        # single division sum/(scale*count): bit-identical to the SQL
        # form sum(xi)/(scale*count(*)) — no float accumulation anywhere
        cx = np.where(live, ssx.astype(np.float64) / (div * np.maximum(nn, 1)),
                      cxa)
        cy = np.where(live, ssy.astype(np.float64) / (div * np.maximum(nn, 1)),
                      cya)

    cxf, cyf = cx, cy

    def final(batch: pa.Table) -> pa.Table:
        _, _, x, y = coords(batch)
        return pa.table({"key": batch.column("key"),
                         "cluster": pa.array(
                             assign(x, y, cxf, cyf).astype(np.int64))})

    return pts.map_batches(final, batch_format="pyarrow")


def dbscan(ds, *, key_col: str = "key", x_col: str = "x", y_col: str = "y",
           eps: float, min_pts: int, max_rounds: int = 16,
           cc_mode: str = "auto", max_driver_edges: int = 2_000_000):
    """Returns a Dataset (key, cluster, is_core): deterministic DBSCAN
    as documented in the module docstring. ``cluster`` is the minimum
    member key of the component for core/border points, -1 for noise.

    Connected components run in one of two modes:
    * ``driver`` (auto-selected when the edge list fits
      ``max_driver_edges``): the core-graph EDGE LIST — metadata-sized
      relative to the corpus, same trade as the exact-dedup winner set
      (text/dedup.py) — is pulled to the driver and solved with a
      vectorized numpy hash-to-min + pointer-jumping loop, then labels
      are broadcast back into one attach pass. Zero per-round shuffles.
    * ``distributed``: hash-to-min label propagation with a
      pointer-jumping shortcut per round, all in (key,label) 16-byte
      shuffle rows. O(log diameter) rounds; each round costs a fixed
      multi-second Ray aggregate spin-up, so this path is for edge sets
      that genuinely cannot sit on one node."""
    from ray.data.aggregate import Min

    if cc_mode not in ("auto", "driver", "distributed"):
        raise ValueError("cc_mode must be auto|driver|distributed")

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(batch.column(key_col), pa.int64()),
            "x": pc.cast(batch.column(x_col), pa.float64()),
            "y": pc.cast(batch.column(y_col), pa.float64())})

    pts = ds.map_batches(norm, batch_format="pyarrow")
    # counted is consumed twice (edge pass + driver-mode attach pass);
    # two consumers of one lineage re-execute it, so materialize
    if min_pts <= 1:
        # every point is trivially core (|N| >= 1 includes self): skip
        # the neighbor-count shuffle entirely (cluster_within path)
        def const_count(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "n_neighbors",
                pa.array(np.ones(batch.num_rows, dtype=np.int64)))

        counted = pts.map_batches(const_count,
                                  batch_format="pyarrow").materialize()
    else:
        counted = _counts_pass(pts, eps).materialize()
    all_edges = _edges_pass(counted, eps, min_pts).materialize()

    if cc_mode == "driver" or (cc_mode == "auto"
                               and all_edges.count() <= max_driver_edges):
        return _finish_driver(counted, all_edges, min_pts)

    labels = _distributed_core_labels(all_edges, max_rounds)

    def pick(etypes):
        def f(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column("etype"),
                         value_set=pa.array(etypes, type=pa.int8()))
            return batch.filter(m).select(["a", "b"])
        return f

    # border resolution: min label among core neighbors
    def tag_core_label(batch: pa.Table) -> pa.Table:
        return pa.table({"gk": batch.column("key"),
                         "other": pa.array(
                             np.full(batch.num_rows, -1, np.int64)),
                         "val": batch.column("label")})

    def tag_border(batch: pa.Table) -> pa.Table:
        return pa.table({"gk": batch.column("b"),
                         "other": batch.column("a"),
                         "val": pa.array(
                             np.full(batch.num_rows, -1, np.int64))})

    def scatter(group: pa.Table) -> pa.Table:
        other = group.column("other").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        lab = val[other == -1].min()
        dst = other[other != -1]
        return pa.table({"key": pa.array(dst),
                         "cluster": pa.array(
                             np.full(len(dst), lab, np.int64))})

    bedges = all_edges.map_batches(pick([1]), batch_format="pyarrow")
    border = labels.map_batches(tag_core_label, batch_format="pyarrow") \
        .union(bedges.map_batches(tag_border, batch_format="pyarrow")) \
        .groupby("gk").map_groups(scatter, batch_format="pyarrow") \
        .groupby("key").aggregate(Min("cluster"))

    core_out = labels.map_batches(
        lambda b: pa.table({"key": b.column("key"),
                            "cluster": b.column("label"),
                            "is_core": pa.array(
                                np.ones(b.num_rows, dtype=bool))}),
        batch_format="pyarrow")
    border_out = border.map_batches(
        lambda b: pa.table({"key": b.column("key"),
                            "cluster": b.column("min(cluster)"),
                            "is_core": pa.array(
                                np.zeros(b.num_rows, dtype=bool))}),
        batch_format="pyarrow")

    def noise_out(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("etype"), pa.scalar(2, pa.int8()))
        sub = batch.filter(m)
        return pa.table({"key": sub.column("a"),
                         "cluster": pa.array(
                             np.full(sub.num_rows, -1, np.int64)),
                         "is_core": pa.array(
                             np.zeros(sub.num_rows, dtype=bool))})

    noise = all_edges.map_batches(noise_out, batch_format="pyarrow")
    return core_out.union(border_out).union(noise)


def cluster_within(ds, *, key_col: str = "key", x_col: str = "x",
                   y_col: str = "y", distance: float, **kw):
    """Single-linkage distance clustering: connected components of the
    pairwise <=distance graph, cluster = minimum member key (reference
    surface geometry/ClusterWithin.java:14 is a stub, so semantics are
    engine-defined). Equivalent to dbscan(eps=distance, min_pts=1) —
    every point is core, no border/noise cases — and implemented as that
    call: the min_pts<=1 fast path inside dbscan skips the
    neighbor-count shuffle, so this costs ONE cell-grouped pass plus the
    connected-components finish. Returns (key, cluster)."""
    res = dbscan(ds, key_col=key_col, x_col=x_col, y_col=y_col,
                 eps=distance, min_pts=1, **kw)
    return res.select_columns(["key", "cluster"])


def cluster_intersecting(ds, *, key_col: str = "key",
                         wkb_col: str = "geom_wkb", cell_size: float,
                         refine: bool = True, chunk: int = 2048,
                         cc_mode: str = "auto", max_rounds: int = 16,
                         max_driver_edges: int = 2_000_000):
    """Connected components of the st_intersects graph over a geometry
    column, cluster = minimum member key (reference surface
    geometry/ClusterIntersecting.java:8 is a stub).

    Shape: each geometry's bbox (vectorized wkb_bounds — no Geometry
    objects) is replicated to every ``cell_size`` grid cell the bbox
    covers; per cell, candidate pairs are the bbox-overlapping ones, and
    each unordered pair is tested in exactly ONE cell — the canonical
    cell containing the lower-left corner of the two bboxes'
    intersection (the standard grid-join dedup rule), so no cross-cell
    pair dedup shuffle is needed. ``refine=True`` runs the exact
    st_intersects predicate (per CANDIDATE pair only — per-pair Python,
    bounded by the bbox prefilter) with per-group decoded-geometry
    caching; ``refine=False`` clusters by bbox overlap (exact for
    axis-aligned rectangles). Self rows make every key a CC node, so the
    component labels cover the whole input.

    Partitioning assumptions: cell_size should be on the order of the
    typical bbox so replication stays O(few) cells per geometry; a
    geometry spanning many cells ships its (bbox + wkb) payload to each.
    CC runs driver-side under ``max_driver_edges`` (same bounded-driver
    trade as dbscan), else distributed label propagation."""
    from ..geom.wkb import from_wkb, wkb_bounds
    from ..geom import algorithms as alg

    if cc_mode not in ("auto", "driver", "distributed"):
        raise ValueError("cc_mode must be auto|driver|distributed")
    inv = 1.0 / cell_size

    def replicate(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bufs = batch.column(wkb_col).to_pylist()
        bb = wkb_bounds(bufs)
        x0, y0, x1, y1 = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
        cx0 = np.floor(x0 * inv).astype(np.int64)
        cy0 = np.floor(y0 * inv).astype(np.int64)
        cx1 = np.floor(x1 * inv).astype(np.int64)
        cy1 = np.floor(y1 * inv).astype(np.int64)
        ncx, ncy = cx1 - cx0 + 1, cy1 - cy0 + 1
        cnt = ncx * ncy
        n = len(key)
        rep = np.repeat(np.arange(n), cnt)
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(cnt[:-1], out=offs[1:])
        idx = np.arange(int(cnt.sum()), dtype=np.int64) - offs[rep]
        cellx = cx0[rep] + idx // ncy[rep]
        celly = cy0[rep] + idx % ncy[rep]
        cols = {"cell": pa.array(_pack_cell(cellx, celly)),
                "key": pa.array(key[rep]),
                "x0": pa.array(x0[rep]), "y0": pa.array(y0[rep]),
                "x1": pa.array(x1[rep]), "y1": pa.array(y1[rep])}
        if refine:
            cols["wkb"] = pc.take(batch.column(wkb_col),
                                  pa.array(rep, type=pa.int64()))
        return pa.table(cols)

    def pairs(group: pa.Table) -> pa.Table:
        # _pack_cell wraps int64 (bijective, fine for grouping); unpack
        # via the two's-complement UNSIGNED value or negative ids would
        # arithmetic-shift to garbage
        cell = group.column("cell")[0].as_py() & ((1 << 64) - 1)
        cellx = (cell >> 32) - int(_OFF)
        celly = (cell & ((1 << 32) - 1)) - int(_OFF)
        key = group.column("key").to_numpy(zero_copy_only=False)
        x0 = group.column("x0").to_numpy(zero_copy_only=False)
        y0 = group.column("y0").to_numpy(zero_copy_only=False)
        x1 = group.column("x1").to_numpy(zero_copy_only=False)
        y1 = group.column("y1").to_numpy(zero_copy_only=False)
        n = len(key)
        geoms: dict[int, object] = {}

        def geom(i: int):
            g = geoms.get(i)
            if g is None:
                g = geoms[i] = from_wkb(group.column("wkb")[i].as_py())
            return g

        ea, eb, et = [], [], []
        # self rows: once per key, in the cell of the bbox lower-left
        home = (np.floor(x0 * inv).astype(np.int64) == cellx) \
            & (np.floor(y0 * inv).astype(np.int64) == celly)
        ea.append(key[home]); eb.append(key[home])
        et.append(np.full(int(home.sum()), 3, dtype=np.int8))
        for s in range(0, n, chunk):
            sl = slice(s, min(s + chunk, n))
            ov = (x0[sl, None] <= x1[None, :]) & (x0[None, :] <= x1[sl, None]) \
                & (y0[sl, None] <= y1[None, :]) & (y0[None, :] <= y1[sl, None]) \
                & (key[sl, None] < key[None, :])
            # canonical-cell rule: test the pair only where the
            # intersection's lower-left corner lands
            lx = np.maximum(x0[sl, None], x0[None, :])
            ly = np.maximum(y0[sl, None], y0[None, :])
            ov &= (np.floor(lx * inv).astype(np.int64) == cellx) \
                & (np.floor(ly * inv).astype(np.int64) == celly)
            ii, jj = np.nonzero(ov)
            ii += s
            if refine and len(ii):
                keep = np.fromiter(
                    (alg.intersects(geom(int(i)), geom(int(j)))
                     for i, j in zip(ii, jj)), dtype=bool, count=len(ii))
                ii, jj = ii[keep], jj[keep]
            # both directions: the distributed label propagation needs
            # min labels to flow along each edge in each direction
            ea.append(key[ii]); eb.append(key[jj])
            ea.append(key[jj]); eb.append(key[ii])
            et.append(np.zeros(2 * len(ii), dtype=np.int8))
        return pa.table({"a": pa.array(np.concatenate(ea)),
                         "b": pa.array(np.concatenate(eb)),
                         "etype": pa.array(np.concatenate(et))})

    all_edges = ds.map_batches(replicate, batch_format="pyarrow") \
        .groupby("cell").map_groups(pairs, batch_format="pyarrow") \
        .materialize()

    if cc_mode == "distributed" or (cc_mode == "auto"
                                    and all_edges.count() > max_driver_edges):
        labels = _distributed_core_labels(all_edges, max_rounds)
        return labels.map_batches(
            lambda b: pa.table({"key": b.column("key"),
                                "cluster": b.column("label")}),
            batch_format="pyarrow")

    a_l, b_l, et_l = [], [], []
    for blk in all_edges.iter_batches(batch_format="pyarrow"):
        et_l.append(blk.column("etype").to_numpy(zero_copy_only=False))
        a_l.append(blk.column("a").to_numpy(zero_copy_only=False))
        b_l.append(blk.column("b").to_numpy(zero_copy_only=False))
    a = np.concatenate(a_l) if a_l else np.empty(0, np.int64)
    b = np.concatenate(b_l) if b_l else np.empty(0, np.int64)
    nodes, labels = _cc_min_labels(a, b)

    def attach(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch.column(key_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nodes, key)
        pos_c = np.clip(pos, 0, max(len(nodes) - 1, 0))
        out = np.full(len(key), -1, dtype=np.int64)
        if len(nodes):
            hit = nodes[pos_c] == key
            out[hit] = labels[pos_c[hit]]
        return pa.table({"key": pa.array(key), "cluster": pa.array(out)})

    return ds.map_batches(attach, batch_format="pyarrow")


def kmeans_nd(ds, *, key_col: str = "key", vec_col: str = "embedding",
              k: int, iters: int = 3, spherical: bool = False,
              reduce_mode: str = "auto", return_state: bool = False):
    """d-dimensional Lloyd's k-means over an embedding column
    (list<float> / fixed_size_list<float>) — the scale path for
    SemDeDup-style semantic organisation of a training corpus (cluster
    embeddings, then dedup/prune WITHIN clusters; Abbas et al. 2023,
    arXiv:2303.09540 — public paper, pattern only).

    Same deterministic scaffold as :func:`kmeans`: centroids seeded
    from the k lowest-key vectors (cid = key rank), per iteration one
    streaming pass with the broadcast (k,d) float64 centroid matrix —
    assignment via the ||x||² - 2x·c + ||c||² matmul form (ties →
    lowest cid), per-batch partial (count, sum-vector) accumulation,
    empty clusters keep their previous centroid. ``spherical=True``
    L2-normalizes inputs once and centroids after every update (cosine
    k-means; zero vectors pass through un-normalized).

    Vectors ride the shuffle-free pipeline as packed binary rows
    (vector/ann.py pack_rows — Ray 2.49's hash aggregators reject
    list-typed columns, and binary rows are zero-copy to numpy).
    Partial reduction: ``driver`` streams the k-row-per-block partial
    tables to the driver (auto when blocks*k is small); ``groupby``
    explodes partials to (cid, dim, val) rows and lets Ray's sort
    aggregate pre-combine per block — the any-scale path. Float sums
    are deterministic for a fixed block structure (blocks reduce in
    dataset order) but, unlike the integer-lattice 2-D kmeans, not
    reproducible by a SQL oracle; correctness is pytest-gated against
    an exact-arithmetic brute reference (integer-valued embeddings make
    every sum exact)."""
    from ..vector.ann import _embedding_matrix, pack_rows, unpack_rows

    if reduce_mode not in ("auto", "driver", "groupby"):
        raise ValueError("reduce_mode must be auto|driver|groupby")

    def norm(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, vec_col).astype(np.float32)
        if spherical:
            nrm = np.linalg.norm(m.astype(np.float64), axis=1,
                                 keepdims=True)
            m = np.where(nrm > 0, m / np.maximum(nrm, 1e-300), m) \
                .astype(np.float32)
        return pa.table({"key": pc.cast(batch.column(key_col), pa.int64()),
                         "vec": pack_rows(m, np.float32)})

    pts = ds.map_batches(norm, batch_format="pyarrow").materialize()
    nblocks = pts.num_blocks()

    seed = _min_k_rows(pts, k, "key", ["vec"])
    if seed.num_rows < k:
        raise ValueError(f"kmeans_nd: k={k} but only {seed.num_rows} rows")
    first = seed.column("vec")[0].as_py()
    dim = len(first) // 4
    cent = unpack_rows(seed.column("vec"), dim, np.float32) \
        .astype(np.float64)

    for _ in range(iters):
        C = cent.copy()
        c2 = (C * C).sum(axis=1)

        def assign(x: np.ndarray) -> np.ndarray:
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ C.T) + c2[None, :]
            return np.argmin(d2, axis=1)

        def partial(batch: pa.Table) -> pa.Table:
            x = unpack_rows(batch.column("vec"), dim, np.float32) \
                .astype(np.float64)
            a = assign(x)
            n = np.bincount(a, minlength=k).astype(np.int64)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, a, x)
            return pa.table({"cid": pa.array(np.arange(k, dtype=np.int64)),
                             "n": pa.array(n),
                             "s": pack_rows(sums, np.float64)})

        part = pts.map_batches(partial, batch_format="pyarrow")
        nn = np.zeros(k, np.int64)
        ss = np.zeros((k, dim), np.float64)
        if reduce_mode == "groupby" or (reduce_mode == "auto"
                                        and nblocks * k > 5_000_000):
            def explode(batch: pa.Table) -> pa.Table:
                cid = batch.column("cid").to_numpy(zero_copy_only=False)
                n = batch.column("n").to_numpy(zero_copy_only=False)
                s = unpack_rows(batch.column("s"), dim, np.float64)
                rep = np.repeat(cid, dim + 1)
                dims = np.tile(np.arange(-1, dim, dtype=np.int64),
                               len(cid))
                vals = np.concatenate(
                    [np.concatenate([[float(n[i])], s[i]])
                     for i in range(len(cid))])
                return pa.table({"cid": pa.array(rep),
                                 "dim": pa.array(dims),
                                 "val": pa.array(vals)})

            from ray.data.aggregate import Sum
            red = part.map_batches(explode, batch_format="pyarrow") \
                .groupby(["cid", "dim"]).aggregate(Sum("val"))
            for blk in red.iter_batches(batch_format="pyarrow"):
                cid = blk.column("cid").to_numpy(zero_copy_only=False)
                dm = blk.column("dim").to_numpy(zero_copy_only=False)
                val = blk.column("sum(val)").to_numpy(zero_copy_only=False)
                cm = dm == -1
                nn[cid[cm]] += val[cm].astype(np.int64)
                ss[cid[~cm], dm[~cm]] += val[~cm]
        else:
            for blk in part.iter_batches(batch_format="pyarrow"):
                cid = blk.column("cid").to_numpy(zero_copy_only=False)
                np.add.at(nn, cid,
                          blk.column("n").to_numpy(zero_copy_only=False))
                s = unpack_rows(blk.column("s"), dim, np.float64)
                np.add.at(ss, cid, s)
        live = nn > 0
        new = ss / np.maximum(nn, 1)[:, None]
        if spherical:
            nrm = np.linalg.norm(new, axis=1, keepdims=True)
            new = np.where(nrm > 0, new / np.maximum(nrm, 1e-300), new)
        cent = np.where(live[:, None], new, C)

    if return_state:
        # (materialized normalized (key, vec) points, final (k,d)
        # float64 centroid matrix) — for composites that need both the
        # assignment AND the vectors/centroids (semdedup)
        return pts, cent

    Cf = cent
    c2f = (Cf * Cf).sum(axis=1)

    def final(batch: pa.Table) -> pa.Table:
        x = unpack_rows(batch.column("vec"), dim, np.float32) \
            .astype(np.float64)
        d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ Cf.T) + c2f[None, :]
        return pa.table({"key": batch.column("key"),
                         "cluster": pa.array(
                             np.argmin(d2, axis=1).astype(np.int64))})

    return pts.map_batches(final, batch_format="pyarrow")


def semdedup(ds, *, key_col: str = "key", vec_col: str = "embedding",
             k: int, iters: int = 2, tau: float = 0.9,
             group_cap: int = 65536, reduce_mode: str = "auto"):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    dedup by spherical k-means clustering + within-cluster greedy
    pruning. Returns (key, cluster, kept) for EVERY input row; the
    pruned corpus is the kept=true subset.

    Published recipe, re-expressed Ray-Data-first:
      1. cosine k-means over the embedding column (kmeans_nd
         scaffold: deterministic min-key seeding, broadcast centroid
         matrix, binary-packed vectors);
      2. per cluster, process members by INCREASING cosine similarity
         to their centroid (the paper keeps low-centroid-similarity
         examples — they carry the diversity), ties by key; keep a
         member iff its max cosine to the already-kept members of the
         cluster is <= tau.

    Scale shape: step 2 is groupby(cluster).map_groups — one shuffle
    of (cluster, key, csim, packed vec) rows; the greedy pass inside a
    group is a per-member numpy matvec against the (small) kept set,
    O(m * kept * d) — the same within-cluster quadratic the published
    implementation runs per cluster, bounded by choosing k so clusters
    stay ~corpus/k. Groups beyond ``group_cap`` keep their tail
    UNCHECKED (conservative: never a false drop) — raise k instead.
    Partitioning assumption (SURVEY §2 custom-operator rule): cluster
    sizes are bounded by k choice; skewed mega-clusters should raise k
    or pre-split by a secondary hash.

    Determinism: greedy order is (csim, key) with float csim computed
    identically on every retry (fixed centroid matrix broadcast once);
    exact-duplicate vectors tie and fall to key order."""
    from ..vector.ann import pack_rows, unpack_rows

    pts, cent = kmeans_nd(ds, key_col=key_col, vec_col=vec_col, k=k,
                          iters=iters, spherical=True,
                          reduce_mode=reduce_mode, return_state=True)
    dim = cent.shape[1]
    # cosine to centroid == dot (pts vectors and centroids are unit)
    c2 = (cent * cent).sum(axis=1)

    def tag(batch: pa.Table) -> pa.Table:
        x = unpack_rows(batch.column("vec"), dim, np.float32) \
            .astype(np.float64)
        d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cent.T) + c2[None, :]
        a = np.argmin(d2, axis=1).astype(np.int64)
        csim = (x * cent[a]).sum(axis=1)
        return pa.table({"cluster": pa.array(a),
                         "key": batch.column("key"),
                         "csim": pa.array(csim),
                         "vec": batch.column("vec")})

    tagged = pts.map_batches(tag, batch_format="pyarrow")

    def greedy(group: pa.Table) -> pa.Table:
        keys = group.column("key").to_numpy(zero_copy_only=False)
        csim = group.column("csim").to_numpy(zero_copy_only=False)
        x = unpack_rows(group.column("vec"), dim, np.float32) \
            .astype(np.float64)
        order = np.lexsort((keys, csim))
        m = len(keys)
        kept = np.zeros(m, dtype=bool)
        kept_rows = np.empty((min(m, 4096), dim), np.float64)
        nk = 0
        for j, i in enumerate(order):
            if j >= group_cap:
                kept[order[j:]] = True  # unchecked tail, documented
                break
            if nk == 0 or (kept_rows[:nk] @ x[i]).max() <= tau:
                if nk == kept_rows.shape[0]:
                    kept_rows = np.concatenate(
                        [kept_rows, np.empty_like(kept_rows)])
                kept_rows[nk] = x[i]
                nk += 1
                kept[i] = True
        return pa.table({"key": pa.array(keys),
                         "cluster": group.column("cluster"),
                         "kept": pa.array(kept)})

    return tagged.groupby("cluster").map_groups(
        greedy, batch_format="pyarrow")


def st_grid_clusters(ds, x_col: str = "cx", y_col: str = "cy",
                     t_col: str = "ct", rounds: int = 4,
                     min_pts: int = 2,
                     max_broadcast_cells: int = 50_000_000):
    """Grid ST-DBSCAN (Birant & Kut 2007, the integer-exact grid
    form): density clustering over SPACE × TIME — occupied (x, y, t)
    cells with at least ``min_pts`` points are CORE cells; core
    cells box-adjacent in all three dimensions (|Δ| ≤ 1, the 26-
    neighborhood) connect, and ``rounds`` bounded min-label rounds
    propagate component labels (labels = packed cell keys,
    x·2⁴⁰ + y·2²⁰ + t — all coordinates must be non-negative and
    < 2²⁰, asserted). Fixed rounds = the kcore/fuzzy_components
    bounded-round contract; converged components carry the true
    min-key label. Output (x, y, t, label, n) int64.

    Shape: ONE point-sized groupby to cell counts; the bounded cell
    table (≤ occupied cells, guarded) iterates driver-side with 26
    shifted searchsorted gathers per round — the _tile_counts
    discipline with a third dimension."""
    import ray.data

    counts = ds.groupby([x_col, y_col, t_col]).count()
    keys_l, cnts_l = [], []
    for blk in counts.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
        if blk.num_rows == 0 or x_col not in blk.schema.names:
            continue
        cx = blk.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cy = blk.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ct = blk.column(t_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = blk.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(cx) and (cx.min() < 0 or cy.min() < 0 or ct.min() < 0
                        or max(cx.max(), cy.max(),
                               ct.max()) >= (1 << 20)):
            raise ValueError("cell coords must be in [0, 2^20)")
        keys_l.append((cx << 40) | (cy << 20) | ct)
        cnts_l.append(n)
    if not keys_l:
        return ray.data.from_arrow(pa.table({
            c: pa.array([], pa.int64())
            for c in (x_col, y_col, t_col, "label", "n")}))
    keys = np.concatenate(keys_l)
    cnts = np.concatenate(cnts_l)
    if len(keys) > max_broadcast_cells:
        raise ValueError(f"{len(keys)} cells exceeds "
                         f"max_broadcast_cells={max_broadcast_cells}")
    core = cnts >= min_pts
    keys, cnts = keys[core], cnts[core]
    order = np.argsort(keys)
    keys, cnts = keys[order], cnts[order]
    label = keys.copy()
    offs = [(dx, dy, dt)
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dt in (-1, 0, 1) if (dx, dy, dt) != (0, 0, 0)]
    nkeys = len(keys)
    cx_, cy_, ct_ = keys >> 40, (keys >> 20) & ((1 << 20) - 1), \
        keys & ((1 << 20) - 1)
    lim = 1 << 20
    for _ in range(rounds):
        new = label.copy()
        for dx, dy, dt in offs:
            # packed-key wrap guard: a shift below 0 / above 2^20-1
            # bleeds into the adjacent field and could falsely match
            ok = ((cx_ + dx >= 0) & (cx_ + dx < lim)
                  & (cy_ + dy >= 0) & (cy_ + dy < lim)
                  & (ct_ + dt >= 0) & (ct_ + dt < lim))
            nk = keys + (np.int64(dx) << 40) \
                + (np.int64(dy) << 20) + np.int64(dt)
            pos = np.searchsorted(keys, nk)
            hit = ok & (pos < nkeys) \
                & (keys[np.minimum(pos, nkeys - 1)] == nk)
            np.minimum.at(new, np.nonzero(hit)[0],
                          label[np.minimum(pos, nkeys - 1)[hit]])
        if (new == label).all():
            break
        label = new
    return ray.data.from_arrow(pa.table({
        x_col: pa.array(keys >> 40),
        y_col: pa.array((keys >> 20) & ((1 << 20) - 1)),
        t_col: pa.array(keys & ((1 << 20) - 1)),
        "label": pa.array(label),
        "n": pa.array(cnts)}))
