"""Distributed triangle counting + local clustering coefficient —
the web-graph cohesion/spam signal (link farms are triangle-dense).
Public algorithm: degree-ordered orientation (Schank & Wagner 2005 /
Suri & Vassilvitskii 2011 "Counting triangles and the curse of the
last reducer"): orient every undirected edge from the (degree, id)-
smaller endpoint to the larger, so each out-neighborhood has size
O(sqrt(m)) even on power-law graphs, enumerate wedges per source,
and close them against the oriented edge set with one hash join.

Stages (all Dataset ops):
  1. canonicalize + dedup undirected edges (one groupby on the
     packed pair key; self-loops dropped);
  2. degrees via endpoint flat-map + groupby-count, broadcast under
     ``max_broadcast_nodes`` (int64 numpy array — the usual bound;
     beyond it the same orientation is expressible as two hash joins,
     documented escape hatch, not implemented here);
  3. orient by (degree, id) and emit wedges per out-neighborhood
     (groupby(src).map_groups, vectorized upper-triangle pairing);
  4. close wedges against oriented edges with one inner hash join on
     the packed key (64-bit mix collision exposure — the engine-wide
     documented tradeoff);
  5. per-node counts: each matched triangle credits its three
     vertices (flat emission + one groupby-sum).

Exactness: counts are integers; clustering coefficient is the single
double division 2*t / (deg*(deg-1)) — oracle-exact."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geoflow.text.hashing import mix64

__all__ = ["triangle_counts", "clustering_coefficient",
           "cocitation_counts"]

_P = np.uint64(0x9E3779B97F4A7C15)


def _key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return mix64(a.view(np.uint64) * _P
                 + b.view(np.uint64)).view(np.int64)


def _distinct_undirected(edges, src_col, dst_col):
    def prep(b: pa.Table) -> pa.Table:
        s = b.column(src_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = b.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = s != d
        lo = np.minimum(s[m], d[m])
        hi = np.maximum(s[m], d[m])
        return pa.table({"k": pa.array(_key(lo, hi)),
                         "lo": pa.array(lo), "hi": pa.array(hi)})

    def first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return edges.map_batches(prep, batch_format="pyarrow") \
        .groupby("k").map_groups(first, batch_format="pyarrow")


def triangle_counts(edges, src_col: str = "src",
                    dst_col: str = "dst",
                    max_broadcast_nodes: int = 4_000_000,
                    num_partitions: int | None = None):
    """Per-node triangle participation over the undirected simple
    graph: Dataset (node, triangles, degree). Nodes in no triangle
    still appear (triangles=0) so the clustering coefficient is
    defined for every node with degree >= 2."""
    import ray
    import ray.data

    from geoflow.join.semijoin import drop_schemaless_blocks

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))

    und = _distinct_undirected(edges, src_col, dst_col).materialize()

    # degrees (broadcast under the cap)
    def endpoints(b: pa.Table) -> pa.Table:
        lo = b.column("lo").to_numpy(zero_copy_only=False)
        hi = b.column("hi").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(np.concatenate([lo, hi]))})

    dg = und.map_batches(endpoints, batch_format="pyarrow") \
        .groupby("n").count()
    nd, dc = [], []
    for b in dg.iter_batches(batch_format="pyarrow"):
        if "n" not in b.schema.names or b.num_rows == 0:
            continue
        nd.append(b.column("n").to_numpy(zero_copy_only=False))
        dc.append(b.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64))
    nodes = np.concatenate(nd) if nd else np.empty(0, np.int64)
    degs = np.concatenate(dc) if dc else np.empty(0, np.int64)
    if len(nodes) > max_broadcast_nodes:
        raise ValueError(
            f"degree table ({len(nodes)} nodes) exceeds "
            f"max_broadcast_nodes={max_broadcast_nodes}; orient via "
            "two hash joins instead (documented escape hatch)")
    order = np.argsort(nodes)
    nodes, degs = nodes[order], degs[order]
    ref = ray.put((nodes, degs))

    def _deg(ids):
        ns, ds_ = ray.get(ref)
        pos = np.searchsorted(ns, ids)
        return ds_[pos]          # every edge endpoint has a degree

    def orient(b: pa.Table) -> pa.Table:
        lo = b.column("lo").to_numpy(zero_copy_only=False)
        hi = b.column("hi").to_numpy(zero_copy_only=False)
        dl, dh = _deg(lo), _deg(hi)
        # from the (deg, id)-smaller endpoint to the larger
        fwd = (dl < dh) | ((dl == dh) & (lo < hi))
        u = np.where(fwd, lo, hi)
        v = np.where(fwd, hi, lo)
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    oriented = und.map_batches(orient,
                               batch_format="pyarrow").materialize()

    def wedges(g: pa.Table) -> pa.Table:
        """All out-neighbor pairs of one source, ordered by the same
        (deg, id) orientation so the closing edge is oriented too."""
        u = int(g.column("u")[0].as_py())
        v = g.column("v").to_numpy(zero_copy_only=False)
        if len(v) < 2:
            return pa.table({"k": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        dv = _deg(v)
        o = np.lexsort((v, dv))
        vs = v[o]
        n = len(vs)
        ii, jj = np.triu_indices(n, k=1)
        b_, c_ = vs[ii], vs[jj]
        return pa.table({"k": pa.array(_key(b_, c_)),
                         "a": pa.array(np.full(len(b_), u)),
                         "b": pa.array(b_), "c": pa.array(c_)})

    w = oriented.groupby("u").map_groups(wedges,
                                         batch_format="pyarrow")

    def edge_keys(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(_key(u, v))})

    ek, ka = drop_schemaless_blocks(
        oriented.map_batches(edge_keys, batch_format="pyarrow"))
    ws, ka2 = drop_schemaless_blocks(w)
    zero_tbl = pa.table({
        "node": pa.array(nodes),
        "triangles": pa.array(np.zeros(len(nodes), np.int64)),
        "degree": pa.array(degs)})
    if ek is None or ws is None:
        return ray.data.from_arrow(zero_tbl)
    tri = ws.join(ek, join_type="inner",
                  num_partitions=num_partitions, on=("k",))

    def credit(b: pa.Table) -> pa.Table:
        cols = [b.column(x).to_numpy(zero_copy_only=False)
                for x in ("a", "b", "c")]
        return pa.table({"node": pa.array(np.concatenate(cols)),
                         "t": pa.array(np.ones(3 * b.num_rows,
                                               np.int64))})

    from ray.data.aggregate import Sum
    per = tri.map_batches(credit, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("t"))

    # merge with the zero row for every node (driver arrays are the
    # broadcast degree table — already bounded)
    tcount = np.zeros(len(nodes), dtype=np.int64)
    for b in per.iter_batches(batch_format="pyarrow"):
        if "node" not in b.schema.names or b.num_rows == 0:
            continue
        pos = np.searchsorted(
            nodes, b.column("node").to_numpy(zero_copy_only=False))
        tcount[pos] += b.column("sum(t)").to_numpy(
            zero_copy_only=False).astype(np.int64)
    out = ray.data.from_arrow(pa.table({
        "node": pa.array(nodes),
        "triangles": pa.array(tcount),
        "degree": pa.array(degs)}))
    out._geoflow_keepalive = [ka, ka2]
    return out


def clustering_coefficient(edges, **kw):
    """(node, triangles, degree, coeff) with
    coeff = 2*triangles / (degree*(degree-1)); degree<2 → 0.0."""
    t = triangle_counts(edges, **kw)

    def fin(b: pa.Table) -> pa.Table:
        tr = b.column("triangles").to_numpy(zero_copy_only=False)
        dg = b.column("degree").to_numpy(zero_copy_only=False)
        denom = dg * (dg - 1)
        co = np.where(denom > 0,
                      2.0 * tr / np.maximum(denom, 1), 0.0)
        return b.append_column("coeff", pa.array(co))

    return t.map_batches(fin, batch_format="pyarrow")


def cocitation_counts(edges, src_col: str = "src",
                      dst_col: str = "dst", min_count: int = 1):
    """Co-citation similarity (Small 1973): for each unordered pair
    (b, c), the number of common citing sources (#a with a→b and
    a→c). The wedge-enumeration shape of triangle_counts without the
    closing join: distinct directed edges → per-source out-neighbor
    pairs (map_groups; the quadratic blowup on mega-out-degree
    sources is the documented skew caveat — cap or sample upstream
    for crawl graphs) → one groupby-sum. Returns (b, c, n) with
    b < c and n >= min_count."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def prep(bt: pa.Table) -> pa.Table:
        s = bt.column(src_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = bt.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = s != d
        return pa.table({"k": pa.array(_key(s[m], d[m])),
                         "s": pa.array(s[m]), "d": pa.array(d[m])})

    def first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    dedup = edges.map_batches(prep, batch_format="pyarrow") \
        .groupby("k").map_groups(first, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        v = np.unique(g.column("d").to_numpy(zero_copy_only=False))
        if len(v) < 2:
            return pa.table({"b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(v), k=1)
        return pa.table({"b": pa.array(v[ii]), "c": pa.array(v[jj]),
                         "n": pa.array(np.ones(len(ii), np.int64))})

    agg = dedup.groupby("s").map_groups(pairs,
                                        batch_format="pyarrow") \
        .groupby(["b", "c"]).aggregate(Sum("n"))

    def fin(bt: pa.Table) -> pa.Table:
        if "b" not in bt.schema.names or bt.num_rows == 0:
            return pa.table({"b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        n = pc.cast(bt.column("sum(n)"), pa.int64())
        out = pa.table({"b": bt.column("b"), "c": bt.column("c"),
                        "n": n})
        return out.filter(pc.greater_equal(out.column("n"),
                                           min_count))

    return agg.map_batches(fin, batch_format="pyarrow")


def degree_assortativity(edges, src_col: str = "src",
                         dst_col: str = "dst",
                         max_broadcast_nodes: int = 50_000_000):
    """Degree-assortativity ingredients (Newman 2002) over the
    deduplicated undirected simple graph: with each edge contributing
    BOTH ordered endpoint pairs (x, y) = (deg_u, deg_v), emit the one
    row (n_pairs=2m, sum_x, sum_x2, sum_xy) — Σy ≡ Σx and Σy² ≡ Σx²
    by symmetry; Pearson r is client-side float arithmetic. All
    int64, hash-exact vs the SQL dedup + degree join oracle.

    Shape: one undirected-dedup groupby (shared machinery), one
    degree groupby, degrees broadcast sorted, then per-batch integer
    partials combined on the driver (four scalars per block)."""
    import ray
    import ray.data

    und = _distinct_undirected(edges, src_col, dst_col).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        lo = b.column("lo").to_numpy(zero_copy_only=False)
        hi = b.column("hi").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(np.concatenate([lo, hi]))})

    dg = und.map_batches(endpoints, batch_format="pyarrow") \
        .groupby("n").count()
    nd, dc = [], []
    for b in dg.iter_batches(batch_format="pyarrow"):
        if "n" not in b.schema.names or b.num_rows == 0:
            continue
        nd.append(b.column("n").to_numpy(zero_copy_only=False))
        dc.append(b.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64))
    nodes = np.concatenate(nd) if nd else np.empty(0, np.int64)
    degs = np.concatenate(dc) if dc else np.empty(0, np.int64)
    if len(nodes) > max_broadcast_nodes:
        raise ValueError("degree table exceeds max_broadcast_nodes")
    order = np.argsort(nodes)
    ref = ray.put((nodes[order], degs[order]))

    def part(b: pa.Table, _r=ref) -> pa.Table:
        ns, ds_ = ray.get(_r)
        lo = b.column("lo").to_numpy(zero_copy_only=False)
        hi = b.column("hi").to_numpy(zero_copy_only=False)
        dl = ds_[np.searchsorted(ns, lo)]
        dh = ds_[np.searchsorted(ns, hi)]
        return pa.table({
            "n_pairs": pa.array([2 * len(lo)], pa.int64()),
            "sum_x": pa.array([int(dl.sum() + dh.sum())], pa.int64()),
            "sum_x2": pa.array([int((dl * dl).sum()
                                    + (dh * dh).sum())], pa.int64()),
            "sum_xy": pa.array([int(2 * (dl * dh).sum())],
                               pa.int64())})

    tot = np.zeros(4, np.int64)
    for b in und.map_batches(part, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0 or "n_pairs" not in b.schema.names:
            continue
        for j, c in enumerate(("n_pairs", "sum_x", "sum_x2",
                               "sum_xy")):
            tot[j] += int(b.column(c).to_numpy(
                zero_copy_only=False).sum())
    return ray.data.from_arrow(pa.table({
        "n_pairs": pa.array([tot[0]]), "sum_x": pa.array([tot[1]]),
        "sum_x2": pa.array([tot[2]]), "sum_xy": pa.array([tot[3]])}))


def twohop_counts(edges, src_col: str = "src", dst_col: str = "dst",
                  max_broadcast_nodes: int = 50_000_000):
    """Exact ≤2-hop neighborhood sizes over the undirected simple
    graph (the exact sibling of HyperBall's r=2 estimate): per node,
    n1 = degree, n2 = |{v : dist(u,v) = 2}|. Self and duplicate
    edges dropped.

    Shape: undirected dedup (shared groupby), adjacency broadcast as
    CSR (sorted flat arrays via ray.put), then ONE map pass over
    nodes unions each node's neighbors' adjacency lists with a
    sorted-merge np.unique — work Σ_u Σ_{v∈N(u)} deg(v), the wedge
    volume, same as the triangle kernel's bound."""
    import ray
    import ray.data

    und = _distinct_undirected(edges, src_col, dst_col).materialize()
    los, his = [], []
    for b in und.iter_batches(batch_format="pyarrow",
                              batch_size=None):
        if b.num_rows == 0 or "lo" not in b.schema.names:
            continue
        los.append(b.column("lo").to_numpy(zero_copy_only=False))
        his.append(b.column("hi").to_numpy(zero_copy_only=False))
    lo = np.concatenate(los) if los else np.empty(0, np.int64)
    hi = np.concatenate(his) if his else np.empty(0, np.int64)
    s = np.concatenate([lo, hi]).astype(np.int64)
    d = np.concatenate([hi, lo]).astype(np.int64)
    nodes = np.unique(s)
    if len(nodes) > max_broadcast_nodes:
        raise ValueError("twohop_counts: adjacency exceeds "
                         "max_broadcast_nodes")
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    starts = np.searchsorted(s, nodes)
    ends = np.searchsorted(s, nodes, side="right")
    ref = ray.put((nodes, s, d, starts, ends))
    nd = ray.data.from_arrow(pa.table({"node": pa.array(nodes)}))

    def hop2(b: pa.Table, _r=ref) -> pa.Table:
        ns, s_, d_, st, en = ray.get(_r)
        out_n, out_1, out_2 = [], [], []
        for u in b.column("node").to_numpy(zero_copy_only=False):
            i = np.searchsorted(ns, u)
            nbrs = d_[st[i]:en[i]]
            ii = np.searchsorted(ns, nbrs)
            two = np.unique(np.concatenate(
                [d_[st[j]:en[j]] for j in ii])) if len(ii) else \
                np.empty(0, np.int64)
            n2 = len(np.setdiff1d(two, np.append(nbrs, u),
                                  assume_unique=False))
            out_n.append(u)
            out_1.append(len(nbrs))
            out_2.append(n2)
        return pa.table({"node": pa.array(out_n, pa.int64()),
                         "n1": pa.array(out_1, pa.int64()),
                         "n2": pa.array(out_2, pa.int64())})

    return nd.map_batches(hop2, batch_format="pyarrow",
                          batch_size=4096)
