"""Strongly connected components over a directed integer-keyed edge
Dataset — the web-graph "bow-tie" primitive (Broder et al. 2000: a
link graph is a giant SCC core plus IN/OUT/tendril periphery).

Shape (designed for that structure):

1. **Distributed trim** (broadcast alive-mask rounds, the
   kcore_nodes pattern): iteratively remove every node whose
   remaining in-degree or out-degree is zero. Each removed node is a
   singleton SCC (label = itself). On web graphs this strips the
   entire periphery in a handful of rounds; each round is ONE
   map_batches pass emitting per-batch (node, has_in, has_out)
   partials combined on the driver (O(n_nodes), no hash-aggregate
   spin-up).
2. **Core resolution**: the surviving subgraph (every node on a
   cycle). If its edge count is within ``max_driver_edges`` the core
   streams to the driver (16 B/edge) and is labeled with an
   iterative Tarjan pass. Otherwise one distributed **FW-BW pivot
   peel** runs first: the pivot's SCC = (nodes forward-reachable from
   the pivot) ∩ (nodes backward-reachable), both computed with the
   broadcast min-plus relaxation of traversal.seed_distances — on a
   bow-tie graph the max-degree pivot sits in the giant SCC, so the
   peel removes most of the core; the remainder must then fit the
   driver cap (raises with guidance if not — recursive FW-BW is the
   documented extension).

Label convention: scc = MINIMUM node key in the component
(deterministic, join-stable — same convention as
components.connected_components).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tarjan_labels(src: np.ndarray, dst: np.ndarray,
                   nodes: np.ndarray) -> np.ndarray:
    """Min-member SCC label per node (iterative Tarjan, explicit
    stack). ``nodes`` sorted unique; src/dst are values in nodes."""
    n = len(nodes)
    m = len(src)
    s = np.searchsorted(nodes, src)
    d = np.searchsorted(nodes, dst)
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    head = np.searchsorted(s, np.arange(n + 1))
    index = np.full(n, -1, np.int64)
    low = np.zeros(n, np.int64)
    on_stack = np.zeros(n, bool)
    comp = np.full(n, -1, np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        # (node, next-edge-cursor) DFS frames
        frames = [(root, head[root])]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack[root] = True
        while frames:
            v, cur = frames[-1]
            if cur < head[v + 1]:
                frames[-1] = (v, cur + 1)
                w = int(d[cur])
                if index[w] == -1:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    on_stack[w] = True
                    frames.append((w, head[w]))
                elif on_stack[w]:
                    if index[w] < low[v]:
                        low[v] = index[w]
            else:
                frames.pop()
                if frames:
                    pv = frames[-1][0]
                    if low[v] < low[pv]:
                        low[pv] = low[v]
                if low[v] == index[v]:
                    members = []
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        members.append(w)
                        if w == v:
                            break
                    mem = np.array(members, dtype=np.int64)
                    comp[mem] = nodes[mem].min()
    return comp


def _collect_edge_cols(ds, src_col, dst_col):
    a_l, b_l = [], []
    for blk in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if src_col not in blk.schema.names or blk.num_rows == 0:
            continue
        a_l.append(blk.column(src_col).to_numpy(
            zero_copy_only=False).astype(np.int64))
        b_l.append(blk.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64))
    a = np.concatenate(a_l) if a_l else np.empty(0, np.int64)
    b = np.concatenate(b_l) if b_l else np.empty(0, np.int64)
    return a, b


def scc_labels(edges, src_col: str = "src", dst_col: str = "dst",
               trim_rounds: int = 32,
               max_driver_edges: int = 2_000_000,
               max_broadcast_nodes: int = 50_000_000,
               fwbw_hops: int = 64):
    """(node, scc) for every node appearing as an edge endpoint.
    scc = min node key of the strongly connected component. Isolated
    nodes (absent from ``edges``) are absent — union them in with
    scc=node if needed."""
    import ray
    import ray.data

    from .traversal import _collect_nodes

    edges = edges.materialize()
    nodes = _collect_nodes(edges, [src_col, dst_col])
    if len(nodes) > max_broadcast_nodes:
        raise ValueError(
            f"{len(nodes)} nodes exceeds max_broadcast_nodes="
            f"{max_broadcast_nodes}")
    nodes_ref = ray.put(nodes)
    alive = np.ones(len(nodes), bool)

    for _ in range(trim_rounds):
        alive_ref = ray.put(alive)

        def inout(b: pa.Table, _n=nodes_ref, _a=alive_ref) -> pa.Table:
            nds, av = ray.get(_n), ray.get(_a)
            s = b.column(src_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            d = b.column(dst_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            si = np.searchsorted(nds, s)
            di = np.searchsorted(nds, d)
            m = av[si] & av[di]
            has_out = np.unique(si[m])
            has_in = np.unique(di[m])
            return pa.table({
                "node": np.concatenate([has_out, has_in]),
                "dirn": np.concatenate([
                    np.zeros(len(has_out), np.int64),
                    np.ones(len(has_in), np.int64)])})

        has_out = np.zeros(len(nodes), bool)
        has_in = np.zeros(len(nodes), bool)
        for blk in edges.map_batches(
                inout, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            if blk.num_rows == 0 or "node" not in blk.schema.names:
                continue
            idx = blk.column("node").to_numpy(zero_copy_only=False)
            dirn = blk.column("dirn").to_numpy(zero_copy_only=False)
            has_out[idx[dirn == 0]] = True
            has_in[idx[dirn == 1]] = True
        new_alive = alive & has_out & has_in
        if np.array_equal(new_alive, alive):
            break
        alive = new_alive

    # trimmed nodes are singleton SCCs
    out_tables = [pa.table({"node": nodes[~alive],
                            "scc": nodes[~alive]})]

    if alive.any():
        alive_nodes = nodes[alive]
        alive_ref = ray.put(alive_nodes)

        def core_only(b: pa.Table, _a=alive_ref) -> pa.Table:
            av = ray.get(_a)
            s = b.column(src_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            d = b.column(dst_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            ps = np.searchsorted(av, s).clip(0, len(av) - 1)
            pd_ = np.searchsorted(av, d).clip(0, len(av) - 1)
            m = (av[ps] == s) & (av[pd_] == d)
            return pa.table({src_col: s[m], dst_col: d[m]})

        core = edges.map_batches(
            core_only, batch_format="pyarrow").materialize()
        n_core_edges = core.count()
        peeled: list[pa.Table] = []
        if n_core_edges > max_driver_edges:
            core, peeled, alive_nodes = _fwbw_peel(
                core, alive_nodes, src_col, dst_col, fwbw_hops)
            n_core_edges = core.count()
            if n_core_edges > max_driver_edges:
                raise ValueError(
                    f"SCC core still has {n_core_edges} edges after "
                    f"the FW-BW pivot peel (cap {max_driver_edges}); "
                    "recurse scc_labels on the remainder or raise "
                    "max_driver_edges")
        out_tables.extend(peeled)
        s, d = _collect_edge_cols(core, src_col, dst_col)
        if len(s):
            comp = _tarjan_labels(s, d, alive_nodes)
            covered = comp != -1
            out_tables.append(pa.table({
                "node": alive_nodes[covered], "scc": comp[covered]}))
            # alive nodes with no surviving core edge (all their edges
            # pointed at peeled/trimmed nodes) are singletons
            rest = alive_nodes[~covered]
        else:
            rest = alive_nodes
        if len(rest):
            out_tables.append(pa.table({"node": rest, "scc": rest}))

    full = pa.concat_tables([t for t in out_tables if t.num_rows])
    if full.num_rows == 0:
        full = pa.table({"node": pa.array([], pa.int64()),
                         "scc": pa.array([], pa.int64())})
    return ray.data.from_arrow(full)


def _fwbw_peel(core, alive_nodes, src_col, dst_col, fwbw_hops):
    """Peel the pivot's SCC from the core with two distributed
    reachability sweeps (forward + backward seed_distances from the
    max-out-degree pivot). Returns (remaining-core Dataset,
    [peeled (node, scc) table], remaining alive_nodes)."""
    import ray

    from .traversal import seed_distances

    # pivot = max total-degree node (one pass of per-batch partials)
    deg = np.zeros(len(alive_nodes), np.int64)
    nodes_ref = ray.put(alive_nodes)

    def degp(b: pa.Table, _n=nodes_ref) -> pa.Table:
        nds = ray.get(_n)
        s = b.column(src_col).to_numpy(zero_copy_only=False)
        d = b.column(dst_col).to_numpy(zero_copy_only=False)
        c = np.bincount(np.searchsorted(nds, np.concatenate([s, d])),
                        minlength=len(nds))
        nz = np.flatnonzero(c)
        return pa.table({"i": nz.astype(np.int64),
                         "c": c[nz].astype(np.int64)})

    for blk in core.map_batches(
            degp, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        if blk.num_rows == 0 or "i" not in blk.schema.names:
            continue
        np.add.at(deg, blk.column("i").to_numpy(zero_copy_only=False),
                  blk.column("c").to_numpy(zero_copy_only=False))
    pivot = int(alive_nodes[int(np.argmax(deg))])

    fwd = seed_distances(core, [pivot], max_hops=fwbw_hops,
                         src_col=src_col, dst_col=dst_col)
    rev = core.map_batches(
        lambda b: pa.table({src_col: b.column(dst_col),
                            dst_col: b.column(src_col)}),
        batch_format="pyarrow")
    bwd = seed_distances(rev, [pivot], max_hops=fwbw_hops,
                         src_col=src_col, dst_col=dst_col)

    def reached(ds):
        outs = []
        for blk in ds.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
            if blk.num_rows and "node" in blk.schema.names:
                outs.append(blk.column("node").to_numpy(
                    zero_copy_only=False))
        return (np.unique(np.concatenate(outs)) if outs
                else np.empty(0, np.int64))

    members = np.intersect1d(reached(fwd), reached(bwd))
    label = int(members.min()) if len(members) else pivot
    peeled = [pa.table({"node": members,
                        "scc": np.full(len(members), label, np.int64)})]
    remaining = np.setdiff1d(alive_nodes, members)
    rem_ref = ray.put(remaining)

    def drop_peeled(b: pa.Table, _r=rem_ref) -> pa.Table:
        rem = ray.get(_r)
        s = b.column(src_col).to_numpy(zero_copy_only=False)
        d = b.column(dst_col).to_numpy(zero_copy_only=False)
        if len(rem) == 0:
            m = np.zeros(len(s), bool)
        else:
            ps = np.searchsorted(rem, s).clip(0, len(rem) - 1)
            pd_ = np.searchsorted(rem, d).clip(0, len(rem) - 1)
            m = (rem[ps] == s) & (rem[pd_] == d)
        return pa.table({src_col: s[m], dst_col: d[m]})

    rest_core = core.map_batches(drop_peeled,
                                 batch_format="pyarrow").materialize()
    return rest_core, peeled, remaining
