"""Partition modularity (Newman & Girvan 2004) in exact integers.

Given an undirected simple graph and a node→community labeling,
modularity is Q = Σ_c [ e_c/m − (d_c/2m)² ] with e_c the
intra-community edge count, d_c the community degree sum and m the
edge count. Multiplying by 4m² keeps everything in int64:

    q_num4m2_c = 4·m·e_c − d_c²        (Q = Σ_c q_num4m2_c / 4m²)

so the per-community rows (label, n_nodes, intra_edges, degree_sum,
m_edges, q_num4m2) hash-match a plain SQL oracle — the float division
is left to the client (floats never hash cross-engine; CLAUDE.md).
Overflow bound: 4·m·e_c < 2^63 requires m·e_c < 2^61 (m up to ~10^9
with communities up to full size) — beyond that keep the factor
columns and combine in int128 client-side.

Shape: undirected dedup is ONE groupby (triangles._distinct_undirected
reused); labels are broadcast once via ray.put as a sorted
(node, label) pair of arrays and looked up with searchsorted inside
map_batches; per-batch partials (label, intra, dsum) pre-combine via
value_counts before a single small groupby-sum that ALSO folds in the
per-label node counts (union-schema rows, the single-shuffle totals
trick — CLAUDE.md round-4 session-2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .triangles import _distinct_undirected

__all__ = ["modularity_counts"]


def _collect_labels(labels, node_col, label_col, cap):
    ns, ls = [], []
    for b in labels.iter_batches(batch_format="pyarrow",
                                 batch_size=None):
        if b.num_rows == 0 or node_col not in b.schema.names:
            continue
        ns.append(b.column(node_col).to_numpy(zero_copy_only=False))
        ls.append(b.column(label_col).to_numpy(zero_copy_only=False))
    n = (np.concatenate(ns) if ns else np.empty(0)).astype(np.int64)
    l = (np.concatenate(ls) if ls else np.empty(0)).astype(np.int64)
    if len(n) > cap:
        raise ValueError(f"modularity_counts: {len(n)} labeled nodes "
                         f"exceed max_broadcast_nodes={cap}")
    o = np.argsort(n)
    return n[o], l[o]


def modularity_counts(edges, labels, *, src_col: str = "src",
                      dst_col: str = "dst", node_col: str = "node",
                      label_col: str = "label",
                      max_broadcast_nodes: int = 50_000_000):
    """Per-community modularity ingredients over the deduplicated
    undirected simple graph (self-loops dropped, direction and
    duplicate edges ignored). Every edge endpoint must appear in
    ``labels``."""
    import ray
    from ray.data.aggregate import Sum

    dedup = _distinct_undirected(edges, src_col, dst_col).materialize()
    m_edges = dedup.count()
    nodes, labs = _collect_labels(labels, node_col, label_col,
                                  max_broadcast_nodes)
    ref = ray.put((nodes, labs))

    def look(ids, _nodes, _labs):
        i = np.searchsorted(_nodes, ids)
        if len(_nodes) == 0 or (i >= len(_nodes)).any() \
                or (_nodes[np.minimum(i, len(_nodes) - 1)] != ids).any():
            raise KeyError("modularity_counts: edge endpoint missing "
                           "from labels")
        return _labs[i]

    def edge_partial(b: pa.Table, _ref=ref) -> pa.Table:
        _nodes, _labs = ray.get(_ref)
        lo = b.column("lo").to_numpy(zero_copy_only=False)
        hi = b.column("hi").to_numpy(zero_copy_only=False)
        la, lb = look(lo, _nodes, _labs), look(hi, _nodes, _labs)
        dl, dc = np.unique(np.concatenate([la, lb]),
                           return_counts=True)
        il, ic = np.unique(la[la == lb], return_counts=True)
        lab = np.concatenate([dl, il])
        return pa.table({
            "label": pa.array(lab, pa.int64()),
            "dsum": pa.array(np.concatenate(
                [dc.astype(np.int64), np.zeros(len(il), np.int64)])),
            "intra": pa.array(np.concatenate(
                [np.zeros(len(dl), np.int64), ic.astype(np.int64)])),
            "nn": pa.array(np.zeros(len(lab), np.int64))})

    def node_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or label_col not in b.schema.names:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dsum": pa.array([], pa.int64()),
                             "intra": pa.array([], pa.int64()),
                             "nn": pa.array([], pa.int64())})
        nl, nc = np.unique(
            b.column(label_col).to_numpy(zero_copy_only=False)
            .astype(np.int64), return_counts=True)
        z = np.zeros(len(nl), np.int64)
        return pa.table({"label": pa.array(nl, pa.int64()),
                         "dsum": pa.array(z), "intra": pa.array(z),
                         "nn": pa.array(nc.astype(np.int64))})

    parts = dedup.map_batches(edge_partial, batch_format="pyarrow") \
        .union(labels.map_batches(node_partial,
                                  batch_format="pyarrow"))
    agg = parts.groupby("label").aggregate(
        Sum("intra"), Sum("dsum"), Sum("nn"))

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "label" not in b.schema.names:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n_nodes": pa.array([], pa.int64()),
                             "intra_edges": pa.array([], pa.int64()),
                             "degree_sum": pa.array([], pa.int64()),
                             "m_edges": pa.array([], pa.int64()),
                             "q_num4m2": pa.array([], pa.int64())})
        lab = b.column("label").to_numpy(zero_copy_only=False)
        intra = b.column("sum(intra)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dsum = b.column("sum(dsum)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nn = b.column("sum(nn)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "label": pa.array(lab, pa.int64()),
            "n_nodes": pa.array(nn),
            "intra_edges": pa.array(intra),
            "degree_sum": pa.array(dsum),
            "m_edges": pa.array(np.full(len(lab), m_edges, np.int64)),
            "q_num4m2": pa.array(4 * m_edges * intra - dsum * dsum)})

    return agg.map_batches(fin, batch_format="pyarrow")
