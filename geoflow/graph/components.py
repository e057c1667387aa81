"""Connected components over an integer-keyed undirected edge Dataset.

A first-class wrapper around the label-propagation machinery that
dbscan/LSH-cluster labeling already use (ops/clustering.py
_cc_min_labels / _propagate_min / _shortcut) — exposed for link-graph
work (web-corpus host graphs, dedup families). Component label = the
MINIMUM node key in the component (deterministic, join-stable).

Modes (the repo's usual bound + escape hatch):
- ``driver`` (<= max_driver_edges): stream only the two int64 edge
  columns to the driver, label with the vectorized numpy hash-to-min +
  pointer-jumping loop. 16 B/edge, same cap class as
  text/dedup.lsh_cluster_labels.
- ``distributed``: symmetrize edges, init label(k)=k for every
  endpoint, then O(log diameter) rounds of hash-to-min propagation +
  pointer-jumping shortcut in 16-byte (key,label) shuffles, converging
  on the monotone label sum (exactly clustering.py's loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def connected_components(edges, src_col: str = "src",
                         dst_col: str = "dst", mode: str = "auto",
                         max_driver_edges: int = 2_000_000,
                         max_rounds: int = 64):
    """(node, component) for every node appearing as an edge endpoint;
    edges are treated as undirected. Isolated nodes (absent from
    ``edges``) are absent from the output — union them in with
    component=node if needed."""
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError("mode must be auto|driver|distributed")
    if mode == "auto":
        # count() executes the lineage and the chosen path consumes it
        # again — materialize once (two-consumers rule, CLAUDE.md)
        edges = edges.materialize()
        n_edges = edges.count()
        mode = "driver" if n_edges <= max_driver_edges else "distributed"
    if mode == "driver":
        return _cc_driver(edges, src_col, dst_col)
    return _cc_distributed(edges, src_col, dst_col, max_rounds)


def _cc_driver(edges, src_col: str, dst_col: str):
    import ray.data

    from geoflow.ops.clustering import _cc_min_labels

    a_l, b_l = [], []
    for blk in edges.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if src_col not in blk.schema.names or blk.num_rows == 0:
            continue
        a_l.append(blk.column(src_col).to_numpy(zero_copy_only=False))
        b_l.append(blk.column(dst_col).to_numpy(zero_copy_only=False))
    a = np.concatenate(a_l) if a_l else np.empty(0, np.int64)
    b = np.concatenate(b_l) if b_l else np.empty(0, np.int64)
    nodes, labels = _cc_min_labels(a.astype(np.int64),
                                   b.astype(np.int64))
    return ray.data.from_arrow(pa.table({"node": nodes,
                                         "component": labels}))


def _cc_distributed(edges, src_col: str, dst_col: str, max_rounds: int):
    from ray.data.aggregate import Min

    from geoflow.ops.clustering import _propagate_min, _shortcut

    def sym(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy(zero_copy_only=False)
        d = batch.column(dst_col).to_numpy(zero_copy_only=False)
        return pa.table({"a": np.concatenate([s, d]),
                         "b": np.concatenate([d, s])})

    cedges = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def init(batch: pa.Table) -> pa.Table:
        k = batch.column("a")
        return pa.table({"key": k, "label": k})

    labels = cedges.map_batches(init, batch_format="pyarrow") \
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
            "connected_components hit max_rounds=%d before the label "
            "sum stabilized; labels may be non-minimal", max_rounds)
    return labels.map_batches(
        lambda b: pa.table({"node": b.column("key"),
                            "component": b.column("label")}),
        batch_format="pyarrow")
