"""Synchronous label-propagation community detection.

Reference scope: the reference engine has no graph operators — this is
part of the training-data-pipeline layer (community structure over
web link graphs for sampling / dedup-family grouping; public spec:
Raghavan, Albert & Kumara 2007, synchronous variant).

Exactness design: label_0(v) = v; each round every node adopts the
MOST FREQUENT label among its neighbors, ties broken by the SMALLEST
label, nodes with no neighbors keep their label. Counts and labels
are integers, and the (count, label) argmax is encoded as one int64
``cnt * 2^32 - (label_rank + 1)`` max — order-independent, so a fixed
number of rounds hash-matches an unrolled-CTE DuckDB oracle that
packs the identical key. Synchronous LPA can oscillate on bipartite
structure; the fixed round count makes the output well-defined on
both sides (document rounds when consuming). With singleton votes the
min tiebreak spreads small labels across bridges — communities
survive only where intra-community majorities form (dense groups);
sparse structure degenerates toward min-label flooding, the known
cost of a DETERMINISTIC synchronous variant (the published
asynchronous random-order variant is not oracle-reproducible).

Scale shape:
- ``driver`` (<= max_driver_edges): two int64 edge columns stream to
  the driver, numpy pack/unique/reduceat loop (16 B/edge, the
  components.py cap class).
- ``broadcast``: the label vector lives in the object store (one
  ``ray.put`` per round); each round is one map_batches partial-count
  pass + groupby(dst,label).sum + groupby(dst).max — per-node state
  returns to the driver as O(n_nodes) rows (the pagerank
  reduce="groupby" class). Bounded by ``max_broadcast_nodes``;
  label ranks are dense indices so the int64 pack never overflows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PACK = 1 << 32


def _sym_dedup_driver(edges, src_col, dst_col):
    a_l, b_l = [], []
    for blk in edges.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if blk.num_rows == 0 or src_col not in blk.schema.names:
            continue
        a_l.append(blk.column(src_col).to_numpy(zero_copy_only=False))
        b_l.append(blk.column(dst_col).to_numpy(zero_copy_only=False))
    s = (np.concatenate(a_l) if a_l else np.empty(0)).astype(np.int64)
    d = (np.concatenate(b_l) if b_l else np.empty(0)).astype(np.int64)
    m = s != d
    return s[m], d[m]


def label_propagation(edges, iterations: int = 4,
                      src_col: str = "src", dst_col: str = "dst",
                      mode: str = "auto",
                      max_driver_edges: int = 2_000_000,
                      max_broadcast_nodes: int = 50_000_000):
    """(node, label) after ``iterations`` synchronous rounds over the
    undirected multigraph (direction ignored; PARALLEL duplicate edges
    count — dedup upstream if multiplicity must not weight votes;
    self-loops dropped)."""
    import ray

    if mode not in ("auto", "driver", "broadcast"):
        raise ValueError("mode must be auto|driver|broadcast")
    if mode == "auto":
        edges = edges.materialize()
        mode = ("driver" if edges.count() <= max_driver_edges
                else "broadcast")
    if mode == "driver":
        s, d = _sym_dedup_driver(edges, src_col, dst_col)
        nodes, labels = _lpa_numpy(s, d, iterations)
        import ray.data
        return ray.data.from_arrow(pa.table({"node": nodes,
                                             "label": labels}))
    return _lpa_broadcast(edges, iterations, src_col, dst_col,
                          max_broadcast_nodes)


def _lpa_numpy(s: np.ndarray, d: np.ndarray, iterations: int):
    """One process, fully vectorized. Nodes and labels are remapped to
    dense ranks; the (count, label) argmax packs into one int64."""
    nodes = np.unique(np.concatenate([s, d]))
    n = len(nodes)
    if n == 0:
        return nodes, nodes
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    # symmetric incidence: votes arriving at each endpoint
    at = np.concatenate([di, si])
    frm = np.concatenate([si, di])
    lab = np.arange(n, dtype=np.int64)  # dense rank == initial label
    for _ in range(iterations):
        votes = lab[frm]
        pk = at.astype(np.int64) * n + votes
        u, cnt = np.unique(pk, return_counts=True)
        vat = u // n
        vlab = u % n
        packed = cnt.astype(np.int64) * _PACK - (vlab + 1)
        order = np.argsort(vat, kind="stable")
        vat, packed = vat[order], packed[order]
        starts = np.flatnonzero(np.r_[True, vat[1:] != vat[:-1]])
        best = np.maximum.reduceat(packed, starts)
        new = lab.copy()
        bc = (best // _PACK) + 1
        new[vat[starts]] = bc * _PACK - best - 1
        if np.array_equal(new, lab):
            break
        lab = new
    return nodes, nodes[lab]


def _lpa_broadcast(edges, iterations, src_col, dst_col,
                   max_broadcast_nodes):
    import ray
    import ray.data

    from geoflow.graph.traversal import _collect_nodes

    def sym(b: pa.Table) -> pa.Table:
        s = b.column(src_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = b.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = s != d
        return pa.table({"at": np.concatenate([d[m], s[m]]),
                         "frm": np.concatenate([s[m], d[m]])})

    sedges = edges.map_batches(sym, batch_format="pyarrow") \
        .materialize()
    nodes = _collect_nodes(sedges, ["at", "frm"])
    n = len(nodes)
    if n > max_broadcast_nodes:
        raise ValueError(f"{n} nodes exceeds max_broadcast_nodes")
    nodes_ref = ray.put(nodes)
    lab = np.arange(n, dtype=np.int64)

    for _ in range(iterations):
        lab_ref = ray.put(lab)

        def partial(b: pa.Table, _n=nodes_ref, _l=lab_ref) -> pa.Table:
            nds, lv = ray.get(_n), ray.get(_l)
            at = np.searchsorted(
                nds, b.column("at").to_numpy(zero_copy_only=False))
            frm = np.searchsorted(
                nds, b.column("frm").to_numpy(zero_copy_only=False))
            pk = at * len(nds) + lv[frm]
            u, cnt = np.unique(pk, return_counts=True)
            return pa.table({"pk": u, "cnt": cnt.astype(np.int64)})

        agg = sedges.map_batches(partial, batch_format="pyarrow") \
            .groupby("pk").sum("cnt")
        new = lab.copy()
        # O(distinct (node,label) pairs) rows; combined per node here
        best = np.full(n, np.iinfo(np.int64).min, np.int64)
        for blk in agg.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
            if blk.num_rows == 0 or "pk" not in blk.schema.names:
                continue
            pk = blk.column("pk").to_numpy(zero_copy_only=False)
            cnt = blk.column("sum(cnt)").to_numpy(
                zero_copy_only=False).astype(np.int64)
            vat = pk // n
            vlab = pk % n
            packed = cnt * _PACK - (vlab + 1)
            np.maximum.at(best, vat, packed)
        got = best != np.iinfo(np.int64).min
        bc = (best[got] // _PACK) + 1
        new[got] = bc * _PACK - best[got] - 1
        if np.array_equal(new, lab):
            break
        lab = new
    return ray.data.from_arrow(pa.table({"node": nodes,
                                         "label": nodes[lab]}))


def label_prop_oracle_sql(edges_sql: str, iterations: int = 4) -> str:
    """Unrolled-CTE DuckDB oracle: identical symmetric multigraph
    votes, identical ``cnt * 2^32 - (label_rank + 1)`` argmax pack
    (label_rank = dense rank of the label among node keys, matching
    the kernels' dense remap). ``edges_sql`` defines (src, dst)."""
    parts = [f"""WITH raw AS ({edges_sql}),
sym AS MATERIALIZED (SELECT dst AS at, src AS frm FROM raw WHERE src <> dst
        UNION ALL
        SELECT src, dst FROM raw WHERE src <> dst),
nd AS MATERIALIZED (SELECT node,
              CAST(ROW_NUMBER() OVER (ORDER BY node) - 1 AS BIGINT)
                AS rnk
       FROM (SELECT DISTINCT at AS node FROM sym
             UNION SELECT DISTINCT frm FROM sym)),
l0 AS (SELECT node, node AS label FROM nd)"""]
    for t in range(1, iterations + 1):
        parts.append(f""",
l{t} AS MATERIALIZED (
  SELECT n.node, COALESCE(w.node, n.label) AS label
  FROM l{t - 1} n LEFT JOIN (
    SELECT at,
           (((MAX(p) // {_PACK}) + 1) * {_PACK} - MAX(p) - 1) AS brnk
    FROM (
      SELECT s.at,
             CAST(COUNT(*) AS BIGINT) * {_PACK} - (r.rnk + 1) AS p
      FROM sym s
      JOIN l{t - 1} l ON l.node = s.frm
      JOIN nd r ON r.node = l.label
      GROUP BY s.at, r.rnk
    ) GROUP BY at
  ) v ON v.at = n.node
  LEFT JOIN nd w ON w.rnk = v.brnk
)""")
    parts.append(f"\nSELECT node, label FROM l{iterations}")
    return "".join(parts)
