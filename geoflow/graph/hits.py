"""HITS hubs & authorities over an integer-keyed link graph
(Kleinberg 1999, the public formulation). Companion to
graph/pagerank.py — same fixed-point-exactness design.

Update rule in integer mass units (mass M):
    h0 = a0 = M // n
    a'(v) = SUM_{(u,v) in E} h(u)        (int64 sum, order-free)
    a''   = (a' * M) // SUM(a')          (renormalize to mass M)
    h'(u) = SUM_{(u,v) in E} a''(v)
    h''   = (h' * M) // SUM(h')

The renormalizing multiply (a' * M up to ~indeg·M² ≈ 1e30) exceeds
int64, so the broadcast-mode driver rescale runs in arbitrary-
precision Python ints (object dtype — O(n_nodes) scalar ops per
iteration, bounded by max_broadcast_nodes) and the SQL oracle runs it
in HUGEINT (int128, plenty up to ~1e38). A join-mode escape hatch
would need a worker-side 128-bit multiply (the splitmix64-style
hi/lo split); not implemented — the guard raises past the bound.

Every intermediate is identical between engines: sums are
order-independent ints, renormalization is exact floor arithmetic on
those sums, so auth_units/hub_units hash-match the unrolled-CTE
oracle bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geoflow.graph.pagerank import MASS, _EDGES_SQL


def hits(edges, *, n_nodes: int, src_col: str = "src",
         dst_col: str = "dst", iterations: int = 2, mass: int = MASS,
         max_broadcast_nodes: int = 4_000_000,
         materialize_edges: bool = True):
    """(node, auth_units, hub_units, auth, hub) for nodes in
    [0, n_nodes). Nodes absent from ``edges`` hold score 0 after the
    first renormalization (they receive no mass)."""
    import ray
    import ray.data

    if n_nodes > max_broadcast_nodes:
        raise ValueError(
            f"hits broadcast mode holds two {n_nodes}-long int vectors "
            f"on the driver (> max_broadcast_nodes="
            f"{max_broadcast_nodes}); no join mode exists because the "
            f"renormalizing multiply needs 128-bit arithmetic per task")
    if materialize_edges:
        edges = edges.materialize()  # consumed 2x per iteration

    r0 = mass // n_nodes
    hub = np.full(n_nodes, r0, dtype=np.int64)
    auth = np.full(n_nodes, r0, dtype=np.int64)

    def _pass(vec: np.ndarray, idx_col: str, grp_col: str) -> np.ndarray:
        """sum vec[idx] grouped by grp, renormalized to mass."""
        ref = ray.put(vec)

        def combiner(b: pa.Table, _ref=ref) -> pa.Table:
            v = ray.get(_ref)
            idx = b.column(idx_col).to_numpy(zero_copy_only=False)
            grp = b.column(grp_col).to_numpy(zero_copy_only=False)
            contrib = v[idx]
            order = np.argsort(grp, kind="stable")
            g_s, c_s = grp[order], contrib[order]
            cuts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
            return pa.table({"g": g_s[cuts],
                             "partial": np.add.reduceat(c_s, cuts)})

        acc = np.zeros(n_nodes, dtype=np.int64)
        for blk in edges.map_batches(
                combiner, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            if "g" not in blk.schema.names or blk.num_rows == 0:
                continue
            np.add.at(acc, blk.column("g").to_numpy(zero_copy_only=False),
                      blk.column("partial").to_numpy(zero_copy_only=False))
        s = int(acc.sum())
        if s == 0:
            return acc
        # exact (value * mass) // s in arbitrary precision, then back
        # to int64 (result <= mass by construction)
        obj = acc.astype(object)
        return ((obj * mass) // s).astype(np.int64)

    for _ in range(iterations):
        auth = _pass(hub, src_col, dst_col)   # authorities collect hubs
        hub = _pass(auth, dst_col, src_col)   # hubs collect authorities

    nodes = np.arange(n_nodes, dtype=np.int64)
    scale = float(mass)
    return ray.data.from_arrow(pa.table({
        "node": nodes, "auth_units": auth, "hub_units": hub,
        "auth": auth.astype(np.float64) / scale,
        "hub": hub.astype(np.float64) / scale}))


def hits_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                    iterations: int = 2, mass: int = MASS) -> str:
    """Unrolled-CTE DuckDB oracle over the shared synthetic edge spec
    (pagerank._EDGES_SQL) — HUGEINT carries the renormalizing multiply
    exactly like the driver's Python-int rescale."""
    parts = [f"WITH c AS (SELECT COUNT(*) AS n,"
             f" {mass} // COUNT(*) AS r0 FROM {table}),",
             _EDGES_SQL.format(table=table, id=id_col) + ",",
             f"nodes AS (SELECT {id_col} AS node FROM {table}),",
             "h0 AS (SELECT node, c.r0 AS v FROM nodes, c),",
             "a0 AS (SELECT node, c.r0 AS v FROM nodes, c)"]

    def norm_pass(out: str, src_vec: str, idx: str, grp: str) -> str:
        return f""",
{out}r AS (
  SELECT e.{grp} AS node, SUM(x.v) AS v
  FROM edges e JOIN {src_vec} x ON x.node = e.{idx}
  GROUP BY e.{grp}),
{out}f AS (
  SELECT nd.node, COALESCE(r.v, 0) AS v
  FROM nodes nd LEFT JOIN {out}r r ON r.node = nd.node),
{out}s AS (SELECT SUM(v) AS s FROM {out}f),
{out} AS (
  SELECT node, CASE WHEN s.s = 0 THEN 0
               ELSE CAST((v * {mass}) // s.s AS BIGINT) END AS v
  FROM {out}f, {out}s s)"""

    prev_h = "h0"
    for t in range(1, iterations + 1):
        parts.append(norm_pass(f"a{t}", prev_h, "src", "dst"))
        parts.append(norm_pass(f"h{t}", f"a{t}", "dst", "src"))
        prev_h = f"h{t}"
    k = iterations
    exp = f"1e{len(str(mass)) - 1}"
    parts.append(f"""
SELECT a.node AS {id_col},
       a.v AS auth_units, h.v AS hub_units,
       CAST(a.v AS DOUBLE) / {exp} AS auth,
       CAST(h.v AS DOUBLE) / {exp} AS hub
FROM a{k} a JOIN h{k} h ON h.node = a.node""")
    return "".join(parts)
