"""Graph traversal operators: multi-source BFS distances + k-core.

Reference scope: the reference engine has no graph operators — this is
part of the training-data-pipeline layer (crawl-depth / trust-distance
signals and core decomposition for link-graph pruning; public specs:
BFS frontier relaxation, Seidman 1983 k-cores).

Exactness design: both operators are pure INTEGER fixed-point
iterations (hop counts, degree counts), so every per-round quantity is
order-independent and hash-matches an unrolled-CTE DuckDB oracle
generated from the same constants (graph/pagerank.py pattern).

Scale shape (the repo's usual bound + escape hatch):
- ``broadcast``: the per-node state (distance vector / alive mask)
  lives as ONE numpy array in the object store (``ray.put`` per
  round, zero-copy read in every task); each round is a single
  map_batches pass over the materialized edges emitting per-batch
  partials that are combined on the driver (O(n_nodes) rows, NOT
  O(edges) — the per-batch combine already reduced to unique dsts).
  Bounded by ``max_broadcast_nodes``.
- ``join``: state lives in a Dataset; each round is edges JOIN state
  ON src -> groupby(dst).min / count. Aggregate->join seams sanitized
  with drop_schemaless_blocks (Ray 2.49 empty-block poisoning).
Edges are materialized ONCE (consumed every round).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

UNREACHED = np.iinfo(np.int64).max


def _collect_nodes(edges, cols) -> np.ndarray:
    """Sorted unique endpoint keys (driver-side, O(n_nodes) after the
    per-batch unique — bounded by max_broadcast_nodes at call sites)."""
    parts = []
    for blk in edges.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if blk.num_rows == 0 or cols[0] not in blk.schema.names:
            continue
        for c in cols:
            parts.append(np.unique(
                blk.column(c).to_numpy(zero_copy_only=False)))
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts)).astype(np.int64)


# --------------------------------------------------------------------
# multi-source BFS hop distances
# --------------------------------------------------------------------

def seed_distances(edges, seeds, max_hops: int = 4,
                   src_col: str = "src", dst_col: str = "dst",
                   undirected: bool = False, mode: str = "broadcast",
                   max_broadcast_nodes: int = 50_000_000,
                   weight_col: str | None = None):
    """(node, dist) hop distance from the seed set along edges, for
    every endpoint reached within ``max_hops`` (seeds are dist 0).
    ``seeds`` is an int array-like of node keys. Unreached endpoints
    are omitted.

    dist_{t+1}(v) = min(dist_t(v), 1 + min over in-neighbors' dist_t)
    — integer min-plus relaxation; round results are order-independent,
    so the output hash-matches ``seed_distance_oracle_sql``.

    With ``weight_col`` set (integer edge weights ≥ 0) the relaxation
    is Bellman-Ford: dist_t(u) + w(u,v); ``max_hops`` is then the
    round count (|V|-1 rounds give exact SSSP; fewer give the
    documented fixed-round prefix the oracle unrolls identically).
    """
    import ray
    import ray.data

    if mode not in ("broadcast", "join"):
        raise ValueError("mode must be broadcast|join")
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    if mode == "join":
        return _seed_distances_join(edges, seeds, max_hops,
                                    src_col, dst_col, undirected,
                                    weight_col)

    if undirected:
        def sym(b: pa.Table) -> pa.Table:
            s = b.column(src_col).to_numpy(zero_copy_only=False)
            d = b.column(dst_col).to_numpy(zero_copy_only=False)
            t = pa.table({src_col: np.concatenate([s, d]),
                          dst_col: np.concatenate([d, s])})
            if weight_col is not None:
                w = b.column(weight_col).to_numpy(zero_copy_only=False)
                t = t.append_column(weight_col,
                                    pa.array(np.concatenate([w, w])))
            return t
        edges = edges.map_batches(sym, batch_format="pyarrow")
    edges = edges.materialize()

    nodes = _collect_nodes(edges, [src_col, dst_col])
    nodes = np.unique(np.concatenate([nodes, seeds]))
    if len(nodes) > max_broadcast_nodes:
        raise ValueError(
            f"{len(nodes)} nodes exceeds max_broadcast_nodes="
            f"{max_broadcast_nodes}; use mode='join'")
    nodes_ref = ray.put(nodes)
    dist = np.full(len(nodes), UNREACHED, np.int64)
    dist[np.searchsorted(nodes, seeds)] = 0

    for _ in range(max_hops):
        dist_ref = ray.put(dist)

        def relax(b: pa.Table, _n=nodes_ref, _d=dist_ref) -> pa.Table:
            nds = ray.get(_n)
            dv = ray.get(_d)
            s = b.column(src_col).to_numpy(zero_copy_only=False)
            d = b.column(dst_col).to_numpy(zero_copy_only=False)
            ds_ = dv[np.searchsorted(nds, s)]
            live = ds_ != UNREACHED
            if not live.any():
                return pa.table({"node": np.empty(0, np.int64),
                                 "dist": np.empty(0, np.int64)})
            step = (b.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.int64)[live]
                if weight_col is not None else 1)
            d, cand = d[live], ds_[live] + step
            order = np.argsort(d, kind="stable")
            d, cand = d[order], cand[order]
            starts = np.flatnonzero(
                np.r_[True, d[1:] != d[:-1]])
            mins = np.minimum.reduceat(cand, starts)
            return pa.table({"node": d[starts], "dist": mins})

        new = dist.copy()
        for blk in edges.map_batches(
                relax, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            if blk.num_rows == 0 or "node" not in blk.schema.names:
                continue
            idx = np.searchsorted(
                nodes, blk.column("node").to_numpy(zero_copy_only=False))
            np.minimum.at(new, idx,
                          blk.column("dist").to_numpy(
                              zero_copy_only=False))
        if np.array_equal(new, dist):
            break
        dist = new

    keep = dist != UNREACHED
    return ray.data.from_arrow(pa.table({
        "node": nodes[keep], "dist": dist[keep]}))


def _seed_distances_join(edges, seeds, max_hops,
                         src_col, dst_col, undirected,
                         weight_col=None):
    """Escape hatch past the node broadcast bound: state as a Dataset,
    one edges-join + two Min aggregates per round (distributed; pytest
    forces this path on a small graph and checks equality)."""
    import ray.data
    from ray.data.aggregate import Min

    from geoflow.join.semijoin import (cluster_join_partitions,
                                       drop_schemaless_blocks)

    if undirected:
        def sym(b: pa.Table) -> pa.Table:
            s = b.column(src_col).to_numpy(zero_copy_only=False)
            d = b.column(dst_col).to_numpy(zero_copy_only=False)
            t = pa.table({src_col: np.concatenate([s, d]),
                          dst_col: np.concatenate([d, s])})
            if weight_col is not None:
                w = b.column(weight_col).to_numpy(zero_copy_only=False)
                t = t.append_column(weight_col,
                                    pa.array(np.concatenate([w, w])))
            return t
        edges = edges.map_batches(sym, batch_format="pyarrow")
    edges = edges.materialize()

    def as_src(b: pa.Table) -> pa.Table:
        return pa.table({src_col: b.column("node"),
                         "__dist": b.column("dist")})

    def contrib(b: pa.Table) -> pa.Table:
        if "__dist" not in b.schema.names or b.num_rows == 0:
            return pa.table({"node": np.empty(0, np.int64),
                             "dist": np.empty(0, np.int64)})
        step = (b.column(weight_col)
                if weight_col is not None else 1)
        return pa.table({
            "node": b.column(dst_col),
            "dist": pa.compute.add(b.column("__dist"), step)})

    state = ray.data.from_arrow(pa.table({
        "node": seeds, "dist": np.zeros(len(seeds), np.int64)}))
    nparts = cluster_join_partitions()
    for _ in range(max_hops):
        st, _ka = drop_schemaless_blocks(
            state.map_batches(as_src, batch_format="pyarrow"))
        if st is None:
            break
        cand = edges.join(st, join_type="inner",
                          num_partitions=nparts, on=(src_col,)) \
            .map_batches(contrib, batch_format="pyarrow")
        state = state.union(cand).groupby("node").aggregate(
            Min("dist", alias_name="dist"))
        # bound lineage per round; empty-partition hash-agg blocks are
        # 0-column (carry no wrong schema) and union/iterate fine
        state = state.materialize()
    return state.map_batches(
        lambda b: (b.select(["node", "dist"])
                   if "node" in b.schema.names
                   else pa.table({"node": pa.array([], pa.int64()),
                                  "dist": pa.array([], pa.int64())})),
        batch_format="pyarrow")


def seed_distance_oracle_sql(edges_sql: str, seeds_sql: str,
                             max_hops: int = 4,
                             weighted: bool = False) -> str:
    """Unrolled-CTE DuckDB oracle for ``seed_distances`` (directed).
    ``edges_sql`` must define a relation with (src, dst) — plus an
    integer ``w`` when ``weighted`` (Bellman-Ford rounds);
    ``seeds_sql`` one with (node). Generated from the same round
    structure as the kernel so the two cannot drift."""
    step = "e.w" if weighted else "1"
    parts = [f"WITH e AS MATERIALIZED ({edges_sql}),",
             f"d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist"
             f" FROM ({seeds_sql}))"]
    for t in range(1, max_hops + 1):
        parts.append(f""",
d{t} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{t - 1}
    UNION ALL
    SELECT e.dst AS node, p.dist + {step} AS dist
    FROM e JOIN d{t - 1} p ON p.node = e.src
  ) GROUP BY node
)""")
    parts.append(f"\nSELECT node, dist FROM d{max_hops}")
    return "".join(parts)


# --------------------------------------------------------------------
# k-core decomposition (fixed-round peeling)
# --------------------------------------------------------------------

def kcore_nodes(edges, k: int, rounds: int = 8,
                src_col: str = "src", dst_col: str = "dst",
                mode: str = "broadcast",
                max_broadcast_nodes: int = 50_000_000):
    """(node, degree) of nodes surviving ``rounds`` of k-core peeling
    over the undirected, deduplicated edge set (self-loops dropped):
    each round removes every node with remaining degree < k. Converges
    to the exact k-core when a round removes nothing (early-stops);
    with ``rounds`` below the peeling depth the result is the
    documented fixed-round prefix (the oracle unrolls the same count).

    The alive mask is broadcast; each round is ONE map_batches pass
    emitting per-batch (node, partial-degree) rows combined on the
    driver (O(n_nodes)) — no hash-aggregate spin-up per round.
    """
    import ray
    import ray.data

    def undirect(b: pa.Table) -> pa.Table:
        s = b.column(src_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = b.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = s != d
        a = np.minimum(s[m], d[m])
        bb = np.maximum(s[m], d[m])
        # in-batch dedup; cross-batch dups removed by the global unique
        u = np.unique(np.stack([a, bb], axis=1), axis=0)
        return pa.table({"a": u[:, 0], "b": u[:, 1]})

    und = edges.map_batches(undirect, batch_format="pyarrow")
    # global dedup of undirected pairs: one hash groupby (count unused)
    und = und.groupby(["a", "b"]).count().map_batches(
        lambda b: (b.select(["a", "b"])
                   if "a" in b.schema.names
                   else pa.table({"a": pa.array([], pa.int64()),
                                  "b": pa.array([], pa.int64())})),
        batch_format="pyarrow").materialize()

    nodes = _collect_nodes(und, ["a", "b"])
    if len(nodes) > max_broadcast_nodes:
        raise ValueError(
            f"{len(nodes)} nodes exceeds max_broadcast_nodes="
            f"{max_broadcast_nodes}")
    nodes_ref = ray.put(nodes)
    alive = np.ones(len(nodes), bool)
    deg = np.zeros(len(nodes), np.int64)

    for _ in range(rounds):
        alive_ref = ray.put(alive)

        def degrees(b: pa.Table, _n=nodes_ref, _a=alive_ref) -> pa.Table:
            nds, av = ray.get(_n), ray.get(_a)
            a = b.column("a").to_numpy(zero_copy_only=False)
            bb = b.column("b").to_numpy(zero_copy_only=False)
            ia = np.searchsorted(nds, a)
            ib = np.searchsorted(nds, bb)
            m = av[ia] & av[ib]
            ends = np.bincount(
                np.concatenate([ia[m], ib[m]]), minlength=len(nds))
            nz = np.flatnonzero(ends)
            return pa.table({"node": nds[nz],
                             "deg": ends[nz].astype(np.int64)})

        deg = np.zeros(len(nodes), np.int64)
        for blk in und.map_batches(
                degrees, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            if blk.num_rows == 0 or "node" not in blk.schema.names:
                continue
            idx = np.searchsorted(
                nodes, blk.column("node").to_numpy(zero_copy_only=False))
            np.add.at(deg, idx,
                      blk.column("deg").to_numpy(zero_copy_only=False))
        new_alive = alive & (deg >= k)
        if np.array_equal(new_alive, alive):
            break
        alive = new_alive

    return ray.data.from_arrow(pa.table({
        "node": nodes[alive], "degree": deg[alive]}))


def kcore_oracle_sql(edges_sql: str, k: int, rounds: int = 8) -> str:
    """Unrolled-CTE DuckDB oracle for ``kcore_nodes``: same undirected
    dedup + per-round degree count + peel. ``edges_sql`` defines
    (src, dst)."""
    parts = [f"""WITH raw AS ({edges_sql}),
e AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                     greatest(src, dst) AS b
      FROM raw WHERE src <> dst),
n0 AS MATERIALIZED (SELECT a AS node FROM e UNION SELECT b FROM e)"""]
    prev = "n0"
    for t in range(1, rounds + 1):
        parts.append(f""",
d{t} AS MATERIALIZED (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT e.a AS n FROM e
    JOIN {prev} x ON x.node = e.a JOIN {prev} y ON y.node = e.b
    UNION ALL
    SELECT e.b FROM e
    JOIN {prev} x ON x.node = e.a JOIN {prev} y ON y.node = e.b
  ) GROUP BY n
),
n{t} AS MATERIALIZED (SELECT n AS node FROM d{t} WHERE deg >= {k})""")
        prev = f"n{t}"
    parts.append(f"""
SELECT n.node, COALESCE(d.deg, 0) AS degree
FROM {prev} n LEFT JOIN d{rounds} d ON d.n = n.node""")
    return "".join(parts)


# --------------------------------------------------------------------
# landmark (per-seed) BFS distances + harmonic centrality
# --------------------------------------------------------------------

def landmark_distances(edges, landmarks, max_hops: int = 4,
                       src_col: str = "src", dst_col: str = "dst",
                       undirected: bool = False,
                       max_broadcast_cells: int = 200_000_000):
    """(landmark, node, dist) — PER-LANDMARK hop distances (unlike
    seed_distances, which min-reduces over the whole seed set): the
    landmark-BFS primitive of closeness/harmonic centrality (Eppstein
    & Wang 2004 style landmark sampling). All landmarks relax
    SIMULTANEOUSLY: the state is an (L × n_nodes) int64 matrix
    broadcast per round, each round is one map_batches pass whose
    per-batch kernel fancy-indexes the matrix by edge sources and
    min-reduces per destination — L never multiplies the number of
    passes. Unreached (landmark, node) pairs are omitted."""
    import ray
    import ray.data

    landmarks = np.unique(np.asarray(landmarks, dtype=np.int64))
    if undirected:
        def sym(b: pa.Table) -> pa.Table:
            s = b.column(src_col).to_numpy(zero_copy_only=False)
            d = b.column(dst_col).to_numpy(zero_copy_only=False)
            return pa.table({src_col: np.concatenate([s, d]),
                             dst_col: np.concatenate([d, s])})
        edges = edges.map_batches(sym, batch_format="pyarrow")
    edges = edges.materialize()

    nodes = _collect_nodes(edges, [src_col, dst_col])
    nodes = np.unique(np.concatenate([nodes, landmarks]))
    L, n = len(landmarks), len(nodes)
    if L * n > max_broadcast_cells:
        raise ValueError(
            f"landmark_distances: {L}x{n} distance matrix exceeds "
            f"max_broadcast_cells={max_broadcast_cells}")
    nodes_ref = ray.put(nodes)
    dist = np.full((L, n), UNREACHED, np.int64)
    dist[np.arange(L), np.searchsorted(nodes, landmarks)] = 0

    for _ in range(max_hops):
        dist_ref = ray.put(dist)

        def relax(b: pa.Table, _n=nodes_ref, _d=dist_ref) -> pa.Table:
            nds = ray.get(_n)
            dv = ray.get(_d)
            s = b.column(src_col).to_numpy(zero_copy_only=False)
            d = b.column(dst_col).to_numpy(zero_copy_only=False)
            di = np.searchsorted(nds, d)
            order = np.argsort(di, kind="stable")
            di = di[order]
            si = np.searchsorted(nds, s)[order]
            starts = np.flatnonzero(np.r_[True, di[1:] != di[:-1]])
            cand = dv[:, si]                       # (L, E)
            live = cand != UNREACHED
            cand = np.where(live, cand + 1, UNREACHED)
            mins = np.minimum.reduceat(cand, starts, axis=1)
            keep = (mins != UNREACHED).any(axis=0)
            if not keep.any():
                return pa.table({"l": np.empty(0, np.int64),
                                 "node": np.empty(0, np.int64),
                                 "dist": np.empty(0, np.int64)})
            dsts = di[starts][keep]
            mins = mins[:, keep]                   # (L, K)
            K = len(dsts)
            return pa.table({
                "l": pa.array(np.repeat(np.arange(L, dtype=np.int64),
                                        K)),
                "node": pa.array(np.tile(dsts, L)),
                "dist": pa.array(mins.ravel())})

        new = dist.copy()
        for blk in edges.map_batches(
                relax, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            if blk.num_rows == 0 or "node" not in blk.schema.names:
                continue
            li = blk.column("l").to_numpy(zero_copy_only=False)
            ni = np.searchsorted(
                nodes, blk.column("node").to_numpy(
                    zero_copy_only=False))
            np.minimum.at(new, (li, ni),
                          blk.column("dist").to_numpy(
                              zero_copy_only=False))
        if np.array_equal(new, dist):
            break
        dist = new

    li, ni = np.nonzero(dist != UNREACHED)
    return ray.data.from_arrow(pa.table({
        "landmark": pa.array(landmarks[li]),
        "node": pa.array(nodes[ni]),
        "dist": pa.array(dist[li, ni])}))


def harmonic_centrality(edges, landmarks, max_hops: int = 4,
                        scale: int = 2 ** 40,
                        src_col: str = "src", dst_col: str = "dst",
                        undirected: bool = False):
    """(node, h_units, n_reached): landmark-estimated harmonic
    centrality H(v) = Σ_landmarks scale // d(l, v) over 0 < d ≤
    max_hops — integer fixed point (scale // d; float Σ1/d would
    never hash cross-engine, same trick as linkpred's resource
    allocation). n_reached counts contributing landmarks."""
    ld = landmark_distances(edges, landmarks, max_hops,
                            src_col=src_col, dst_col=dst_col,
                            undirected=undirected)

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dist" not in b.schema.names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "h_part": pa.array([], pa.int64()),
                             "r_part": pa.array([], pa.int64())})
        d = b.column("dist").to_numpy(zero_copy_only=False)
        node = b.column("node").to_numpy(zero_copy_only=False)
        m = d > 0
        return pa.table({"node": pa.array(node[m]),
                         "h_part": pa.array(scale // d[m]),
                         "r_part": pa.array(np.ones(m.sum(),
                                                    np.int64))})

    from ray.data.aggregate import Sum

    agg = ld.map_batches(score, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("h_part"), Sum("r_part"))

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.schema.names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "h_units": pa.array([], pa.int64()),
                             "n_reached": pa.array([], pa.int64())})
        return pa.table({
            "node": b.column("node"),
            "h_units": b.column("sum(h_part)"),
            "n_reached": b.column("sum(r_part)")})

    return agg.map_batches(fin, batch_format="pyarrow")


def landmark_distance_oracle_sql(edges_sql: str, landmarks_sql: str,
                                 max_hops: int = 4) -> str:
    """Unrolled-CTE oracle for ``landmark_distances``: ONE chain over
    (landmark, node) pairs — each round relaxes every landmark's
    frontier in the same GROUP BY (mirroring the kernel's matrix
    relaxation). ``landmarks_sql`` defines a relation with (node)."""
    parts = [f"WITH e AS MATERIALIZED ({edges_sql}),",
             f"p0 AS (SELECT node AS landmark, node,"
             f" CAST(0 AS BIGINT) AS dist FROM ({landmarks_sql}))"]
    for t in range(1, max_hops + 1):
        parts.append(f""",
p{t} AS MATERIALIZED (
  SELECT landmark, node, MIN(dist) AS dist FROM (
    SELECT landmark, node, dist FROM p{t - 1}
    UNION ALL
    SELECT p.landmark, e.dst AS node, p.dist + 1 AS dist
    FROM e JOIN p{t - 1} p ON p.node = e.src
  ) GROUP BY landmark, node
)""")
    parts.append(f"\nSELECT landmark, node, dist FROM p{max_hops}")
    return "".join(parts)


def harmonic_oracle_sql(edges_sql: str, landmarks_sql: str,
                        max_hops: int = 4, scale: int = 2 ** 40) -> str:
    """Oracle for ``harmonic_centrality`` over the landmark-distance
    chain."""
    ld = landmark_distance_oracle_sql(edges_sql, landmarks_sql,
                                      max_hops)
    return f"""
WITH ld AS MATERIALIZED ({ld})
SELECT node,
       CAST(SUM({scale} // dist) AS BIGINT) AS h_units,
       CAST(COUNT(*) AS BIGINT) AS n_reached
FROM ld WHERE dist > 0 GROUP BY node"""


def shortest_path_counts(edges, seeds, max_hops: int = 4,
                         src_col: str = "src", dst_col: str = "dst",
                         max_broadcast_nodes: int = 50_000_000):
    """(node, dist, sig): BFS hop distance from the seed set plus the
    NUMBER of distinct shortest edge-paths realizing it — the σ
    (sigma) stage of Brandes' betweenness (Brandes 2001), the part
    that is integer-exact and therefore hash-gateable. Seeds have
    dist 0, sig 1; a node first reached at layer t gets
    sig = Σ over frontier in-edges of the predecessor's sig (layer
    sums are order-independent — exact on both engines). Parallel
    (duplicate) edges count as distinct paths, mirrored by the SQL
    twin. Broadcast mode: the (dist, sig) vectors ride the object
    store; each layer is one map_batches pass emitting per-batch
    partial sums + an O(n_nodes) driver combine; beyond
    ``max_broadcast_nodes`` (loud ValueError) the layer recursion
    distributes as ``_seed_distances_join``-style rounds (frontier
    join + Sum aggregate + settled-set anti-join)."""
    import ray
    import ray.data

    edges = edges.materialize()
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    nodes = _collect_nodes(edges, [src_col, dst_col])
    nodes = np.unique(np.concatenate([nodes, seeds]))
    if len(nodes) > max_broadcast_nodes:
        raise ValueError(f"{len(nodes)} nodes exceeds "
                         f"max_broadcast_nodes={max_broadcast_nodes}")
    nodes_ref = ray.put(nodes)
    dist = np.full(len(nodes), UNREACHED, np.int64)
    sig = np.zeros(len(nodes), np.int64)
    si = np.searchsorted(nodes, seeds)
    dist[si] = 0
    sig[si] = 1

    for t in range(1, max_hops + 1):
        dist_ref = ray.put(dist)
        sig_ref = ray.put(sig)

        def contrib(b: pa.Table, _n=nodes_ref, _d=dist_ref,
                    _s=sig_ref, _t=t) -> pa.Table:
            nds, dv, sv = ray.get(_n), ray.get(_d), ray.get(_s)
            s = b.column(src_col).to_numpy(zero_copy_only=False)
            d = b.column(dst_col).to_numpy(zero_copy_only=False)
            sidx = np.searchsorted(nds, s)
            didx = np.searchsorted(nds, d)
            m = (dv[sidx] == _t - 1) & (dv[didx] == UNREACHED)
            if not m.any():
                return pa.table({"node": np.empty(0, np.int64),
                                 "c": np.empty(0, np.int64)})
            tgt, c = didx[m], sv[sidx[m]]
            order = np.argsort(tgt, kind="stable")
            tgt, c = tgt[order], c[order]
            starts = np.flatnonzero(np.r_[True, tgt[1:] != tgt[:-1]])
            return pa.table({
                "node": pa.array(nodes[tgt[starts]]),
                "c": pa.array(np.add.reduceat(c, starts))})

        add = np.zeros(len(nodes), np.int64)
        for blk in edges.map_batches(
                contrib, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            if blk.num_rows == 0 or "node" not in blk.schema.names:
                continue
            idx = np.searchsorted(nodes, blk.column("node")
                                  .to_numpy(zero_copy_only=False))
            np.add.at(add, idx,
                      blk.column("c").to_numpy(zero_copy_only=False))
        hit = add > 0
        if not hit.any():
            break
        dist[hit] = t
        sig[hit] = add[hit]

    reached = dist != UNREACHED
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes[reached]),
        "dist": pa.array(dist[reached]),
        "sig": pa.array(sig[reached])}))


def path_counts_oracle_sql(edges_sql: str, seeds_sql: str,
                           max_hops: int = 4) -> str:
    """Unrolled-CTE DuckDB oracle for ``shortest_path_counts`` —
    generated from the same layer structure as the kernel."""
    parts = [f"WITH e AS MATERIALIZED ({edges_sql}),",
             "l0 AS MATERIALIZED (SELECT node,"
             " CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sig"
             f" FROM ({seeds_sql})),",
             "s0 AS MATERIALIZED (SELECT * FROM l0)"]
    for t in range(1, max_hops + 1):
        parts.append(f""",
l{t} AS MATERIALIZED (
  SELECT e.dst AS node, CAST({t} AS BIGINT) AS dist,
         CAST(SUM(p.sig) AS BIGINT) AS sig
  FROM e JOIN l{t - 1} p ON p.node = e.src
  LEFT JOIN s{t - 1} st ON st.node = e.dst
  WHERE st.node IS NULL
  GROUP BY e.dst),
s{t} AS MATERIALIZED (
  SELECT * FROM s{t - 1} UNION ALL SELECT * FROM l{t})""")
    parts.append(f"\nSELECT node, dist, sig FROM s{max_hops}")
    return "".join(parts)


def temporal_reach(edges, seeds, rounds: int = 4,
                   src_col: str = "src", dst_col: str = "dst",
                   t_col: str = "t",
                   max_broadcast_nodes: int = 50_000_000):
    """Time-respecting reachability (temporal-graph min-arrival):
    an edge (u, v, t) is traversable only when t >= arrival(u), and
    arriving through it costs unit delay —

        arr_{r+1}(v) = min(arr_r(v),
                           min over edges (u,v,t), t >= arr_r(u)
                               of t + 1)

    Seeds start at arrival 0. Integer min per round is order-
    independent (hash-exact); ``rounds`` below the temporal diameter
    gives the documented fixed-round prefix the oracle unrolls
    identically (unlike BFS, later rounds can still improve early
    nodes — time constraints break layer monotonicity, which is
    exactly what makes this operator distinct). Broadcast shape:
    one map_batches pass per round + O(n_nodes) driver combine;
    beyond ``max_broadcast_nodes`` (loud ValueError) the
    state-as-Dataset round shape of ``_seed_distances_join`` applies
    with the relax condition as a post-join filter."""
    import ray
    import ray.data

    edges = edges.materialize()
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    nodes = _collect_nodes(edges, [src_col, dst_col])
    nodes = np.unique(np.concatenate([nodes, seeds]))
    if len(nodes) > max_broadcast_nodes:
        raise ValueError(f"{len(nodes)} nodes exceeds "
                         f"max_broadcast_nodes={max_broadcast_nodes}")
    nodes_ref = ray.put(nodes)
    arr = np.full(len(nodes), UNREACHED, np.int64)
    arr[np.searchsorted(nodes, seeds)] = 0

    for _ in range(rounds):
        arr_ref = ray.put(arr)

        def relax(b: pa.Table, _n=nodes_ref, _a=arr_ref) -> pa.Table:
            nds, av = ray.get(_n), ray.get(_a)
            s = b.column(src_col).to_numpy(zero_copy_only=False)
            d = b.column(dst_col).to_numpy(zero_copy_only=False)
            t = b.column(t_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            asrc = av[np.searchsorted(nds, s)]
            m = (asrc != UNREACHED) & (t >= asrc)
            if not m.any():
                return pa.table({"node": np.empty(0, np.int64),
                                 "arr": np.empty(0, np.int64)})
            tgt, cand = d[m], t[m] + 1
            order = np.argsort(tgt, kind="stable")
            tgt, cand = tgt[order], cand[order]
            starts = np.flatnonzero(np.r_[True, tgt[1:] != tgt[:-1]])
            return pa.table({
                "node": pa.array(tgt[starts]),
                "arr": pa.array(np.minimum.reduceat(cand, starts))})

        new = arr.copy()
        for blk in edges.map_batches(
                relax, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            if blk.num_rows == 0 or "node" not in blk.schema.names:
                continue
            idx = np.searchsorted(nodes, blk.column("node")
                                  .to_numpy(zero_copy_only=False))
            np.minimum.at(new, idx, blk.column("arr")
                          .to_numpy(zero_copy_only=False))
        if (new == arr).all():
            break
        arr = new

    reached = arr != UNREACHED
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes[reached]),
        "arr": pa.array(arr[reached])}))


def temporal_reach_oracle_sql(edges_sql: str, seeds_sql: str,
                              rounds: int = 4) -> str:
    """Unrolled-CTE DuckDB oracle for ``temporal_reach`` — same
    round structure as the kernel."""
    parts = [f"WITH e AS MATERIALIZED ({edges_sql}),",
             "a0 AS (SELECT node, CAST(0 AS BIGINT) AS arr"
             f" FROM ({seeds_sql}))"]
    for r in range(1, rounds + 1):
        parts.append(f""",
a{r} AS MATERIALIZED (
  SELECT node, MIN(arr) AS arr FROM (
    SELECT node, arr FROM a{r - 1}
    UNION ALL
    SELECT e.dst AS node, e.t + 1 AS arr
    FROM e JOIN a{r - 1} p ON p.node = e.src AND e.t >= p.arr
  ) GROUP BY node
)""")
    parts.append(f"\nSELECT node, arr FROM a{rounds}")
    return "".join(parts)


def temporal_reach_join(edges, seeds, rounds: int = 4,
                        src_col: str = "src", dst_col: str = "dst",
                        t_col: str = "t"):
    """Distributed ``temporal_reach``: arrival state as a Dataset —
    per round one edges⋈state hash join, a post-join time filter
    (t >= arr), and a groupby-min merge. The aggregate→join seam is
    sanitized per the drop_schemaless_blocks contract. Same fixed-
    round semantics as the broadcast kernel (pytest forces this path
    and checks equality)."""
    import ray.data
    from ray.data.aggregate import Min

    from geoflow.join.semijoin import (cluster_join_partitions,
                                       drop_schemaless_blocks)

    edges = edges.materialize()
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    state = ray.data.from_arrow(pa.table({
        "node": pa.array(seeds),
        "arr": pa.array(np.zeros(len(seeds), np.int64))}))
    nparts = cluster_join_partitions()
    keep = []
    for _ in range(rounds):
        def as_src(b: pa.Table) -> pa.Table:
            return pa.table({src_col: b.column("node"),
                             "__arr": b.column("arr")})

        st, ka = drop_schemaless_blocks(
            state.map_batches(as_src, batch_format="pyarrow"))
        if st is None:
            break
        keep.append(ka)
        cand = edges.join(st, join_type="inner",
                          num_partitions=nparts, on=(src_col,))

        def relax(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "__arr" not in b.schema.names:
                return pa.table({"node": np.empty(0, np.int64),
                                 "arr": np.empty(0, np.int64)})
            t = b.column(t_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            arr = b.column("__arr").to_numpy(
                zero_copy_only=False).astype(np.int64)
            ok = t >= arr
            return pa.table({
                "node": b.column(dst_col).filter(pa.array(ok)),
                "arr": pa.array(t[ok] + 1)})

        nxt = cand.map_batches(relax, batch_format="pyarrow")
        state = state.union(nxt).groupby("node") \
            .aggregate(Min("arr", alias_name="arr"))
        state = state.materialize()
    return state


def shortest_path_counts_join(edges, seeds, max_hops: int = 4,
                              src_col: str = "src",
                              dst_col: str = "dst"):
    """Distributed ``shortest_path_counts``: layered BFS with the
    frontier and settled set as Datasets — per layer one
    edges⋈frontier join, a groupby-sum of predecessor sigs, and a
    duplicate-safe ANTI key filter against the settled set
    (join/semijoin.partitioned_key_filter). Same semantics as the
    broadcast kernel (pytest forces this path and checks
    equality)."""
    import ray.data
    from ray.data.aggregate import Sum

    from geoflow.join.semijoin import (cluster_join_partitions,
                                       drop_schemaless_blocks,
                                       partitioned_key_filter)

    edges = edges.materialize()
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    settled = ray.data.from_arrow(pa.table({
        "node": pa.array(seeds),
        "dist": pa.array(np.zeros(len(seeds), np.int64)),
        "sig": pa.array(np.ones(len(seeds), np.int64))}))
    frontier = settled
    nparts = cluster_join_partitions()
    keepalive = []
    for t in range(1, max_hops + 1):
        def as_src(b: pa.Table) -> pa.Table:
            return pa.table({src_col: b.column("node"),
                             "__sig": b.column("sig")})

        fr, ka = drop_schemaless_blocks(
            frontier.map_batches(as_src, batch_format="pyarrow"))
        if fr is None:
            break
        keepalive.append(ka)
        cand = edges.join(fr, join_type="inner",
                          num_partitions=nparts, on=(src_col,))

        def emit(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "__sig" not in b.schema.names:
                return pa.table({"node": np.empty(0, np.int64),
                                 "__sig": np.empty(0, np.int64)})
            return pa.table({"node": b.column(dst_col),
                             "__sig": b.column("__sig")})

        summed = cand.map_batches(emit, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("__sig",
                                           alias_name="__sig"))
        summed, ka2 = drop_schemaless_blocks(summed)
        if summed is None:
            break
        keepalive.append(ka2)
        new = partitioned_key_filter(summed, settled, "node",
                                     anti=True,
                                     num_partitions=nparts)

        def fin(b: pa.Table, _t=t) -> pa.Table:
            if b.num_rows == 0 or "__sig" not in b.schema.names:
                return pa.table({
                    "node": np.empty(0, np.int64),
                    "dist": np.empty(0, np.int64),
                    "sig": np.empty(0, np.int64)})
            return pa.table({
                "node": b.column("node"),
                "dist": pa.array(np.full(b.num_rows, _t, np.int64)),
                "sig": b.column("__sig")})

        frontier = new.map_batches(fin,
                                   batch_format="pyarrow") \
            .materialize()
        if frontier.count() == 0:
            break
        settled = settled.union(frontier).materialize()
    return settled
