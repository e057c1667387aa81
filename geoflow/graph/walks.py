"""Deterministic random-walk corpus generation over a directed link
graph — the DeepWalk/node2vec input stage (Perozzi et al. 2014): fixed-
length truncated walks from every start node, used downstream as
"sentences" for embedding training.

Determinism (resume/retry + oracle-gating): the neighbor choice at
step t of walk w standing on node v is

    r = mix64(v * 2^21 + w * 8 + t)  %  outdeg(v)
    next = the r-th out-neighbor of v in ascending dst order
           (duplicate dsts keep their multiplicity — the multiset
           rank is deterministic because ties are equal values)

mix64 is the repo's splitmix64 avalanche (text/hashing.mix64), exactly
reproducible in DuckDB HUGEINT SQL via ``_sql_mix64_chain`` — so whole
walks are value-gateable step by step.

Modes:
- ``broadcast``: the ranked adjacency (src-sorted dst array + CSR
  offsets) is collected once (bounded by ``max_broadcast_edges``,
  16 B/edge) and shipped via ray.put; ONE map_batches pass over the
  start nodes advances all walks lockstep-vectorized — zero shuffles.
- ``join``: escape hatch past the broadcast bound — the adjacency is
  ranked once (groupby(src) + in-group dst sort), each step is one
  hash join of the frontier on the packed (node, rank) key. walk_len-1
  joins, each 24 B/row; seams sanitized with drop_schemaless_blocks
  (map_groups lineages emit 0-column empties, CLAUDE.md).

Dead ends (outdeg 0) truncate the walk (standard DeepWalk behavior).
Output rows: (walk_id, step, node) with walk_id = start * walks_per_node
+ rep.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..text.hashing import mix64

_STEP_MULT = np.uint64(1 << 21)
_WALK_MULT = np.uint64(8)
_MAX_RANK_BITS = 20   # join mode packs (node, rank); outdeg < 2^20


def _step_hash(cur: np.ndarray, walk_id: np.ndarray,
               t: int) -> np.ndarray:
    return mix64(cur.astype(np.uint64) * _STEP_MULT
                 + walk_id.astype(np.uint64) * _WALK_MULT
                 + np.uint64(t))


def random_walks(edges, starts, walk_len: int = 4,
                 walks_per_node: int = 2,
                 src_col: str = "src", dst_col: str = "dst",
                 start_col: str = "node", mode: str = "broadcast",
                 max_broadcast_edges: int = 100_000_000):
    """Dataset (walk_id, step, node). ``starts`` is a Dataset with
    ``start_col`` int64 node keys (walks also start from nodes with no
    out-edges — they yield a single step-0 row)."""
    if mode not in ("broadcast", "join"):
        raise ValueError("mode must be broadcast|join")
    if mode == "join":
        return _random_walks_join(edges, starts, walk_len,
                                  walks_per_node, src_col, dst_col,
                                  start_col)

    import ray
    import ray.data

    s_l, d_l = [], []
    n_edges = 0
    for blk in edges.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if src_col not in blk.schema.names or blk.num_rows == 0:
            continue
        n_edges += blk.num_rows
        if n_edges > max_broadcast_edges:
            raise ValueError(
                f"edge count exceeds max_broadcast_edges="
                f"{max_broadcast_edges}; use mode='join'")
        s_l.append(blk.column(src_col).to_numpy(
            zero_copy_only=False).astype(np.int64))
        d_l.append(blk.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64))
    s = np.concatenate(s_l) if s_l else np.empty(0, np.int64)
    d = np.concatenate(d_l) if d_l else np.empty(0, np.int64)
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    nodes = np.unique(s)
    head = np.searchsorted(s, nodes)
    head = np.append(head, len(s))
    adj_ref = ray.put((nodes, head, d))

    def walk(batch: pa.Table, _a=adj_ref) -> pa.Table:
        nds, hd, dst = ray.get(_a)
        st = batch.column(start_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cur = np.repeat(st, walks_per_node)
        wid = (cur * walks_per_node
               + np.tile(np.arange(walks_per_node, dtype=np.int64),
                         len(st)))
        out_w = [wid]
        out_t = [np.zeros(len(cur), np.int64)]
        out_n = [cur.copy()]
        alive = np.ones(len(cur), bool)
        for t in range(1, walk_len):
            pos = np.searchsorted(nds, cur).clip(0, max(len(nds) - 1, 0))
            found = (nds[pos] == cur) if len(nds) else \
                np.zeros(len(cur), bool)
            alive = alive & found
            if not alive.any():
                break
            deg = np.where(alive, hd[pos + 1] - hd[pos], 1)
            h = _step_hash(cur, wid, t)
            r = (h % deg.astype(np.uint64)).astype(np.int64)
            nxt = np.where(alive, dst[(hd[pos] + r).clip(0, len(dst) - 1)]
                           if len(dst) else cur, cur)
            cur = np.where(alive, nxt, cur)
            out_w.append(wid[alive])
            out_t.append(np.full(int(alive.sum()), t, np.int64))
            out_n.append(cur[alive])
        return pa.table({"walk_id": np.concatenate(out_w),
                         "step": np.concatenate(out_t),
                         "node": np.concatenate(out_n)})

    return starts.map_batches(walk, batch_format="pyarrow")


def _ranked_edges(edges, src_col, dst_col):
    """(src, rank-within-src by dst asc, dst, outdeg) via one
    groupby(src) shuffle."""

    def rank_group(group: pa.Table) -> pa.Table:
        s = group.column(src_col).to_numpy(zero_copy_only=False)
        d = group.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(d, kind="stable")
        deg = len(d)
        if deg >= (1 << _MAX_RANK_BITS):
            raise ValueError("outdeg exceeds join-mode rank packing")
        return pa.table({
            "key": np.int64(s[0]) * (1 << _MAX_RANK_BITS)
            + np.arange(deg, dtype=np.int64),
            "nxt": d[order],
            "deg": np.full(deg, deg, np.int64)})

    return edges.groupby(src_col).map_groups(rank_group,
                                             batch_format="pyarrow")


def _random_walks_join(edges, starts, walk_len, walks_per_node,
                       src_col, dst_col, start_col):
    """Escape hatch: one hash join per step on the packed (node, rank)
    key. The frontier learns outdeg from the joined edge row, so each
    step needs TWO joins: deg lookup (key rank 0) then pick — folded
    into one by joining on rank 0 first to fetch deg, then a second
    join with the hashed rank. To keep it one join per step instead,
    the frontier carries the CURRENT node's deg, fetched by joining on
    rank-0 rows (every node with out-edges has one)."""
    import ray.data

    from ..join.semijoin import (cluster_join_partitions,
                                 drop_schemaless_blocks)

    ranked, keep1 = drop_schemaless_blocks(
        _ranked_edges(edges, src_col, dst_col))
    if ranked is None:
        # no edges at all: every walk is its step-0 row
        def solo(b: pa.Table) -> pa.Table:
            st = b.column(start_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            cur = np.repeat(st, walks_per_node)
            wid = (cur * walks_per_node
                   + np.tile(np.arange(walks_per_node, dtype=np.int64),
                             len(st)))
            return pa.table({"walk_id": wid,
                             "step": np.zeros(len(cur), np.int64),
                             "node": cur})
        return starts.map_batches(solo, batch_format="pyarrow")
    ranked = ranked.materialize()
    _ = keep1

    def front0(b: pa.Table) -> pa.Table:
        st = b.column(start_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cur = np.repeat(st, walks_per_node)
        wid = (cur * walks_per_node
               + np.tile(np.arange(walks_per_node, dtype=np.int64),
                         len(st)))
        return pa.table({"walk_id": wid, "cur": cur})

    frontier = starts.map_batches(front0, batch_format="pyarrow")
    outputs = []

    def emit(step):
        def f(b: pa.Table) -> pa.Table:
            if "walk_id" not in b.schema.names or b.num_rows == 0:
                return pa.table({"walk_id": pa.array([], pa.int64()),
                                 "step": pa.array([], pa.int64()),
                                 "node": pa.array([], pa.int64())})
            return pa.table({
                "walk_id": b.column("walk_id"),
                "step": pa.array(
                    np.full(b.num_rows, step, np.int64)),
                "node": b.column("cur")})
        return f

    outputs.append(frontier.map_batches(emit(0),
                                        batch_format="pyarrow"))
    keepalives = [keep1]
    nparts = cluster_join_partitions()
    for t in range(1, walk_len):
        # join 1: fetch deg via the rank-0 key
        def key0(b: pa.Table) -> pa.Table:
            if "cur" not in b.schema.names or b.num_rows == 0:
                return pa.table({"walk_id": pa.array([], pa.int64()),
                                 "cur": pa.array([], pa.int64()),
                                 "key": pa.array([], pa.int64())})
            cur = b.column("cur").to_numpy(zero_copy_only=False)
            return pa.table({"walk_id": b.column("walk_id"),
                             "cur": b.column("cur"),
                             "key": cur * (1 << _MAX_RANK_BITS)})

        f0, k0 = drop_schemaless_blocks(
            frontier.map_batches(key0, batch_format="pyarrow"))
        if f0 is None:
            break
        keepalives.append(k0)
        with_deg = f0.join(ranked, join_type="inner",
                           num_partitions=nparts, on=("key",))

        def pick_key(step):
            def f(b: pa.Table) -> pa.Table:
                if "walk_id" not in b.schema.names or b.num_rows == 0 \
                        or "deg" not in b.schema.names:
                    return pa.table({
                        "walk_id": pa.array([], pa.int64()),
                        "key": pa.array([], pa.int64())})
                wid = b.column("walk_id").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                cur = b.column("cur").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                deg = b.column("deg").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                h = _step_hash(cur, wid, step)
                r = (h % deg.astype(np.uint64)).astype(np.int64)
                return pa.table({
                    "walk_id": wid,
                    "key": cur * (1 << _MAX_RANK_BITS) + r})
            return f

        f1, k1 = drop_schemaless_blocks(
            with_deg.map_batches(pick_key(t), batch_format="pyarrow"))
        if f1 is None:
            break
        keepalives.append(k1)
        stepped = f1.join(ranked, join_type="inner",
                          num_partitions=nparts, on=("key",))

        def advance(b: pa.Table) -> pa.Table:
            if "walk_id" not in b.schema.names or b.num_rows == 0 \
                    or "nxt" not in b.schema.names:
                return pa.table({"walk_id": pa.array([], pa.int64()),
                                 "cur": pa.array([], pa.int64())})
            return pa.table({"walk_id": b.column("walk_id"),
                             "cur": b.column("nxt")})

        nf, k2 = drop_schemaless_blocks(
            stepped.map_batches(advance, batch_format="pyarrow"))
        if nf is None:
            break
        keepalives.append(k2)
        frontier = nf.materialize()
        outputs.append(frontier.map_batches(emit(t),
                                            batch_format="pyarrow"))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    res = out.materialize()
    _ = keepalives
    return res


def skipgram_pairs(walks_ds, window: int = 2,
                   walk_col: str = "walk_id", step_col: str = "step",
                   node_col: str = "node"):
    """(center, context, n_pairs) skip-gram training pairs from a walk
    Dataset — the DeepWalk output stage: every ordered pair of nodes
    within ``window`` steps of each other on the same walk (center !=
    position, both directions), counted over all walks. One
    groupby(walk) shuffle (walks are short — the group pass is O(len *
    window) per walk) + one pair-sized groupby-sum."""
    import pyarrow.compute as pc

    def per_walk(group: pa.Table) -> pa.Table:
        st = group.column(step_col).to_numpy(zero_copy_only=False)
        nd = group.column(node_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(st, kind="stable")
        ns = nd[order]
        cs, xs = [], []
        for off in range(1, window + 1):
            if len(ns) <= off:
                break
            cs.append(ns[:-off])
            xs.append(ns[off:])
            cs.append(ns[off:])
            xs.append(ns[:-off])
        if not cs:
            return pa.table({"center": pa.array([], pa.int64()),
                             "context": pa.array([], pa.int64())})
        return pa.table({"center": np.concatenate(cs),
                         "context": np.concatenate(xs)})

    pairs = walks_ds.groupby(walk_col).map_groups(
        per_walk, batch_format="pyarrow")
    out = pairs.groupby(["center", "context"]).count()

    def rename(b: pa.Table) -> pa.Table:
        if "center" not in b.schema.names or b.num_rows == 0:
            return pa.table({"center": pa.array([], pa.int64()),
                             "context": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        return pa.table({"center": b.column("center"),
                         "context": b.column("context"),
                         "n_pairs": pc.cast(b.column("count()"),
                                            pa.int64())})

    return out.map_batches(rename, batch_format="pyarrow")


_N2V_RET = 4   # weight for returning to prev      (1/p with p=1/2)
_N2V_IN = 2    # weight for prev's other neighbors (1)
_N2V_OUT = 1   # weight for exploring outward      (1/q with q=2)


def node2vec_walks(edges, starts, walk_len: int = 4,
                   walks_per_node: int = 2,
                   weights=(_N2V_RET, _N2V_IN, _N2V_OUT),
                   src_col: str = "src", dst_col: str = "dst",
                   start_col: str = "node",
                   max_broadcast_edges: int = 100_000_000):
    """Second-order biased walks (node2vec, Grover & Leskovec 2016)
    with INTEGER weights: a candidate next-hop x from cur (given prev)
    weighs ``ret`` if x == prev, ``inw`` if the edge prev->x exists,
    else ``out`` (defaults 4:2:1 == p=1/2, q=2 scaled integral). The
    pick is x = first neighbor (dst-ascending) whose cumulative weight
    exceeds mix64(cur*2^21 + walk*8 + t) % total_weight — every step
    is integer arithmetic, reproducible in SQL window cumsums. Step 1
    has no prev (sentinel -1): all candidates weigh ``out`` (uniform).

    Broadcast mode only: the ranked adjacency AND the distinct-edge
    membership key array ship once via ray.put (the second-order
    membership test is what a join-mode variant would need an extra
    per-step join for — documented extension). Dead ends truncate."""
    import ray
    import ray.data

    ret_w, in_w, out_w = (int(w) for w in weights)
    s_l, d_l = [], []
    n_edges = 0
    for blk in edges.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if src_col not in blk.schema.names or blk.num_rows == 0:
            continue
        n_edges += blk.num_rows
        if n_edges > max_broadcast_edges:
            raise ValueError(
                f"edge count exceeds max_broadcast_edges="
                f"{max_broadcast_edges}")
        s_l.append(blk.column(src_col).to_numpy(
            zero_copy_only=False).astype(np.int64))
        d_l.append(blk.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64))
    s = np.concatenate(s_l) if s_l else np.empty(0, np.int64)
    d = np.concatenate(d_l) if d_l else np.empty(0, np.int64)
    if len(s) and (s.max() >= (1 << 31) or d.max() >= (1 << 31)):
        raise ValueError("node ids must fit 31 bits for the packed "
                         "membership key")
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    nodes = np.unique(s)
    head = np.searchsorted(s, nodes)
    head = np.append(head, len(s))
    ekeys = np.unique(s * (1 << 32) + d)
    adj_ref = ray.put((nodes, head, d, ekeys))

    def walk(batch: pa.Table, _a=adj_ref) -> pa.Table:
        nds, hd, dst, ek = ray.get(_a)
        st = batch.column(start_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cur = np.repeat(st, walks_per_node)
        wid = (cur * walks_per_node
               + np.tile(np.arange(walks_per_node, dtype=np.int64),
                         len(st)))
        prev = np.full(len(cur), -1, np.int64)
        out_w_l = [wid]
        out_t = [np.zeros(len(cur), np.int64)]
        out_n = [cur.copy()]
        alive = np.ones(len(cur), bool)
        for t in range(1, walk_len):
            pos = np.searchsorted(nds, cur).clip(0, max(len(nds) - 1, 0))
            found = (nds[pos] == cur) if len(nds) else \
                np.zeros(len(cur), bool)
            alive = alive & found
            if not alive.any():
                break
            ai = np.nonzero(alive)[0]
            deg = hd[pos[ai] + 1] - hd[pos[ai]]
            # flat expansion of each alive walk's candidate list
            total_c = int(deg.sum())
            seg = np.repeat(np.arange(len(ai)), deg)
            base = np.concatenate([[0], np.cumsum(deg)[:-1]])
            local = np.arange(total_c) - np.repeat(base, deg)
            cand = dst[np.repeat(hd[pos[ai]], deg) + local]
            pw = np.repeat(prev[ai], deg)
            w = np.full(total_c, out_w, np.int64)
            mk = pw * (1 << 32) + cand
            mp = np.searchsorted(ek, mk).clip(0, max(len(ek) - 1, 0))
            is_in = (ek[mp] == mk) if len(ek) else \
                np.zeros(total_c, bool)
            w[is_in & (pw >= 0)] = in_w
            w[cand == pw] = ret_w
            cum = np.cumsum(w)
            seg_tot_incl = cum[np.cumsum(deg) - 1]
            seg_base = np.concatenate([[0], seg_tot_incl[:-1]])
            tot = seg_tot_incl - seg_base
            h = _step_hash(cur[ai], wid[ai], t)
            x = (h % tot.astype(np.uint64)).astype(np.int64)
            # pick idx = count of candidates with cum_excl <= x
            thresh = seg_base + x
            flag = (cum <= np.repeat(thresh, deg))
            pick = np.zeros(len(ai), np.int64)
            np.add.at(pick, seg, flag.astype(np.int64))
            nxt = cand[base + pick]
            prev[ai] = cur[ai]
            cur[ai] = nxt
            out_w_l.append(wid[ai])
            out_t.append(np.full(len(ai), t, np.int64))
            out_n.append(nxt.copy())
        return pa.table({"walk_id": np.concatenate(out_w_l),
                         "step": np.concatenate(out_t),
                         "node": np.concatenate(out_n)})

    return starts.map_batches(walk, batch_format="pyarrow")
