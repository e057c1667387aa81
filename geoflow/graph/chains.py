"""Redirect / canonical chain resolution — pointer jumping over a
FUNCTIONAL graph (each node has at most one outgoing edge: HTTP 301
targets, rel=canonical links, short-url hops). Every source resolves
to its chain's terminal (a node with no outgoing edge) plus the hop
count; the crawl-dedup primitive "which URL is the canonical
representative".

Distinct from graph/components.py (undirected, label = min of
component): here direction matters and the answer is the unique
terminal, found by binary doubling — after r rounds every pointer
has advanced 2^r hops, so ``ceil(log2(max_chain_len))`` rounds
resolve any chain.

Modes (the repo's usual bound + escape hatch):
- broadcast (edge count <= max_broadcast_edges): one driver pass of
  vectorized searchsorted doubling over int64 numpy arrays.
- join: each round is one hash self-join (dst -> src) that rewrites
  unresolved pointers and adds the partner's accumulated hops;
  aggregate->join seams sanitized (drop_schemaless_blocks), per-round
  materialize to bound lineage — the pagerank join-mode shape.

Cycles (documented): a pointer inside a cycle never reaches a
terminal; after ``rounds`` its row reports resolved=false with the
pointer wherever doubling left it (2^rounds hops along the cycle).
Redirect graphs in practice are cycle-free after same-node
self-loops are dropped (self-loops ARE dropped here — a
self-canonical URL is already terminal)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["resolve_chains"]


def _resolve_arrays(src: np.ndarray, dst: np.ndarray, rounds: int):
    """Vectorized doubling over src-sorted arrays (src must be
    functional — caller dedups); returns (final, hops, resolved)
    aligned with the input order. Each round is one simultaneous
    d(x) <- d(d(x)) rewrite (numpy fancy indexing reads the whole RHS
    before writing); pointers already at a terminal have no match and
    stay put, so the loop exits early once every chain is resolved."""
    order = np.argsort(src, kind="stable")
    s = src[order]
    d = dst[order].copy()
    hops = np.ones(len(s), dtype=np.int64)
    for _ in range(max(1, rounds)):
        if len(s) == 0:
            break
        pos = np.minimum(np.searchsorted(s, d), len(s) - 1)
        has = s[pos] == d
        if not has.any():
            break
        hops[has] += hops[pos[has]]
        d[has] = d[pos[has]]
    if len(s):
        pos = np.minimum(np.searchsorted(s, d), len(s) - 1)
        resolved = s[pos] != d
    else:
        resolved = np.zeros(0, dtype=bool)
    out_d = np.empty_like(dst)
    out_h = np.empty(len(dst), dtype=np.int64)
    out_r = np.empty(len(dst), dtype=bool)
    out_d[order] = d
    out_h[order] = hops
    out_r[order] = resolved
    return out_d, out_h, out_r


def resolve_chains(edges, src_col: str = "src", dst_col: str = "dst",
                   rounds: int = 16, mode: str = "auto",
                   max_broadcast_edges: int = 4_000_000,
                   num_partitions: int | None = None):
    """Resolve every edge source to its chain terminal. Returns a
    Dataset (src, final, hops, resolved); self-loop edges are
    dropped. ``rounds`` bounds resolvable chain length at 2^rounds."""
    import ray
    import ray.data

    import pyarrow.compute as pc

    from geoflow.join.semijoin import drop_schemaless_blocks

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError("mode must be auto|broadcast|join")

    def drop_self(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.equal(b.column(src_col),
                                           b.column(dst_col))))

    edges = edges.map_batches(drop_self, batch_format="pyarrow")

    if mode == "auto":
        n = edges.count()
        mode = "broadcast" if n <= max_broadcast_edges else "join"

    if mode == "broadcast":
        t = pa.concat_tables(
            b for b in edges.iter_batches(batch_format="pyarrow")
            if b.num_rows and src_col in b.schema.names)
        src = t.column(src_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dst = t.column(dst_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # enforce the functional contract deterministically: one edge
        # per src, smallest dst wins (join mode documents the
        # contract instead — dedupe upstream)
        o = np.lexsort((dst, src))
        su, du = src[o], dst[o]
        keepm = np.r_[True, su[1:] != su[:-1]] if len(su) else \
            np.zeros(0, dtype=bool)
        src, dst = su[keepm], du[keepm]
        d, h, r = _resolve_arrays(src, dst, rounds)
        return ray.data.from_arrow(pa.table({
            "src": src, "final": d, "hops": h, "resolved": r}))

    # join mode: doubling via hash self-joins
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))
    keepalives = []

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(b.column(src_col), pa.int64()),
            "final": pc.cast(b.column(dst_col), pa.int64()),
            "hops": np.ones(b.num_rows, dtype=np.int64)})

    f = edges.map_batches(init, batch_format="pyarrow").materialize()
    # `rounds` is the doubling count in join mode too (parity with
    # broadcast): iteration i advances every pointer up to 2^i hops
    for _ in range(max(1, rounds)):
        part, ka = drop_schemaless_blocks(f.map_batches(
            lambda b: pa.table({"p_src": b.column("src"),
                                "p_final": b.column("final"),
                                "p_hops": b.column("hops")}),
            batch_format="pyarrow"))
        keepalives.append(ka)
        if part is None:
            break
        j = f.join(part, join_type="left_outer",
                   num_partitions=num_partitions,
                   on=("final",), right_on=("p_src",))

        def step(b: pa.Table) -> pa.Table:
            if "p_final" not in b.schema.names:
                # partition with no right rows at all: Ray's join
                # omits the right columns entirely — every pointer
                # here missed (already at a terminal)
                return pa.table({"src": b.column("src"),
                                 "final": b.column("final"),
                                 "hops": b.column("hops")})
            has = pc.is_valid(b.column("p_final"))
            final = pc.if_else(has, b.column("p_final"),
                               b.column("final"))
            hops = pc.if_else(
                has,
                pc.add_checked(b.column("hops"),
                               pc.fill_null(b.column("p_hops"), 0)),
                b.column("hops"))
            return pa.table({"src": b.column("src"),
                             "final": pc.cast(final, pa.int64()),
                             "hops": pc.cast(hops, pa.int64())})

        f = j.map_batches(step, batch_format="pyarrow").materialize()

    srcs, ka = drop_schemaless_blocks(f.map_batches(
        lambda b: pa.table({"t_src": b.column("src")}),
        batch_format="pyarrow"))
    keepalives.append(ka)
    j = f.join(srcs, join_type="left_outer",
               num_partitions=num_partitions,
               on=("final",), right_on=("t_src",))

    def fin(b: pa.Table) -> pa.Table:
        if "t_src" not in b.schema.names:
            # no right rows in this partition: every final missed the
            # source set, i.e. every pointer reached a terminal
            res = pa.array(np.ones(b.num_rows, dtype=bool))
        else:
            res = pc.is_null(b.column("t_src"))
        return pa.table({
            "src": b.column("src"), "final": b.column("final"),
            "hops": b.column("hops"), "resolved": res})

    out = j.map_batches(fin, batch_format="pyarrow")
    out._geoflow_keepalive = keepalives
    return out
