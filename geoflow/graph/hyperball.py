"""HyperBall — per-node neighborhood-function sketches (Boldi &
Vigna, "In-Core Computation of Geometric Centralities with HyperBall",
2013): every node carries an HLL counter of its out-ball; round t
max-merges each node's counter with its out-neighbors', so after T
rounds node v's counter sketches |{w : dist(v, w) <= T}|. This is THE
published web-graph algorithm for reachable-set sizes and
harmonic/closeness centrality at billion-node scale — exactly the
link-graph analysis a 100-TB crawl corpus needs.

Exactness: registers are integer max-combines of splitmix64-derived
(slot, rank) pairs — order-independent, so the terminal register
STATE hash-matches an unrolled-CTE DuckDB oracle (the hll_registers
gating pattern applied per node per round). The float ball-size
estimate is client-side (``hyperball_estimate``) and never hashed.

Scale shape (mirrors traversal.seed_distances broadcast mode): the
(n_nodes x 16) uint8 register matrix rides the object store (ray.put
per round, zero-copy reads); each round is ONE map_batches pass over
the materialized edges emitting per-batch max-combined partials
(O(unique srcs per batch) rows), combined on the driver. 16 B/node —
1e9 nodes = 16 GB, inside ``max_broadcast_nodes``-guarded territory;
a join-mode variant would follow _seed_distances_join verbatim.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ops.sketches import _clz64
from ..text.hashing import mix64
from .traversal import _collect_nodes

P = 4                  # 2^4 = 16 registers per node
M = 1 << P
RMAX = 64 - P + 1      # rank cap (61), matches the SQL LEAST


def init_registers(nodes: np.ndarray) -> np.ndarray:
    """(n, 16) uint8: node's own HLL contribution — slot = top-4 bits
    of splitmix64(node), rank = clz(h << 4) + 1 capped at 61."""
    h = mix64(nodes.astype(np.int64).view(np.uint64))
    j = (h >> np.uint64(64 - P)).astype(np.int64)
    rho = np.minimum(_clz64(h << np.uint64(P)) + 1, RMAX)
    reg = np.zeros((len(nodes), M), np.uint8)
    reg[np.arange(len(nodes)), j] = rho.astype(np.uint8)
    return reg


def pack_registers(reg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """16 uint8 registers → two int64 columns (slots 0-7 / 8-15,
    byte j at bit 8j). Ranks <= 61 keep the top byte below the sign
    bit on both halves."""
    lo = np.zeros(len(reg), np.int64)
    hi = np.zeros(len(reg), np.int64)
    for j in range(8):
        lo |= reg[:, j].astype(np.int64) << (8 * j)
        hi |= reg[:, j + 8].astype(np.int64) << (8 * j)
    return lo, hi


def unpack_registers(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    reg = np.empty((len(lo), M), np.uint8)
    for j in range(8):
        reg[:, j] = (lo >> (8 * j)) & 0xFF
        reg[:, j + 8] = (hi >> (8 * j)) & 0xFF
    return reg


def hyperball_estimate(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Standard HLL estimate per node (alpha_16 = 0.673, linear
    counting below 2.5m with empty registers) — float, client-side
    only; the gated output is the integer register state."""
    reg = unpack_registers(np.asarray(lo, np.int64),
                           np.asarray(hi, np.int64)).astype(np.float64)
    z = np.power(2.0, -reg).sum(axis=1)
    est = 0.673 * M * M / z
    v = (reg == 0).sum(axis=1)
    small = (est <= 2.5 * M) & (v > 0)
    with np.errstate(divide="ignore"):
        lin = M * np.log(M / np.maximum(v, 1))
    return np.where(small, lin, est)


def hyperball(edges, rounds: int = 3, src_col: str = "src",
              dst_col: str = "dst",
              max_broadcast_nodes: int = 50_000_000):
    """Dataset (node, packed_lo, packed_hi): terminal register state
    after ``rounds`` max-merge rounds along OUT-edges (node's ball
    grows toward its successors). Early-stops when a round is a
    fixed point (then the sketch equals the full-reachability one)."""
    import ray
    import ray.data

    edges = edges.materialize()
    nodes = _collect_nodes(edges, [src_col, dst_col])
    if len(nodes) > max_broadcast_nodes:
        raise ValueError(f"{len(nodes)} nodes exceeds "
                         f"max_broadcast_nodes={max_broadcast_nodes}")
    nodes_ref = ray.put(nodes)
    reg = init_registers(nodes)

    rcols = [f"r{j}" for j in range(M)]
    for _ in range(rounds):
        reg_ref = ray.put(reg)

        def combine(b: pa.Table, _n=nodes_ref, _r=reg_ref) -> pa.Table:
            nds = ray.get(_n)
            rg = ray.get(_r)
            s = b.column(src_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            d = b.column(dst_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            contrib = rg[np.searchsorted(nds, d)]
            order = np.argsort(s, kind="stable")
            s, contrib = s[order], contrib[order]
            starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            mx = np.maximum.reduceat(contrib, starts, axis=0)
            cols = {"node": pa.array(s[starts], pa.int64())}
            for j, nm in enumerate(rcols):
                cols[nm] = pa.array(mx[:, j].astype(np.int64))
            return pa.table(cols)

        new = reg.copy()
        for blk in edges.map_batches(
                combine, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            if blk.num_rows == 0 or "node" not in blk.schema.names:
                continue
            idx = np.searchsorted(nodes, blk.column("node").to_numpy(
                zero_copy_only=False))
            arr = np.stack(
                [blk.column(nm).to_numpy(zero_copy_only=False)
                 for nm in rcols], axis=1).astype(np.uint8)
            np.maximum.at(new, idx, arr)
        if np.array_equal(new, reg):
            break
        reg = new

    lo, hi = pack_registers(reg)
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "packed_lo": pa.array(lo), "packed_hi": pa.array(hi)}))
