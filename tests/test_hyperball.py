"""HyperBall sketches (graph/hyperball.py). Driver gate: the
`hyperball` query (per-round register-state SQL unroll); here: init
spec, max-merge semantics vs a brute-force ball computation, and the
estimate's accuracy envelope."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.graph.hyperball import (M, RMAX, hyperball,
                                     hyperball_estimate,
                                     init_registers, pack_registers,
                                     unpack_registers)
from geoflow.ops.sketches import _clz64
from geoflow.text.hashing import mix64


def _mk_edges(edges):
    return ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())}))


def _brute_regs(edges, rounds):
    """Reference: explicit BFS balls, then registers from members."""
    nodes = sorted({v for e in edges for v in e})
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    balls = {v: {v} for v in nodes}
    for _ in range(rounds):
        balls = {v: balls[v] | set().union(
            *(balls[w] for w in adj.get(v, ()))) for v in nodes}
    out = {}
    for v in nodes:
        reg = np.zeros(M, np.uint8)
        for w in balls[v]:
            h = mix64(np.array([w], np.int64).view(np.uint64))
            j = int(h[0] >> np.uint64(60))
            rho = min(int(_clz64(h << np.uint64(4))[0]) + 1, RMAX)
            reg[j] = max(reg[j], rho)
        out[v] = reg
    return out


def test_registers_match_brute_force_balls():
    rng = np.random.default_rng(19)
    edges = sorted({(int(a), int(b)) for a, b in
                    zip(rng.integers(0, 40, 100),
                        rng.integers(0, 40, 100))})
    got = hyperball(_mk_edges(edges), rounds=3).to_pandas()
    want = _brute_regs(edges, 3)
    assert len(got) == len(want)
    for r in got.itertuples():
        reg = unpack_registers(np.array([r.packed_lo]),
                               np.array([r.packed_hi]))[0]
        assert (reg == want[r.node]).all(), r.node


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    reg = rng.integers(0, RMAX + 1, (50, M)).astype(np.uint8)
    lo, hi = pack_registers(reg)
    assert (lo >= 0).all() and (hi >= 0).all()
    assert (unpack_registers(lo, hi) == reg).all()


def test_estimate_tracks_true_ball_size():
    # a long directed path: node 0's full-reach ball after enough
    # rounds is all n nodes; HLL m=16 is coarse (~26% RSE) — assert
    # the envelope, not the value
    n = 300
    edges = [(i, i + 1) for i in range(n - 1)]
    out = hyperball(_mk_edges(edges), rounds=n).to_pandas()
    row = out[out.node == 0].iloc[0]
    est = hyperball_estimate(np.array([row.packed_lo]),
                             np.array([row.packed_hi]))[0]
    assert 0.4 * n < est < 2.5 * n


def test_init_register_spec():
    nodes = np.arange(100, dtype=np.int64)
    reg = init_registers(nodes)
    h = mix64(nodes.view(np.uint64))
    j = (h >> np.uint64(60)).astype(np.int64)
    rho = np.minimum(_clz64(h << np.uint64(4)) + 1, RMAX)
    assert (reg[np.arange(100), j] == rho).all()
    assert (reg.astype(bool).sum(axis=1) == 1).all()
