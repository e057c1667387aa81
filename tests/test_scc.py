"""Strongly connected components (graph/scc.py). Driver gate: the
`scc` planted-residue oracle query (green at sf0.001/0.01/0.1); here:
brute-force mutual-reachability fuzz, bow-tie structure, and the
FW-BW pivot-peel path forced via a tiny driver cap."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geoflow.graph.scc import _tarjan_labels, scc_labels


def _brute_scc(edges, nodes):
    """min-member SCC label via boolean transitive closure."""
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    reach = np.eye(n, dtype=bool)
    for s, d in edges:
        reach[idx[s], idx[d]] = True
    for k in range(n):
        reach |= reach[:, k:k + 1] & reach[k:k + 1, :]
    mutual = reach & reach.T
    return {nodes[i]: min(nodes[j] for j in range(n) if mutual[i, j])
            for i in range(n)}


def _run(edges, **kw):
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    out = scc_labels(ray.data.from_arrow(t), **kw).to_pandas()
    return dict(zip(out["node"], out["scc"]))


def test_two_cycles_and_bridge():
    edges = [(0, 1), (1, 2), (2, 0),      # SCC {0,1,2}
             (10, 11), (11, 10),          # SCC {10,11}
             (2, 10),                     # bridge (no merge)
             (20, 0)]                     # tail into first SCC
    got = _run(edges)
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20}


def test_self_loop_and_chain():
    edges = [(5, 5), (1, 2), (2, 3)]
    got = _run(edges)
    assert got == {5: 5, 1: 1, 2: 2, 3: 3}


def test_tarjan_direct_matches_brute():
    rng = np.random.default_rng(3)
    for trial in range(15):
        n = int(rng.integers(2, 30))
        m = int(rng.integers(1, 70))
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        nodes = np.unique(np.concatenate([src, dst]))
        comp = _tarjan_labels(src, dst, nodes)
        want = _brute_scc(list(zip(src.tolist(), dst.tolist())),
                          nodes.tolist())
        got = dict(zip(nodes.tolist(), comp.tolist()))
        assert got == want, trial


def test_pipeline_matches_brute_fuzz():
    rng = np.random.default_rng(9)
    for trial in range(5):
        n = int(rng.integers(4, 25))
        m = int(rng.integers(3, 50))
        edges = list(zip(rng.integers(0, n, m).tolist(),
                         rng.integers(0, n, m).tolist()))
        nodes = sorted({v for e in edges for v in e})
        want = _brute_scc(edges, nodes)
        got = _run(edges)
        assert got == want, trial


def test_fwbw_peel_path_matches_driver_path():
    # giant cycle + satellites; cap forces the FW-BW peel
    big = [(i, (i + 1) % 40) for i in range(40)]
    extra = [(100, 101), (101, 100), (3, 100), (102, 3)]
    edges = big + extra
    want = _run(edges)                      # driver Tarjan path
    got = _run(edges, max_driver_edges=10)  # forces FW-BW peel
    assert got == want
    assert got[0] == 0 and got[39] == 0 and got[100] == 100


def test_fwbw_cap_still_exceeded_raises():
    # two interleaved big cycles: peeling one leaves the other over cap
    a = [(i, (i + 2) % 40) for i in range(0, 40, 2)]
    b = [(i, (i + 2) % 41 if (i + 2) % 41 % 2 == 1 else i + 2)
         for i in range(1, 38, 2)]
    b = [(1, 3), (3, 5), (5, 7), (7, 9), (9, 11), (11, 13),
         (13, 15), (15, 17), (17, 19), (19, 1)]
    with pytest.raises(ValueError, match="FW-BW"):
        _run(a + b, max_driver_edges=3)
