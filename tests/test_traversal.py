"""Graph traversal (geoflow/graph/traversal.py): multi-source BFS
seed distances + k-core peeling. Driver gates are the `seed_distance`
and `kcore` oracle queries; these tests pin semantics on hand-built
graphs, prove broadcast == join mode, and check the peeling
fixed-round prefix."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.graph.traversal import kcore_nodes, seed_distances


def _edges(src, dst):
    import ray
    return ray.data.from_arrow(pa.table({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64)}))


def _dists(ds, seeds, **kw):
    df = seed_distances(ds, seeds, **kw).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    return dict(zip(df["node"].astype(int), df["dist"].astype(int)))


def test_bfs_chain(ray_session):
    # 0 -> 1 -> 2 -> 3 -> 4, seed {0}
    got = _dists(_edges([0, 1, 2, 3], [1, 2, 3, 4]), [0], max_hops=4)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_hop_cap(ray_session):
    got = _dists(_edges([0, 1, 2, 3], [1, 2, 3, 4]), [0], max_hops=2)
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_multi_seed_min(ray_session):
    # two seeds; node 2 reachable from both — min wins
    got = _dists(_edges([0, 1, 4, 3], [1, 2, 3, 2]), [0, 4],
                 max_hops=4)
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_directed_vs_undirected(ray_session):
    e = _edges([1, 2], [0, 1])  # edges point TOWARD seed 0
    assert _dists(e, [0], max_hops=3) == {0: 0}
    assert _dists(e, [0], max_hops=3, undirected=True) == \
        {0: 0, 1: 1, 2: 2}


def test_bfs_join_mode_equivalence(ray_session):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    seeds = [3, 17, 41]
    b = _dists(_edges(src, dst), seeds, max_hops=3, mode="broadcast")
    j = _dists(_edges(src, dst), seeds, max_hops=3, mode="join")
    assert b == j


def test_bfs_seed_not_in_edges(ray_session):
    got = _dists(_edges([0], [1]), [0, 99], max_hops=2)
    assert got == {0: 0, 1: 1, 99: 0}


def _core(ds, k, **kw):
    df = kcore_nodes(ds, k, **kw).to_pandas()
    if df.empty:  # Ray to_pandas drops columns on empty datasets
        return {}
    df = df.sort_values("node").reset_index(drop=True)
    return dict(zip(df["node"].astype(int), df["degree"].astype(int)))


def test_kcore_triangle_plus_tail(ray_session):
    # triangle 0-1-2 (2-core) with a tail 2-3-4 that peels off
    got = _core(_edges([0, 1, 2, 2, 3], [1, 2, 0, 3, 4]), 2)
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_k4_clique(ray_session):
    # K4 is a 3-core; attach a pendant to node 0
    src = [0, 0, 0, 1, 1, 2, 0]
    dst = [1, 2, 3, 2, 3, 3, 9]
    assert _core(_edges(src, dst), 3) == {0: 3, 1: 3, 2: 3, 3: 3}
    assert _core(_edges(src, dst), 4) == {}


def test_kcore_dedup_and_self_loops(ray_session):
    # duplicate edges and self-loops must not inflate degrees
    src = [0, 1, 0, 0, 2, 1, 2]
    dst = [1, 0, 1, 0, 2, 2, 0]
    got = _core(_edges(src, dst), 2)
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_fixed_round_prefix(ray_session):
    # path 0-1-2-3-4-5: 1-core erosion of deg-0 never happens (k=1
    # keeps all); k=2 peels ends inward one round at a time
    src = [0, 1, 2, 3, 4]
    dst = [1, 2, 3, 4, 5]
    # after 1 round: {1,2,3,4} survive (deg among full path)
    got1 = _core(_edges(src, dst), 2, rounds=1)
    assert set(got1) == {1, 2, 3, 4}
    # full peel: nothing is a 2-core
    assert _core(_edges(src, dst), 2, rounds=8) == {}


def _wedges(src, dst, w):
    import ray
    return ray.data.from_arrow(pa.table({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64),
        "w": np.asarray(w, dtype=np.int64)}))


def test_weighted_sssp_prefers_longer_cheaper_path(ray_session):
    # 0->2 direct w=10; 0->1->2 w=2+3=5: Bellman-Ford picks 5 after
    # 2 rounds (round 1 still reports the direct 10 for node 2).
    e = _wedges([0, 0, 1], [2, 1, 2], [10, 2, 3])
    assert _dists(e, [0], max_hops=1, weight_col="w") == \
        {0: 0, 1: 2, 2: 10}
    assert _dists(e, [0], max_hops=2, weight_col="w") == \
        {0: 0, 1: 2, 2: 5}


def test_weighted_sssp_join_mode_matches_broadcast(ray_session):
    rng = np.random.RandomState(7)
    src = rng.randint(0, 30, 120)
    dst = rng.randint(0, 30, 120)
    w = rng.randint(0, 9, 120) + 1
    e = _wedges(src, dst, w)
    a = _dists(e, [0, 5], max_hops=5, weight_col="w")
    b = _dists(e, [0, 5], max_hops=5, weight_col="w", mode="join")
    assert a == b


def test_weighted_sssp_undirected_symmetry(ray_session):
    e = _wedges([0, 1], [1, 2], [4, 6])
    got = _dists(e, [2], max_hops=3, weight_col="w",
                 undirected=True)
    assert got == {2: 0, 1: 6, 0: 10}
