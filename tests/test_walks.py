"""Deterministic random walks (graph/walks.py). Driver gate: the
`random_walks` mix64-chain oracle query (green at sf0.001/0.01/0.1);
here: broadcast/join mode bit-equality, dead-end truncation, walk
validity (every step follows a real edge)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geoflow.graph.walks import _step_hash, random_walks


def _mk(edges, starts):
    e = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                  "dst": pa.array([b for _, b in edges], pa.int64())})
    s = pa.table({"node": pa.array(starts, pa.int64())})
    return ray.data.from_arrow(e), ray.data.from_arrow(s)


def _walks_dict(ds):
    df = ds.to_pandas().sort_values(["walk_id", "step"])
    out = {}
    for r in df.itertuples():
        out.setdefault(r.walk_id, []).append(r.node)
    return out


def test_walks_follow_edges_and_are_deterministic():
    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 30, 120), rng.integers(0, 30, 120))]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    e, s = _mk(edges, list(range(30)))
    w1 = _walks_dict(random_walks(e, s, walk_len=5, walks_per_node=3))
    e2, s2 = _mk(edges, list(range(30)))
    w2 = _walks_dict(random_walks(e2, s2, walk_len=5, walks_per_node=3))
    assert w1 == w2
    assert len(w1) == 90
    for wid, path in w1.items():
        assert path[0] == wid // 3
        for a, b in zip(path, path[1:]):
            assert b in adj.get(a, []), (wid, path)
        # truncated only at dead ends
        if len(path) < 5:
            assert path[-1] not in adj


def test_neighbor_choice_is_sorted_rank():
    # node 0 -> {5, 9}; rank r = mix64(...) % 2 picks from sorted [5,9]
    e, s = _mk([(0, 9), (0, 5)], [0])
    w = _walks_dict(random_walks(e, s, walk_len=2, walks_per_node=1))
    h = int(_step_hash(np.array([0], np.int64),
                       np.array([0], np.int64), 1)[0])
    assert w[0][1] == [5, 9][h % 2]


def test_dead_end_truncates():
    e, s = _mk([(1, 2)], [1, 7])
    w = _walks_dict(random_walks(e, s, walk_len=4, walks_per_node=1))
    assert w[1] == [1, 2]      # 2 has no out-edges
    assert w[7] == [7]         # isolated start


def test_join_mode_matches_broadcast():
    rng = np.random.default_rng(13)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 20, 60), rng.integers(0, 20, 60))]
    e, s = _mk(edges, list(range(20)))
    want = _walks_dict(random_walks(e, s, walk_len=4, walks_per_node=2))
    e2, s2 = _mk(edges, list(range(20)))
    got = _walks_dict(random_walks(e2, s2, walk_len=4,
                                   walks_per_node=2, mode="join"))
    assert got == want


def test_broadcast_cap_raises():
    e, s = _mk([(0, 1), (1, 0), (0, 2)], [0])
    with pytest.raises(ValueError, match="max_broadcast_edges"):
        random_walks(e, s, max_broadcast_edges=2)


def test_skipgram_pairs_window():
    from geoflow.graph.walks import skipgram_pairs
    # one deterministic walk 0-1-2-3 given a path graph
    e, s = _mk([(0, 1), (1, 2), (2, 3)], [0])
    walks = random_walks(e, s, walk_len=4, walks_per_node=1)
    out = skipgram_pairs(walks, window=2).to_pandas()
    got = {(r.center, r.context): r.n_pairs for r in out.itertuples()}
    want = {}
    path = [0, 1, 2, 3]
    for i in range(4):
        for j in range(4):
            if i != j and abs(i - j) <= 2:
                k = (path[i], path[j])
                want[k] = want.get(k, 0) + 1
    assert got == want


def _node2vec_brute(edges, starts, walk_len, walks_per_node,
                    weights=(4, 2, 1)):
    """Independent spec reference: python-loop second-order walk."""
    from geoflow.text.hashing import mix64
    ret_w, in_w, out_w = weights
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    for v in adj:
        adj[v].sort()
    eset = set(edges)
    out = {}
    for st in starts:
        for rep in range(walks_per_node):
            wid = st * walks_per_node + rep
            path, cur, prev = [st], st, -1
            for t in range(1, walk_len):
                cands = adj.get(cur)
                if not cands:
                    break
                ws = [ret_w if x == prev else
                      in_w if prev >= 0 and (prev, x) in eset else
                      out_w for x in cands]
                h = int(mix64(np.array(
                    [cur * (1 << 21) + wid * 8 + t], np.uint64))[0])
                x = h % sum(ws)
                acc = 0
                for cand, w in zip(cands, ws):
                    acc += w
                    if x < acc:
                        break
                path.append(cand)
                prev, cur = cur, cand
            out[wid] = path
    return out


def test_node2vec_matches_brute_force():
    from geoflow.graph.walks import node2vec_walks
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 25, 150), rng.integers(0, 25, 150))]
    edges = sorted(set(edges))        # distinct edges keep brute simple
    starts = list(range(25))
    e, s = _mk(edges, starts)
    got = _walks_dict(node2vec_walks(e, s, walk_len=5,
                                     walks_per_node=3))
    want = _node2vec_brute(edges, starts, 5, 3)
    assert got == want


def test_node2vec_uniform_weights_equal_first_order():
    # ret == in == out collapses the cumulative pick to h % deg: the
    # exact first-order random_walks rule on the same hash stream.
    from geoflow.graph.walks import node2vec_walks
    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 20, 80), rng.integers(0, 20, 80))]
    e, s = _mk(edges, list(range(20)))
    got = _walks_dict(node2vec_walks(e, s, walk_len=4, walks_per_node=2,
                                     weights=(1, 1, 1)))
    e2, s2 = _mk(edges, list(range(20)))
    want = _walks_dict(random_walks(e2, s2, walk_len=4,
                                    walks_per_node=2))
    assert got == want


def test_node2vec_return_bias_dominates():
    # cur=1 came from 0 with a back-edge; ret weight 2^20 vs two
    # out-neighbors: pick returns unless h % (2^20+2) lands in the
    # 2-slot tail after the ret candidate (dst-sorted: 0 first).
    from geoflow.graph.walks import node2vec_walks
    e, s = _mk([(0, 1), (1, 0), (1, 5), (1, 9)], [0])
    w = _walks_dict(node2vec_walks(e, s, walk_len=3, walks_per_node=1,
                                   weights=(1 << 20, 1, 1)))
    h = int(_step_hash(np.array([1], np.int64),
                       np.array([0], np.int64), 2)[0])
    x = h % ((1 << 20) + 2)
    want = 0 if x < (1 << 20) else (5 if x < (1 << 20) + 1 else 9)
    assert w[0] == [0, 1, want]
    assert want == 0  # the planted hash indeed returns


def test_node2vec_dead_end_and_id_guard():
    from geoflow.graph.walks import node2vec_walks
    e, s = _mk([(1, 2)], [1, 7])
    w = _walks_dict(node2vec_walks(e, s, walk_len=4, walks_per_node=1))
    assert w[1] == [1, 2] and w[7] == [7]
    e2, s2 = _mk([(1 << 31, 2)], [2])
    with pytest.raises(ValueError, match="31 bits"):
        node2vec_walks(e2, s2)
