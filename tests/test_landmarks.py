"""Landmark BFS distances + harmonic centrality (graph/traversal.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.graph.traversal import (harmonic_centrality,
                                     landmark_distances)


def _edges(pairs):
    s, d = zip(*pairs)
    return ray.data.from_arrow(pa.table({
        "src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())}))


def test_landmark_distances_path(ray_session):
    # directed path 0->1->2->3; landmarks {0, 2}
    ed = _edges([(0, 1), (1, 2), (2, 3)])
    out = landmark_distances(ed, [0, 2], max_hops=4).to_pandas()
    got = {(r.landmark, r.node): r.dist for r in out.itertuples()}
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3,
                   (2, 2): 0, (2, 3): 1}


def test_landmark_matches_per_seed_bfs(ray_session):
    # random graph: landmark_distances == seed_distances run per seed
    from geoflow.graph.traversal import seed_distances
    rng = np.random.default_rng(3)
    pairs = [(int(a), int(b))
             for a, b in rng.integers(0, 40, (150, 2)) if a != b]
    ed = _edges(pairs)
    lms = [0, 7, 23]
    out = landmark_distances(ed, lms, max_hops=3).to_pandas()
    for lm in lms:
        solo = seed_distances(ed, [lm], max_hops=3).to_pandas()
        mine = out[out.landmark == lm][["node", "dist"]] \
            .sort_values("node").reset_index(drop=True)
        solo = solo.sort_values("node").reset_index(drop=True)
        assert mine.equals(solo)


def test_harmonic_values(ray_session):
    # path 0->1->2 with landmarks {0,1}: H(1)=K//1, H(2)=K//2+K//1
    K = 2 ** 40
    ed = _edges([(0, 1), (1, 2)])
    out = harmonic_centrality(ed, [0, 1], max_hops=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    got = {r.node: (r.h_units, r.n_reached) for r in out.itertuples()}
    assert got == {1: (K, 1), 2: (K // 2 + K, 2)}
