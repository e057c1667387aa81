"""D8 flow direction / accumulation / basins over the tile lattice
(geoflow/raster/hydrology.py): hand grids pinning the exact
semantics — distance-weighted steepest descent via cross-multiplied
squares, code-order tie breaks, off-lattice drains, bounded-round
accumulation, pointer-jumping convergence — plus a brute-force
cross-check on a seeded random lattice."""
import numpy as np
import pyarrow as pa
import ray.data

from geoflow.cells.tiles import tile_bounds
from geoflow.raster.hydrology import (flow_accumulation_tiles,
                                      flow_basin_tiles,
                                      flow_direction_tiles)

_D8 = {1: (1, 0), 2: (1, 1), 3: (0, 1), 4: (-1, 1), 5: (-1, 0),
       6: (-1, -1), 7: (0, -1), 8: (1, -1)}


def _tile_center(tx, ty, z):
    x0, y0, x1, y1 = tile_bounds(np.asarray([tx]), np.asarray([ty]), z)
    return (x0[0] + x1[0]) / 2, (y0[0] + y1[0]) / 2


def _points_at_tiles(counts, z=8):
    xs, ys = [], []
    for (tx, ty), n in counts.items():
        cx, cy = _tile_center(tx, ty, z)
        xs.extend([cx] * n)
        ys.extend([cy] * n)
    return ray.data.from_arrow(pa.table({
        "x": pa.array(xs, pa.float64()),
        "y": pa.array(ys, pa.float64())}))


def _dir_map(counts, zoom=8):
    rows = flow_direction_tiles(
        _points_at_tiles(counts, zoom), zoom=zoom).take_all()
    return {(r["tile_x"], r["tile_y"]): r for r in rows}


def _brute_dir(counts, tx, ty):
    z = counts[(tx, ty)]
    best_code, best_key, best_drop = 0, 0, 0
    for code, (dx, dy) in _D8.items():  # ascending code: first max wins
        d = z - counts.get((tx + dx, ty + dy), 0)
        if d <= 0:
            continue
        w = 2 if dx == 0 or dy == 0 else 1
        key = d * d * w
        if key > best_key:
            best_code, best_key, best_drop = code, key, d
    return best_code, best_drop


def _walled(chain_counts, wall_z=100):
    """chain plus a z=wall_z ring of every unoccupied 8-neighbor, so
    interior flow is decided among occupied tiles only (without the
    wall every tile's full-height drop to a missing neighbor wins)."""
    counts = dict(chain_counts)
    for (tx, ty) in list(chain_counts):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                counts.setdefault((tx + dx, ty + dy), wall_z)
    return counts


def test_flow_dir_weighting_and_ties():
    # center 10; orth neighbor E drop 3 (key 18) vs diag SE drop 4
    # (key 16): orthogonal wins despite the smaller drop.
    counts = {(100, 100): 10, (101, 100): 7, (101, 101): 6,
              # give every neighbor of (100,100) full occupancy so
              # only E and SE offer drops
              (99, 99): 10, (100, 99): 10, (101, 99): 10,
              (99, 100): 10, (99, 101): 10, (100, 101): 10}
    d = _dir_map(counts)
    r = d[(100, 100)]
    assert r["flow_code"] == 1 and r["drop_v"] == 3
    assert (r["flow_tx"], r["flow_ty"]) == (101, 100)
    # equal-key tie: two orth neighbors at equal drop -> smaller code
    counts2 = {(50, 50): 5, (51, 50): 2, (50, 51): 2,
               (49, 49): 5, (50, 49): 5, (51, 49): 5,
               (49, 50): 5, (49, 51): 5, (51, 51): 5}
    r2 = _dir_map(counts2)[(50, 50)]
    assert r2["flow_code"] == 1  # E (code 1) beats S (code 3)


def test_flow_dir_pit_and_border():
    # an isolated single tile drains off-lattice east (missing
    # neighbors are elevation 0; code order picks E first)
    d = _dir_map({(10, 10): 4})
    r = d[(10, 10)]
    assert r["flow_code"] == 1
    assert (r["flow_tx"], r["flow_ty"]) == (11, 10)
    assert r["drop_v"] == 4
    # a pit: lower than all 8 existing neighbors -> code 0, self
    counts = {(60, 60): 1}
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if (dx, dy) != (0, 0):
                counts[(60 + dx, 60 + dy)] = 9
    r = _dir_map(counts)[(60, 60)]
    assert r["flow_code"] == 0
    assert (r["flow_tx"], r["flow_ty"]) == (60, 60)
    assert r["drop_v"] == 0


def test_flow_dir_brute_force_random():
    rng = np.random.default_rng(7)
    counts = {}
    for _ in range(120):
        counts[(int(rng.integers(80, 92)),
                int(rng.integers(80, 92)))] = int(rng.integers(1, 9))
    d = _dir_map(counts)
    assert set(d) == set(counts)
    for (tx, ty), r in d.items():
        code, drop = _brute_dir(counts, tx, ty)
        assert r["flow_code"] == code, (tx, ty)
        assert r["drop_v"] == drop


def test_flow_accumulation_chain():
    # walled descending W->E valley 10 8 6 4 2: interior flow is east
    # along the chain; the east end's only gap in the wall drains it
    chain = {(100 + i, 100): 10 - 2 * i for i in range(5)}
    counts = _walled(chain)
    del counts[(105, 100)]  # open the valley mouth eastward
    ds = _points_at_tiles(counts)
    rows = {(r["tile_x"], r["tile_y"]): r["acc"]
            for r in flow_accumulation_tiles(ds, zoom=8,
                                             rounds=5).take_all()}
    # full upstream counts along the chain: 1,2,3,4,5
    assert [rows[(100 + i, 100)] for i in range(5)] == [1, 2, 3, 4, 5]
    # bounded rounds: 2 rounds only see 2 steps upstream
    rows2 = {(r["tile_x"], r["tile_y"]): r["acc"]
             for r in flow_accumulation_tiles(ds, zoom=8,
                                              rounds=2).take_all()}
    assert [rows2[(100 + i, 100)] for i in range(5)] == [1, 2, 3, 3, 3]


def test_flow_basins_pointer_jumping():
    # a walled west-descending chain (west end is a pit = sink) plus
    # an isolated far tile (off-lattice drain = self-sink)
    chain = {(200 + i, 40): 1 + i for i in range(6)}  # drains west
    counts = _walled(chain)
    counts[(10, 10)] = 3
    ds = _points_at_tiles(counts)
    rows = {(r["tile_x"], r["tile_y"]): (r["sink_x"], r["sink_y"])
            for r in flow_basin_tiles(ds, zoom=8,
                                      doublings=3).take_all()}
    for i in range(6):
        assert rows[(200 + i, 40)] == (200, 40)
    assert rows[(10, 10)] == (10, 10)


def test_vw_round_simplify_hand_case():
    # lives here with the other integer-exact bounded-round kernels
    import pyarrow as pa
    import ray.data

    from geoflow.ops.linestring import vw_round_simplify

    # polyline: (0,0) (1,5) (2,0) (3,1) (4,0): areas of interior
    # points (seq 2,3,4): p2: |cross((1,5)-(0,0),(2,0)-(0,0))|=10
    # p3: |cross((3,1)-(1,5)... recompute each round. Round 1 areas:
    # p2=|1*0-2*5|=10, p3=|... (2,0),(1,5),(3,1): ((2-1)(1-5)-(3-1)(0-5))=6
    # p4: (3,1) between (2,0),(4,0): |1*0-2*1|=2 -> remove p4(seq 4)
    t = pa.table({
        "g": pa.array([7] * 5, pa.int64()),
        "o": pa.array([10, 20, 30, 40, 50], pa.int64()),
        "x": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "y": pa.array([0, 5, 0, 1, 0], pa.int64())})
    ds = ray.data.from_arrow(t)
    out = {r["seq"]: (r["x"], r["y"]) for r in
           vw_round_simplify(ds, "g", "o", "x", "y",
                             rounds=1).take_all()}
    assert set(out) == {1, 2, 3, 5}
    # rounds=3 on 5 points leaves only endpoints + 0 interior? 3
    # rounds remove 3 interior points -> 2 points left
    out3 = vw_round_simplify(ds, "g", "o", "x", "y",
                             rounds=3).take_all()
    assert sorted(r["seq"] for r in out3) == [1, 5]
    # a 2-point group is untouched at any round count
    t2 = pa.table({"g": pa.array([1, 1], pa.int64()),
                   "o": pa.array([1, 2], pa.int64()),
                   "x": pa.array([0, 9], pa.int64()),
                   "y": pa.array([0, 9], pa.int64())})
    out2 = vw_round_simplify(ray.data.from_arrow(t2), "g", "o",
                             "x", "y", rounds=5).take_all()
    assert sorted(r["seq"] for r in out2) == [1, 2]


def test_shortest_path_counts_hand_graph():
    import pyarrow as pa
    import ray.data

    from geoflow.graph.traversal import shortest_path_counts

    # diamond with a parallel edge: 0->1, 0->2, 1->3, 2->3, 2->3
    # sig(3) = sig(1) + 2*sig(2) = 3; plus tail 3->4
    edges = pa.table({
        "src": pa.array([0, 0, 1, 2, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 3, 3, 4], pa.int64())})
    out = {r["node"]: (r["dist"], r["sig"]) for r in
           shortest_path_counts(ray.data.from_arrow(edges), [0],
                                max_hops=4).take_all()}
    assert out == {0: (0, 1), 1: (1, 1), 2: (1, 1),
                   3: (2, 3), 4: (3, 3)}
    # bounded hops truncate the frontier
    out2 = {r["node"]: (r["dist"], r["sig"]) for r in
            shortest_path_counts(ray.data.from_arrow(edges), [0],
                                 max_hops=2).take_all()}
    assert 4 not in out2 and out2[3] == (2, 3)
    # shorter path wins over longer: seed at 2 AND 0 -> 3 at dist 1
    out3 = {r["node"]: (r["dist"], r["sig"]) for r in
            shortest_path_counts(ray.data.from_arrow(edges), [0, 2],
                                 max_hops=3).take_all()}
    assert out3[3] == (1, 2)  # two parallel edges from seed 2


def test_temporal_reach_hand_graph():
    import pyarrow as pa
    import ray.data

    from geoflow.graph.traversal import temporal_reach

    # 0 -(t=5)-> 1 -(t=3)-> 2 : edge to 2 has t=3 < arr(1)=6 -> blocked
    # 0 -(t=1)-> 3 -(t=2)-> 4 : time-respecting chain reaches 4 at 3
    edges = pa.table({
        "src": pa.array([0, 1, 0, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 4], pa.int64()),
        "t": pa.array([5, 3, 1, 2], pa.int64())})
    out = {r["node"]: r["arr"] for r in
           temporal_reach(ray.data.from_arrow(edges), [0],
                          rounds=4).take_all()}
    assert out == {0: 0, 1: 6, 3: 2, 4: 3}
    # a later edge unlocks 2: add 1 -(t=7)-> 2
    edges2 = pa.table({
        "src": pa.array([0, 1, 1], pa.int64()),
        "dst": pa.array([1, 2, 2], pa.int64()),
        "t": pa.array([5, 3, 7], pa.int64())})
    out2 = {r["node"]: r["arr"] for r in
            temporal_reach(ray.data.from_arrow(edges2), [0],
                           rounds=3).take_all()}
    assert out2 == {0: 0, 1: 6, 2: 8}


def test_join_mode_graph_kernels_match_broadcast():
    import pyarrow as pa
    import ray.data

    from geoflow.graph.traversal import (shortest_path_counts,
                                         shortest_path_counts_join,
                                         temporal_reach,
                                         temporal_reach_join)

    rng = np.random.default_rng(31)
    n = 120
    src = rng.integers(0, 60, n).astype(np.int64)
    dst = rng.integers(0, 60, n).astype(np.int64)
    ts = rng.integers(0, 12, n).astype(np.int64)
    edges = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                      "t": pa.array(ts)})
    seeds = [0, 7, 13]

    a = sorted((r["node"], r["arr"]) for r in temporal_reach(
        ray.data.from_arrow(edges), seeds, rounds=3).take_all())
    b = sorted((r["node"], r["arr"]) for r in temporal_reach_join(
        ray.data.from_arrow(edges), seeds, rounds=3).take_all())
    assert a == b and len(a) >= len(seeds)

    e2 = edges.select(["src", "dst"])
    c = sorted((r["node"], r["dist"], r["sig"])
               for r in shortest_path_counts(
                   ray.data.from_arrow(e2), seeds,
                   max_hops=3).take_all())
    d = sorted((r["node"], r["dist"], r["sig"])
               for r in shortest_path_counts_join(
                   ray.data.from_arrow(e2), seeds,
                   max_hops=3).take_all())
    assert c == d and len(c) > len(seeds)
