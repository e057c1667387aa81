"""Redirect/canonical chain resolution — graph/chains.py."""
import numpy as np
import pyarrow as pa
import pytest

from geoflow.graph.chains import resolve_chains


def _edges(src, dst):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64)}))


def _resolve(src, dst, **kw):
    out = resolve_chains(_edges(src, dst), **kw).take_all()
    return {r["src"]: (r["final"], r["hops"], r["resolved"])
            for r in out}


def test_chains_to_terminals(ray_session):
    d = np.arange(64)
    src = d[d % 8 != 0]
    got = _resolve(src, src - 1, rounds=4)
    for s in src:
        assert got[s] == (s - s % 8, s % 8, True)


def test_modes_identical_incl_deep_chain(ray_session):
    # one chain of depth 200: needs 8 doubling rounds
    src = np.arange(1, 201)
    dst = src - 1
    a = _resolve(src, dst, rounds=8)
    b = _resolve(src, dst, rounds=8, mode="join", num_partitions=2)
    assert a == b
    assert a[200] == (0, 200, True)


def test_insufficient_rounds_reports_unresolved(ray_session):
    src = np.arange(1, 201)
    got = _resolve(src, src - 1, rounds=3)   # 2^3 = 8 << 200
    assert got[200][2] is False or got[200][2] == False  # noqa: E712
    assert got[1] == (0, 1, True)


def test_cycle_and_tail_into_cycle(ray_session):
    got = _resolve([100, 101, 102], [101, 100, 100], rounds=5)
    assert not got[100][2] and not got[101][2] and not got[102][2]


def test_self_loops_dropped_and_duplicate_src(ray_session):
    # self-loop 5->5 vanishes; duplicate src 1->{0,2}: min dst wins
    got = _resolve([5, 1, 1], [5, 2, 0], rounds=3)
    assert 5 not in got
    assert got[1] == (0, 1, True)


def test_branching_tree_into_one_terminal(ray_session):
    # star: many nodes point at 0 directly, others via one hop
    src = [1, 2, 3, 4]
    dst = [0, 0, 1, 2]
    got = _resolve(src, dst, rounds=3)
    assert got[3] == (0, 2, True) and got[4] == (0, 2, True)
    assert got[1] == (0, 1, True)


def test_bad_mode_raises(ray_session):
    with pytest.raises(ValueError):
        resolve_chains(_edges([1], [0]), mode="nope")


class TestReciprocity:
    """edge_reciprocity / host_reciprocity (graph/reciprocity.py)."""

    def _edges(self, src, dst):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "src": np.asarray(src, dtype=np.int64),
            "dst": np.asarray(dst, dtype=np.int64)}))

    def test_marking_dedup_and_self_loops(self, ray_session):
        from geoflow.graph.reciprocity import edge_reciprocity
        e = self._edges([0, 1, 2, 3, 10, 11, 10, 7],
                        [1, 2, 3, 0, 11, 10, 11, 7])
        got = sorted((r["src"], r["dst"], r["reciprocated"])
                     for r in edge_reciprocity(e).take_all())
        assert got == [(0, 1, False), (1, 2, False), (2, 3, False),
                       (3, 0, False), (10, 11, True), (11, 10, True)]

    def test_host_ratio(self, ray_session):
        from geoflow.graph.reciprocity import host_reciprocity
        # host 5 has 2 outlinks, 1 reciprocated
        e = self._edges([5, 5, 6], [6, 7, 5])
        got = {r["host"]: (r["outdeg"], r["reciprocated"], r["ratio"])
               for r in host_reciprocity(e).take_all()}
        assert got[5] == (2, 1, 0.5)
        assert got[6] == (1, 1, 1.0)


class TestTriangles:
    """triangle_counts / clustering_coefficient (graph/triangles.py)."""

    def _cc(self, src, dst, **kw):
        import ray.data as rd
        from geoflow.graph.triangles import clustering_coefficient
        e = rd.from_arrow(pa.table({
            "src": np.asarray(src, dtype=np.int64),
            "dst": np.asarray(dst, dtype=np.int64)}))
        return {r["node"]: (r["triangles"], r["degree"], r["coeff"])
                for r in clustering_coefficient(
                    e, num_partitions=2, **kw).take_all()}

    def test_k4_with_pendant_and_decoys(self, ray_session):
        got = self._cc([0, 0, 0, 1, 1, 2, 4, 0, 1],
                       [1, 2, 3, 2, 3, 3, 0, 1, 0])
        assert got[0] == (3, 4, 0.5)
        assert got[1] == (3, 3, 1.0) and got[3] == (3, 3, 1.0)
        assert got[4] == (0, 1, 0.0)

    def test_triangle_free_bipartite(self, ray_session):
        # K2,3: plenty of wedges, zero triangles
        src = [0, 0, 0, 1, 1, 1]
        dst = [10, 11, 12, 10, 11, 12]
        got = self._cc(src, dst)
        assert all(v[0] == 0 for v in got.values())
        assert got[0][1] == 3 and got[10][1] == 2

    def test_matches_brute_force_random(self, ray_session):
        rng = np.random.default_rng(7)
        n = 30
        src, dst = [], []
        for _ in range(120):
            a, b = rng.integers(0, n, 2)
            src.append(int(a)); dst.append(int(b))
        got = self._cc(src, dst)
        # brute force
        import itertools
        adj = set()
        for a, b in zip(src, dst):
            if a != b:
                adj.add((min(a, b), max(a, b)))
        tri = {k: 0 for k in set(x for e in adj for x in e)}
        for a, b, c in itertools.combinations(sorted(tri), 3):
            if ((a, b) in adj and (b, c) in adj and (a, c) in adj):
                tri[a] += 1; tri[b] += 1; tri[c] += 1
        deg = {k: 0 for k in tri}
        for a, b in adj:
            deg[a] += 1; deg[b] += 1
        for k in tri:
            assert got[k][0] == tri[k], k
            assert got[k][1] == deg[k], k

    def test_broadcast_cap_raises(self, ray_session):
        import pytest as _pt
        with _pt.raises(ValueError):
            self._cc([0, 1], [1, 2], max_broadcast_nodes=1)


class TestCocitation:
    def test_counts_and_min_count(self, ray_session):
        import ray.data as rd
        from geoflow.graph.triangles import cocitation_counts
        e = rd.from_arrow(pa.table({
            "src": np.array([0, 0, 0, 1, 1, 0, 2], np.int64),
            "dst": np.array([10, 11, 12, 10, 11, 10, 2], np.int64)}))
        got = sorted((r["b"], r["c"], r["n"]) for r in
                     cocitation_counts(e).take_all())
        assert got == [(10, 11, 2), (10, 12, 1), (11, 12, 1)]
        got2 = sorted((r["b"], r["c"], r["n"]) for r in
                      cocitation_counts(e, min_count=2).take_all())
        assert got2 == [(10, 11, 2)]
