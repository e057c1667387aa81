"""Connected components (geoflow/graph/components.py). Driver gate is
the `graph_components` oracle query (planted residue classes); these
tests pin the semantics on hand-built graphs and prove the distributed
pointer-jumping path identical to the driver path."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.graph.components import connected_components


def _edges(src, dst):
    import ray
    return ray.data.from_arrow(pa.table({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64)}))


def _cc(ds, **kw):
    df = connected_components(ds, **kw).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    return dict(zip(df["node"], df["component"]))


def test_two_components(ray_session):
    got = _cc(_edges([0, 1, 5, 6], [1, 2, 6, 7]))
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 5}


def test_undirected_semantics(ray_session):
    # edge direction must not matter
    got = _cc(_edges([3, 1], [1, 0]))  # 3->1, 1->0 all one component
    assert got == {0: 0, 1: 0, 3: 0}


def test_self_loop_isolated(ray_session):
    got = _cc(_edges([9, 2], [9, 4]))
    assert got == {9: 9, 2: 2, 4: 2}


def test_long_chain_driver_vs_distributed(ray_session):
    # depth-40 chain exercises pointer jumping over multiple rounds
    src = np.arange(40)
    dst = src + 1
    ds = _edges(src, dst)
    drv = _cc(ds, mode="driver")
    dist = _cc(ds, mode="distributed")
    assert drv == dist
    assert set(drv.values()) == {0}


def test_random_graph_equivalence(ray_session):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 120, 200)
    dst = rng.integers(0, 120, 200)
    ds = _edges(src, dst)
    assert _cc(ds, mode="driver") == _cc(ds, mode="distributed")


def test_label_is_min_key(ray_session):
    got = _cc(_edges([10, 11, 12], [11, 12, 3]))
    assert all(v == 3 for v in got.values())


def test_bad_mode(ray_session):
    with pytest.raises(ValueError):
        connected_components(_edges([0], [1]), mode="nope")
