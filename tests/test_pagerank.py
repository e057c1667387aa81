"""PageRank (geoflow/graph/pagerank.py). The driver-facing value gate
is the `pagerank` oracle query (unrolled-CTE SQL generated from the
same constants); these tests pin the fixed-point semantics on
hand-checked graphs and prove the three execution modes identical."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.graph.pagerank import (attach_outdegree, pagerank,
                                    pagerank_oracle_sql,
                                    synth_edges_batch)


def _edges_ds(src, dst, outdeg=None):
    import ray
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    cols = {"src": src, "dst": dst}
    if outdeg is not None:
        cols["outdeg"] = np.asarray(outdeg, dtype=np.int64)
    return ray.data.from_arrow(pa.table(cols))


def _ranks(ds):
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return df["rank_units"].to_numpy()


def test_hand_checked_cycle(ray_session):
    # 3-cycle 0->1->2->0, outdeg all 1: uniform is the fixed point.
    ds = _edges_ds([0, 1, 2], [1, 2, 0], [1, 1, 1])
    r = _ranks(pagerank(ds, n_nodes=3, iterations=3, mass=10 ** 12))
    r0 = 10 ** 12 // 3
    base = (r0 * 3) // 20
    # one step: base + 17*r0//20; iterate by hand
    x = r0
    for _ in range(3):
        x = base + (17 * x) // 20
    assert (r == x).all()


def test_hand_checked_star(ray_session):
    # 1->0, 2->0, 0->0 (self-loop keeps outdeg >= 1): node 0 collects.
    ds = _edges_ds([0, 1, 2], [0, 0, 0], [1, 1, 1])
    r = _ranks(pagerank(ds, n_nodes=3, iterations=1, mass=10 ** 12))
    r0 = 10 ** 12 // 3
    base = (r0 * 3) // 20
    assert r[0] == base + (17 * (3 * r0)) // 20
    assert r[1] == base and r[2] == base  # no in-links -> base only
    assert r[0] > r[1]


def test_outdeg_division(ray_session):
    # node 0 splits rank over 2 out-edges (integer floor division).
    ds = _edges_ds([0, 0, 1, 2], [1, 2, 1, 2], [2, 2, 1, 1])
    r = _ranks(pagerank(ds, n_nodes=3, iterations=1))
    r0 = 10 ** 12 // 3
    base = (r0 * 3) // 20
    assert r[0] == base
    assert r[1] == base + (17 * (r0 // 2 + r0)) // 20
    assert r[2] == r[1]


def test_modes_identical(ray_session):
    ids = np.arange(200, dtype=np.int64)
    t = synth_edges_batch(ids, 200)
    import ray
    ds = ray.data.from_arrow(t)
    a = _ranks(pagerank(ds, n_nodes=200, iterations=3))
    b = _ranks(pagerank(ds, n_nodes=200, iterations=3,
                        reduce="groupby"))
    c = _ranks(pagerank(ds, n_nodes=200, iterations=3, mode="join",
                        num_partitions=2))
    assert (a == b).all() and (a == c).all()


def test_float_rank_is_exact_division(ray_session):
    ds = _edges_ds([0, 1], [1, 0], [1, 1])
    df = pagerank(ds, n_nodes=2, iterations=2).to_pandas()
    u = df["rank_units"].to_numpy()
    assert (df["rank"].to_numpy() == u.astype(np.float64) / 1e12).all()


def test_mass_nearly_conserved(ray_session):
    ids = np.arange(100, dtype=np.int64)
    import ray
    ds = ray.data.from_arrow(synth_edges_batch(ids, 100))
    r = _ranks(pagerank(ds, n_nodes=100, iterations=4))
    # floor divisions only ever lose units: mass can't grow, and the
    # loss is bounded by (edges + nodes) units per iteration.
    assert r.sum() <= 10 ** 12
    assert r.sum() >= 10 ** 12 - 4 * (len(ids) * 3 + 100) - 100


def test_synth_edges_shape():
    ids = np.arange(50, dtype=np.int64)
    t = synth_edges_batch(ids, 50)
    deg = 1 + (ids % 3)
    assert t.num_rows == int(deg.sum())
    dst = t.column("dst").to_numpy()
    assert dst.min() >= 0 and dst.max() < 50
    od = t.column("outdeg").to_numpy()
    src = t.column("src").to_numpy()
    assert (od == 1 + (src % 3)).all()
    # every src appears exactly outdeg times
    u, c = np.unique(src, return_counts=True)
    assert (c == 1 + (u % 3)).all()


def test_attach_outdegree(ray_session):
    ds = _edges_ds([0, 0, 1, 3], [1, 2, 0, 3])
    out = attach_outdegree(ds, num_partitions=2).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    assert out["outdeg"].tolist() == [2, 2, 1, 1]
    # composes with pagerank (node 2 has no out-edges -> absent from
    # edges; it still receives base as a rank sink is not re-emitted)
    import ray
    got = attach_outdegree(ds, num_partitions=2)
    r = _ranks(pagerank(got, n_nodes=4, iterations=1))
    assert len(r) == 4


def test_weighted_contrib(ray_session):
    # node 0 splits mass 3:1 between nodes 1 and 2 (out_weight 4).
    import ray
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 0, 1, 2], type=pa.int64()),
        "dst": pa.array([1, 2, 1, 2], type=pa.int64()),
        "w": pa.array([3, 1, 1, 1], type=pa.int64()),
        "outw": pa.array([4, 4, 1, 1], type=pa.int64())}))
    r = _ranks(pagerank(ds, n_nodes=3, iterations=1,
                        outdeg_col="outw", weight_col="w"))
    r0 = 10 ** 12 // 3
    base = (r0 * 3) // 20
    assert r[0] == base
    assert r[1] == base + (17 * ((r0 * 3) // 4 + r0)) // 20
    assert r[2] == base + (17 * ((r0 * 1) // 4 + r0)) // 20
    # weighted join mode agrees
    rj = _ranks(pagerank(ds, n_nodes=3, iterations=1, mode="join",
                         outdeg_col="outw", weight_col="w",
                         num_partitions=2))
    assert (r == rj).all()


def test_bad_args(ray_session):
    ds = _edges_ds([0], [0], [1])
    with pytest.raises(ValueError):
        pagerank(ds, n_nodes=1, mode="nope")
    with pytest.raises(ValueError):
        pagerank(ds, n_nodes=1, reduce="nope")


def test_oracle_sql_matches_kernels():
    """The generated SQL reproduces the numpy/Ray result exactly via
    DuckDB on a toy table (the sf-level gate is tools/check_oracles)."""
    import duckdb
    import ray
    n = 60
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT unnest(range({n})) AS doc_id")
    want = con.execute(pagerank_oracle_sql(iterations=2)).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(synth_edges_batch(ids, n))
    got = pagerank(ds, n_nodes=n, iterations=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert (got["rank_units"].to_numpy()
            == want["rank_units"].to_numpy()).all()
    assert (got["rank"].to_numpy().view(np.int64)
            == want["rank"].to_numpy().view(np.int64)).all()


def test_seeded_modes_identical(ray_session):
    # TrustRank: teleport uniform over seeds; all three execution
    # modes must agree bit-for-bit.
    ids = np.arange(200, dtype=np.int64)
    seeds = ids[ids % 17 == 3]
    import ray
    ds = ray.data.from_arrow(synth_edges_batch(ids, 200))
    a = _ranks(pagerank(ds, n_nodes=200, iterations=3, seeds=seeds))
    b = _ranks(pagerank(ds, n_nodes=200, iterations=3, seeds=seeds,
                        reduce="groupby"))
    c = _ranks(pagerank(ds, n_nodes=200, iterations=3, seeds=seeds,
                        mode="join", num_partitions=2))
    assert (a == b).all() and (a == c).all()


def test_seeded_hand_checked(ray_session):
    # 0->1->2->0 cycle with seed {0}: non-seeds get no base term.
    ds = _edges_ds([0, 1, 2], [1, 2, 0], [1, 1, 1])
    r = _ranks(pagerank(ds, n_nodes=3, iterations=1, mass=10 ** 12,
                        seeds=np.array([0])))
    r0 = 10 ** 12                 # all teleport mass on node 0
    base = (r0 * 3) // 20
    # after 1 iter: node1 gets 17*r0//20 (from 0) + no base;
    # node 0 gets base + 17*0//20; node 2 gets 0
    assert r[0] == base
    assert r[1] == (17 * r0) // 20
    assert r[2] == 0


def test_seeded_mass_bounded(ray_session):
    ids = np.arange(100, dtype=np.int64)
    seeds = np.array([5, 50, 95], dtype=np.int64)
    import ray
    ds = ray.data.from_arrow(synth_edges_batch(ids, 100))
    r = _ranks(pagerank(ds, n_nodes=100, iterations=4, seeds=seeds))
    assert r.sum() <= 10 ** 12
    assert r[seeds].min() > 0


def test_seeds_empty_raises(ray_session):
    ds = _edges_ds([0], [0], [1])
    with pytest.raises(ValueError):
        pagerank(ds, n_nodes=1, seeds=np.array([], dtype=np.int64))
