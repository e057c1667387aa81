"""HITS (geoflow/graph/hits.py). Driver gate is the `hits` oracle
query; these tests pin the semantics on hand-checked graphs."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.graph.hits import hits, hits_oracle_sql
from geoflow.graph.pagerank import synth_edges_batch


def _edges(src, dst):
    import ray
    return ray.data.from_arrow(pa.table({
        "src": np.asarray(src, dtype=np.int64),
        "dst": np.asarray(dst, dtype=np.int64)}))


def test_star_authority(ray_session):
    # 1->0, 2->0, 3->0: node 0 is the only authority; 1,2,3 equal hubs
    df = hits(_edges([1, 2, 3], [0, 0, 0]), n_nodes=4,
              iterations=2).to_pandas().sort_values("node")
    a = df["auth_units"].to_numpy()
    h = df["hub_units"].to_numpy()
    assert a[0] == 10 ** 12 and (a[1:] == 0).all()
    assert h[0] == 0
    assert len(set(h[1:])) == 1  # symmetric hubs


def test_no_edges_all_zero(ray_session):
    import ray
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64())}))
    df = hits(ds, n_nodes=3, iterations=1).to_pandas()
    assert (df["auth_units"] == 0).all() and (df["hub_units"] == 0).all()


def test_mass_preserved_by_renorm(ray_session):
    ids = np.arange(100, dtype=np.int64)
    import ray
    ds = ray.data.from_arrow(synth_edges_batch(ids, 100))
    df = hits(ds, n_nodes=100, iterations=3).to_pandas()
    # renormalization floors: sum in (M - n, M]
    assert 10 ** 12 - 100 < df["auth_units"].sum() <= 10 ** 12
    assert 10 ** 12 - 100 < df["hub_units"].sum() <= 10 ** 12


def test_broadcast_bound_guard(ray_session):
    with pytest.raises(ValueError):
        hits(_edges([0], [1]), n_nodes=10, max_broadcast_nodes=5)


def test_oracle_sql_matches_kernels(ray_session):
    import duckdb
    import ray
    n = 80
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT unnest(range({n})) AS doc_id")
    want = con.execute(hits_oracle_sql(iterations=2)).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    ds = ray.data.from_arrow(
        synth_edges_batch(np.arange(n, dtype=np.int64), n))
    got = hits(ds, n_nodes=n, iterations=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    for rcol, ocol in (("auth_units", "auth_units"),
                       ("hub_units", "hub_units")):
        assert (got[rcol].to_numpy() == want[ocol].to_numpy()).all()
    assert (got["auth"].to_numpy().view(np.int64)
            == want["auth"].to_numpy().view(np.int64)).all()
