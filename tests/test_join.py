"""Spatial-join parity vs brute-force oracle (FIXTURES.md §6)."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.geom import algorithms as alg, from_wkb
from geoflow.geom.wkb import wkb_to_points
from geoflow.io.synth import make_corpus_block, make_polygon_table
from geoflow.extract import ExtractWkt


@pytest.fixture(scope="module")
def corpus_points(ray_session):
    import ray
    corpus = pa.concat_tables([make_corpus_block(b, 400) for b in range(3)])
    ds = ray.data.from_arrow(corpus)
    geoms = ds.map_batches(ExtractWkt(), batch_format="pyarrow")
    gt = pa.Table.from_pylist(geoms.take_all())
    mask = [b is not None and len(b) == 21
            for b in gt.column("geom_wkb").to_pylist()]
    pts = gt.filter(pa.array(mask))
    x, y = wkb_to_points(pts.column("geom_wkb").to_pylist())
    return pts.append_column("x", pa.array(x)).append_column("y", pa.array(y))


@pytest.fixture(scope="module")
def polys():
    return make_polygon_table(250)


@pytest.fixture(scope="module")
def oracle_pairs(corpus_points, polys):
    x = corpus_points.column("x").to_numpy()
    y = corpus_points.column("y").to_numpy()
    urls = corpus_points.column("url").to_pylist()
    gidx = corpus_points.column("geom_idx").to_pylist()
    ids = polys.column("poly_id").to_numpy()
    out = set()
    for j, b in enumerate(polys.column("geom_wkb").to_pylist()):
        g = from_wkb(b)
        for i in np.nonzero(alg.points_in_polygon(x, y, g))[0]:
            out.add((urls[i], gidx[i], int(ids[j])))
    return out


def test_broadcast_join_matches_oracle(ray_session, corpus_points, polys,
                                       oracle_pairs):
    import ray
    from geoflow.join import BroadcastPIPJoin, PolygonIndex
    ref = ray.put(PolygonIndex(polys))
    out = ray.data.from_arrow(corpus_points).map_batches(
        BroadcastPIPJoin, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"x_col": "x", "y_col": "y"},
        batch_format="pyarrow", concurrency=2)
    got = {(r["url"], r["geom_idx"], r["poly_id"]) for r in out.take_all()}
    assert got == oracle_pairs


def test_cell_join_hashjoin_matches_oracle(ray_session, corpus_points, polys,
                                           oracle_pairs):
    import ray
    from geoflow.join import cell_join
    got_ds = cell_join(ray.data.from_arrow(corpus_points),
                       ray.data.from_arrow(polys), num_partitions=8)
    got = {(r["url"], r["geom_idx"], r["poly_id"]) for r in got_ds.take_all()}
    assert got == oracle_pairs


@pytest.mark.parametrize("hot_threshold,n_salt", [(0, 1), (10, 4)])
def test_cell_join_groupby_matches_oracle(ray_session, corpus_points, polys,
                                          oracle_pairs, hot_threshold, n_salt):
    import ray
    from geoflow.join import cell_join_groupby
    got_ds = cell_join_groupby(ray.data.from_arrow(corpus_points),
                               ray.data.from_arrow(polys),
                               hot_threshold=hot_threshold, n_salt=n_salt)
    got = {(r["url"], r["geom_idx"], r["poly_id"]) for r in got_ds.take_all()}
    assert got == oracle_pairs


def test_salting_activates_on_hot_cluster(ray_session, polys):
    """The synthetic polygon corpus concentrates 20% of polygons near
    (10,50): the hot-cell pre-pass must find at least one hot cell."""
    import ray
    from geoflow.join import find_hot_cells, prepare_polygon_side
    pol = prepare_polygon_side(ray.data.from_arrow(polys),
                               keep_types={"url": pa.string(),
                                           "geom_idx": pa.int32()})
    hot = find_hot_cells(pol, hot_threshold=30)
    assert len(hot) >= 1


def test_knn_matches_bruteforce(ray_session, corpus_points):
    import ray
    from geoflow.join import KnnBroadcast, NeighborSet
    from geoflow.geom.greatcircle import vincenty_sphere_m
    rng = np.random.default_rng(9)
    nlon = rng.uniform(-180, 180, 200)
    nlat = rng.uniform(-85, 85, 200)
    ids = np.arange(200)
    nref = ray.put(NeighborSet(ids, nlon, nlat))
    out = ray.data.from_arrow(corpus_points).map_batches(
        KnnBroadcast, fn_constructor_args=(nref,),
        fn_constructor_kwargs={"k": 4}, batch_format="pyarrow", concurrency=2)
    rows = out.take_all()
    by_probe = {}
    for r in rows:
        by_probe.setdefault((r["url"], r["geom_idx"]), []).append(r)
    x = corpus_points.column("x").to_numpy()
    y = corpus_points.column("y").to_numpy()
    urls = corpus_points.column("url").to_pylist()
    gidx = corpus_points.column("geom_idx").to_pylist()
    checked = 0
    for i in range(0, len(urls), 97):
        d = vincenty_sphere_m(x[i], y[i], nlon, nlat)
        exp = sorted(range(200), key=lambda j: (d[j], j))[:4]
        got = [r["neighbor_id"] for r in
               sorted(by_probe[(urls[i], gidx[i])], key=lambda r: r["rank"])]
        assert got == exp
        checked += 1
    assert checked > 5


def test_three_join_paths_agree_randomized(ray_session):
    """Broadcast, grid-cell-keyed, and H3-keyed joins must produce the
    identical pair set on random corpora (the core product guarantee:
    the shuffle strategy is a performance choice, never a semantic
    one)."""
    import ray
    from geoflow.geom import Geometry, to_wkb
    from geoflow.join import (BroadcastPIPJoin, PolygonIndex, cell_join,
                              cell_join_h3)
    rng = np.random.default_rng(17)
    for trial in range(2):
        npolys = 30
        wkbs = []
        for i in range(npolys):
            cx, cy = rng.uniform(-60, 60), rng.uniform(-40, 40)
            w, h = rng.uniform(1, 6), rng.uniform(1, 6)
            ring = np.array([[cx - w, cy - h], [cx + w, cy - h],
                             [cx + w, cy + h], [cx - w, cy + h],
                             [cx - w, cy - h]])
            wkbs.append(to_wkb(Geometry(3, rings=[ring])))
        polys = pa.table({"poly_id": pa.array(np.arange(npolys)),
                          "geom_wkb": pa.array(wkbs, type=pa.binary())})
        npts = 800
        px = rng.uniform(-70, 70, npts)
        py = rng.uniform(-50, 50, npts)
        pts_tbl = pa.table({
            "doc_id": pa.array(np.arange(npts)),
            "geom_idx": pa.array(np.zeros(npts, dtype=np.int32)),
            "x": pa.array(px), "y": pa.array(py)})

        def pairs_of(ds):
            return {(r["doc_id"], int(r["poly_id"]))
                    for r in ds.take_all()}

        ref = ray.put(PolygonIndex(polys))
        bc = ray.data.from_arrow(pts_tbl).map_batches(
            BroadcastPIPJoin, fn_constructor_args=(ref,),
            fn_constructor_kwargs={"x_col": "x", "y_col": "y",
                                   "out_cols": ("doc_id",)},
            batch_format="pyarrow", concurrency=2)
        expected = pairs_of(bc)
        pts_ds = ray.data.from_arrow(pts_tbl)
        polys_ds = ray.data.from_arrow(polys)
        got_cell = pairs_of(cell_join(pts_ds, polys_ds,
                                      keep_cols=("doc_id", "geom_idx")))
        got_h3 = pairs_of(cell_join_h3(pts_ds, polys_ds, res=4,
                                       keep_cols=("doc_id", "geom_idx")))
        assert got_cell == expected
        assert got_h3 == expected
        assert expected, "degenerate trial (no pairs)"
