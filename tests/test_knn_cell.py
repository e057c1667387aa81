"""Cell-keyed kNN (scale path) vs brute-force oracle."""

import numpy as np
import pyarrow as pa

from geoflow.geom.greatcircle import vincenty_sphere_m


def test_knn_cell_join_matches_bruteforce(ray_session):
    import ray
    from geoflow.join import knn_cell_join
    rng = np.random.default_rng(4)
    nn = 3000
    nx = rng.uniform(0, 20, nn)
    ny = rng.uniform(40, 60, nn)
    nbrs = pa.table({"neighbor_id": pa.array(np.arange(nn)),
                     "x": pa.array(nx), "y": pa.array(ny)})
    n_probe = 100
    px = rng.uniform(2, 18, n_probe)
    py = rng.uniform(42, 58, n_probe)
    probes = pa.table({"doc_id": pa.array(np.arange(n_probe)),
                       "x": pa.array(px), "y": pa.array(py)})
    out = knn_cell_join(ray.data.from_arrow(probes),
                        ray.data.from_arrow(nbrs), k=4, res=5, disk=1,
                        num_partitions=4)
    by = {}
    for r in out.take_all():
        by.setdefault(r["doc_id"], []).append(r)
    for i in range(n_probe):
        d = vincenty_sphere_m(px[i], py[i], nx, ny)
        exp = sorted(range(nn), key=lambda j: (d[j], j))[:4]
        got = [r["neighbor_id"] for r in sorted(by[i], key=lambda r: r["rank"])]
        assert got == exp


def test_knn_cell_join_widens_for_sparse_probes(ray_session):
    """Probes whose 3x3 cell disk holds < k (or zero) neighbors must be
    retried at a wider ring, not silently dropped/truncated."""
    import ray
    from geoflow.join import knn_cell_join
    # neighbors clustered near (10, 50); one lone neighbor far away
    rng = np.random.default_rng(7)
    nn = 200
    nx = np.concatenate([rng.uniform(9, 11, nn - 1), [30.0]])
    ny = np.concatenate([rng.uniform(49, 51, nn - 1), [50.0]])
    nbrs = pa.table({"neighbor_id": pa.array(np.arange(nn)),
                     "x": pa.array(nx), "y": pa.array(ny)})
    # probe 0 sits inside the cluster; probe 1 is ~8 cells away from
    # everything (res 5 → ~1.1° cells), so its 3x3 disk finds nothing
    probes = pa.table({"doc_id": pa.array([0, 1]),
                       "x": pa.array([10.0, 21.0]),
                       "y": pa.array([50.0, 50.0])})
    out = knn_cell_join(ray.data.from_arrow(probes),
                        ray.data.from_arrow(nbrs), k=3, res=5, disk=1,
                        num_partitions=2)
    by = {}
    for r in out.take_all():
        by.setdefault(r["doc_id"], []).append(r)
    assert len(by[0]) == 3
    # the sparse probe gets its true 3 nearest via the widened disk
    d = vincenty_sphere_m(21.0, 50.0, nx, ny)
    exp = sorted(range(nn), key=lambda j: (d[j], j))[:3]
    got = [r["neighbor_id"] for r in sorted(by[1], key=lambda r: r["rank"])]
    assert got == exp


def test_knn_h3_join_matches_bruteforce(ray_session):
    """H3-keyed kNN (north-star 'nearby via H3 grid_disk'): exact top-k
    vs brute force, including the wider-disk retry for sparse probes."""
    import ray
    from geoflow.join import knn_h3_join
    rng = np.random.default_rng(9)
    nn = 1500
    nx = rng.uniform(5, 8, nn)
    ny = rng.uniform(45, 48, nn)
    nbrs = pa.table({"neighbor_id": pa.array(np.arange(nn)),
                     "x": pa.array(nx), "y": pa.array(ny)})
    n_probe = 40
    px = rng.uniform(5.5, 7.5, n_probe)
    py = rng.uniform(45.5, 47.5, n_probe)
    probes = pa.table({"doc_id": pa.array(np.arange(n_probe)),
                       "x": pa.array(px), "y": pa.array(py)})
    out = knn_h3_join(ray.data.from_arrow(probes),
                      ray.data.from_arrow(nbrs), k=3, res=5, disk=1,
                      num_partitions=2)
    by = {}
    for r in out.take_all():
        by.setdefault(r["doc_id"], []).append(r)
    for i in range(n_probe):
        d = vincenty_sphere_m(px[i], py[i], nx, ny)
        exp = sorted(range(nn), key=lambda j: (d[j], j))[:3]
        got = [r["neighbor_id"] for r in sorted(by[i],
                                                key=lambda r: r["rank"])]
        assert got == exp


def test_knn_cell_join_high_latitude_exact(ray_session):
    """Regression (round-3 ADVICE): at high latitude a degree-grid disk
    covers only cos(lat)x as many ground meters east-west as the old
    lat-spacing guard claimed, so a probe could keep in-disk neighbors
    ~90 km away and never see a ~47 km neighbor sitting 4 degrees east
    (outside the 3x3 disk). The latitude-aware guard must force the
    widening retry and return the true global top-k."""
    import ray
    from geoflow.join import knn_cell_join
    # probe at (0, 84); two in-disk decoys ~89 km south; the true
    # nearest ~47 km away at 4 degrees east (outside disk=1 at res 5)
    nbrs = pa.table({"neighbor_id": pa.array([0, 1, 2], type=pa.int64()),
                     "x": pa.array([0.0, 0.5, 4.0]),
                     "y": pa.array([83.2, 83.2, 84.0])})
    probes = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                       "x": pa.array([0.0]), "y": pa.array([84.0])})
    out = knn_cell_join(ray.data.from_arrow(probes),
                        ray.data.from_arrow(nbrs), k=2, res=5, disk=1,
                        num_partitions=2)
    rows = sorted(out.take_all(), key=lambda r: r["rank"])
    nx = np.array([0.0, 0.5, 4.0])
    ny = np.array([83.2, 83.2, 84.0])
    d = vincenty_sphere_m(0.0, 84.0, nx, ny)
    exp = sorted(range(3), key=lambda j: (d[j], j))[:2]
    assert [r["neighbor_id"] for r in rows] == exp
    assert "py" not in out.schema().names


def test_knn_cell_join_join_mode_retry_matches_broadcast(ray_session):
    """max_broadcast_retry=0 forces every widening round through the
    distributed join path (_retry_keys_ds + partitioned_key_filter);
    results must be identical to the broadcast path — including probes
    with ZERO candidates in the first disk."""
    import ray
    from geoflow.join import knn_cell_join
    rng = np.random.default_rng(11)
    nn = 400
    nx = np.concatenate([rng.uniform(9, 11, nn - 2), [30.0, 31.0]])
    ny = np.concatenate([rng.uniform(49, 51, nn - 2), [50.0, 50.5]])
    nbrs = pa.table({"neighbor_id": pa.array(np.arange(nn)),
                     "x": pa.array(nx), "y": pa.array(ny)})
    # mix: in-cluster probes plus sparse probes whose first disk is
    # empty or under-filled
    probes = pa.table({"doc_id": pa.array([0, 1, 2, 3]),
                       "x": pa.array([10.0, 21.0, 10.5, 28.0]),
                       "y": pa.array([50.0, 50.0, 49.5, 50.0])})

    def run(cap):
        out = knn_cell_join(ray.data.from_arrow(probes),
                            ray.data.from_arrow(nbrs), k=3, res=5,
                            disk=1, num_partitions=2,
                            max_broadcast_retry=cap)
        rows = sorted(((r["doc_id"], r["rank"], r["neighbor_id"],
                        round(r["dist_m"], 6)) for r in out.take_all()))
        return rows

    broadcast = run(4_000_000)
    joinmode = run(0)
    assert broadcast == joinmode
    assert len({d for d, _, _, _ in broadcast}) == 4


def test_knn_h3_join_join_mode_retry_matches_broadcast(ray_session):
    import ray
    from geoflow.join import knn_h3_join
    rng = np.random.default_rng(13)
    nn = 300
    nx = np.concatenate([rng.uniform(9, 11, nn - 1), [14.0]])
    ny = np.concatenate([rng.uniform(49, 51, nn - 1), [50.0]])
    nbrs = pa.table({"neighbor_id": pa.array(np.arange(nn)),
                     "x": pa.array(nx), "y": pa.array(ny)})
    probes = pa.table({"doc_id": pa.array([0, 1]),
                       "x": pa.array([10.0, 13.5]),
                       "y": pa.array([50.0, 50.0])})

    def run(cap):
        out = knn_h3_join(ray.data.from_arrow(probes),
                          ray.data.from_arrow(nbrs), k=3, res=6,
                          disk=2, num_partitions=2,
                          max_broadcast_retry=cap)
        return sorted(((r["doc_id"], r["rank"], r["neighbor_id"],
                        round(r["dist_m"], 6)) for r in out.take_all()))

    assert run(4_000_000) == run(0)
