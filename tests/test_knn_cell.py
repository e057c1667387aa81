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
