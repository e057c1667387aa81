"""Distributed DBSCAN / k-means vs brute-force references."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.ops.clustering import dbscan, kmeans


def _brute_dbscan(key, x, y, eps, min_pts):
    n = len(key)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    near = d2 <= eps * eps
    core = near.sum(1) >= min_pts
    parent = {int(k): int(k) for k in key[core]}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ci = np.nonzero(core)[0]
    for i in ci:
        for j in ci:
            if i < j and near[i, j]:
                ra, rb = find(int(key[i])), find(int(key[j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    lab = {k: find(k) for k in parent}
    out = {}
    for i in range(n):
        k = int(key[i])
        if core[i]:
            out[k] = (lab[k], True)
        else:
            cand = [lab[int(key[j])] for j in ci if near[i, j]]
            out[k] = (min(cand), False) if cand else (-1, False)
    return out


def _run(ray, key, x, y, eps, min_pts, **kw):
    ds = ray.data.from_arrow(pa.table(
        {"key": pa.array(key), "x": pa.array(x),
         "y": pa.array(y)})).repartition(4)
    res = dbscan(ds, eps=eps, min_pts=min_pts, **kw)
    return {r["key"]: (r["cluster"], r["is_core"]) for r in res.take_all()}


def test_dbscan_blobs_and_noise(ray_session):
    rng = np.random.RandomState(42)
    n = 400
    x = rng.uniform(-50, 50, n)
    y = rng.uniform(-50, 50, n)
    for c in range(4):
        cx, cy = rng.uniform(-40, 40, 2)
        x[c * 20:(c + 1) * 20] = cx + rng.uniform(-1.2, 1.2, 20)
        y[c * 20:(c + 1) * 20] = cy + rng.uniform(-1.2, 1.2, 20)
    key = np.arange(n, dtype=np.int64)
    got = _run(ray_session, key, x, y, 2.0, 4)
    want = _brute_dbscan(key, x, y, 2.0, 4)
    assert got == want
    assert len({c for c, _ in got.values() if c >= 0}) >= 4


def test_dbscan_long_chain_needs_propagation(ray_session):
    """A 120-point chain (spacing < eps) is ONE cluster labeled by the
    min key — exercises the pointer-jumping depth, which a single
    propagation round cannot solve."""
    n = 120
    key = np.arange(n, dtype=np.int64)[::-1].copy()  # min key at far end
    x = np.arange(n) * 0.9
    y = np.zeros(n)
    got = _run(ray_session, key, x, y, 1.0, 2)
    assert all(c == 0 for c, _ in got.values())
    assert all(ic for _, ic in got.values())


def test_dbscan_border_and_noise_rules(ray_session):
    """3 close points (cores @ min_pts=3) + 1 within eps of one core
    (border -> min component key) + 1 isolated (noise)."""
    key = np.array([10, 11, 12, 20, 30], dtype=np.int64)
    x = np.array([0.0, 0.5, 1.0, 1.8, 9.0])
    y = np.zeros(5)
    got = _run(ray_session, key, x, y, 1.0, 3)
    assert got[10] == (10, True)
    assert got[11] == (10, True)
    assert got[12] == (10, True)
    assert got[20] == (10, False)     # border of the cluster
    assert got[30] == (-1, False)     # noise


def test_dbscan_eps_boundary_inclusive(ray_session):
    key = np.array([1, 2], dtype=np.int64)
    x = np.array([0.0, 1.0])
    y = np.zeros(2)
    got = _run(ray_session, key, x, y, 1.0, 2)   # dist == eps counts
    assert got[1] == (1, True) and got[2] == (1, True)


def test_dbscan_distributed_cc_path(ray_session):
    """Force cc_mode='distributed' (label-propagation fallback) on a
    case with multiple clusters, a border point, and noise; must agree
    with both the brute reference and the driver-CC path."""
    rng = np.random.RandomState(3)
    pts = []
    for c, (cx, cy) in enumerate([(0.0, 0.0), (20.0, 5.0), (40.0, -3.0)]):
        for i in range(18):
            pts.append((c * 100 + i,
                        cx + rng.uniform(-1.5, 1.5),
                        cy + rng.uniform(-1.5, 1.5)))
    pts.append((900, 2.9, 0.0))    # border-ish of cluster 0
    pts.append((901, 99.0, 99.0))  # noise
    key = np.array([p[0] for p in pts], dtype=np.int64)
    x = np.array([p[1] for p in pts])
    y = np.array([p[2] for p in pts])
    got = _run(ray_session, key, x, y, 1.4, 3, cc_mode="distributed")
    want = _brute_dbscan(key, x, y, 1.4, 3)
    assert got == want
    assert got == _run(ray_session, key, x, y, 1.4, 3, cc_mode="driver")


def test_dbscan_matches_brute_on_random(ray_session):
    rng = np.random.RandomState(7)
    n = 250
    key = rng.permutation(np.arange(1000, 1000 + n)).astype(np.int64)
    x = rng.uniform(0, 30, n)
    y = rng.uniform(0, 30, n)
    got = _run(ray_session, key, x, y, 1.5, 3)
    assert got == _brute_dbscan(key, x, y, 1.5, 3)


def _brute_kmeans(key, xi, yi, k, iters, scale):
    order = np.argsort(key, kind="stable")[:k]
    cx = xi[order].astype(np.float64) / scale
    cy = yi[order].astype(np.float64) / scale
    x, y = xi / scale, yi / scale
    for _ in range(iters):
        d2 = (x[:, None] - cx[None, :]) ** 2 + (y[:, None] - cy[None, :]) ** 2
        a = np.argmin(d2, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cx[c] = xi[m].sum() / (scale * m.sum())
                cy[c] = yi[m].sum() / (scale * m.sum())
    d2 = (x[:, None] - cx[None, :]) ** 2 + (y[:, None] - cy[None, :]) ** 2
    return np.argmin(d2, axis=1)


@pytest.mark.parametrize("reduce_mode", ["driver", "groupby"])
def test_kmeans_matches_brute_int_lattice(ray_session, reduce_mode):
    rng = np.random.RandomState(11)
    n = 300
    key = rng.permutation(np.arange(n)).astype(np.int64)
    xi = rng.randint(0, 4000, n).astype(np.int64)
    yi = rng.randint(0, 4000, n).astype(np.int64)
    ds = ray_session.data.from_arrow(pa.table(
        {"key": pa.array(key), "xi": pa.array(xi),
         "yi": pa.array(yi)})).repartition(4)
    res = kmeans(ds, x_col="xi", y_col="yi", k=6, iters=3, scale=10.0,
                 reduce_mode=reduce_mode)
    got = {r["key"]: r["cluster"] for r in res.take_all()}
    want = _brute_kmeans(key, xi, yi, 6, 3, 10.0)
    assert got == {int(k_): int(c) for k_, c in zip(key, want)}
    assert len(set(got.values())) == 6


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """Two far blobs, k=3 seeded from the 3 lowest keys (all in blob A):
    after one update at least one centroid is empty and must persist."""
    key = np.arange(40, dtype=np.int64)
    xi = np.where(key < 20, key * 3, 100000 + key * 3).astype(np.int64)
    yi = np.zeros(40, dtype=np.int64)
    ds = ray_session.data.from_arrow(pa.table(
        {"key": pa.array(key), "xi": pa.array(xi), "yi": pa.array(yi)}))
    res = kmeans(ds, x_col="xi", y_col="yi", k=3, iters=2, scale=10.0)
    got = {r["key"]: r["cluster"] for r in res.take_all()}
    want = _brute_kmeans(key, xi, yi, 3, 2, 10.0)
    assert got == {int(k_): int(c) for k_, c in zip(key, want)}


def test_kmeans_float_coords_deterministic(ray_session):
    rng = np.random.RandomState(5)
    n = 200
    key = np.arange(n, dtype=np.int64)
    x = rng.uniform(0, 100, n)
    y = rng.uniform(0, 100, n)
    ds = ray_session.data.from_arrow(pa.table(
        {"key": pa.array(key), "x": pa.array(x), "y": pa.array(y)}))
    a = {r["key"]: r["cluster"]
         for r in kmeans(ds, k=5, iters=2).take_all()}
    b = {r["key"]: r["cluster"]
         for r in kmeans(ds, k=5, iters=2).take_all()}
    assert a == b and len(set(a.values())) >= 2


def test_cluster_within_matches_brute(ray_session):
    from geoflow.ops.clustering import cluster_within
    rng = np.random.RandomState(19)
    n = 200
    key = rng.permutation(np.arange(500, 500 + n)).astype(np.int64)
    x = rng.uniform(0, 40, n)
    y = rng.uniform(0, 40, n)
    ds = ray_session.data.from_arrow(pa.table(
        {"key": pa.array(key), "x": pa.array(x),
         "y": pa.array(y)})).repartition(4)
    got = {r["key"]: r["cluster"]
           for r in cluster_within(ds, distance=2.0).take_all()}
    want = {k: c for k, (c, _) in _brute_dbscan(key, x, y, 2.0, 1).items()}
    assert got == want
    assert len(got) == n


def _rect_wkb(cx, cy, w, h):
    from geoflow.geom import Geometry, to_wkb
    x0, x1, y0, y1 = cx - w, cx + w, cy - h, cy + h
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    return to_wkb(Geometry(3, rings=[ring]))


def test_cluster_intersecting_rects(ray_session):
    """Random rects: exact answer = bbox-overlap CC (rect == bbox);
    check refine=True and refine=False agree with brute union-find."""
    from geoflow.ops.clustering import cluster_intersecting
    rng = np.random.RandomState(23)
    n = 120
    key = np.arange(n, dtype=np.int64) * 7 + 3
    cx = rng.uniform(0, 60, n)
    cy = rng.uniform(0, 60, n)
    w = rng.uniform(0.3, 1.2, n)
    h = rng.uniform(0.3, 1.2, n)
    wkbs = [_rect_wkb(cx[i], cy[i], w[i], h[i]) for i in range(n)]
    # brute CC over closed-boundary rect overlap
    parent = {int(k): int(k) for k in key}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if abs(cx[i] - cx[j]) <= w[i] + w[j] \
                    and abs(cy[i] - cy[j]) <= h[i] + h[j]:
                ra, rb = find(int(key[i])), find(int(key[j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {int(k): find(int(k)) for k in key}

    ds = ray_session.data.from_arrow(pa.table(
        {"key": pa.array(key),
         "geom_wkb": pa.array(wkbs, type=pa.binary())})).repartition(4)
    for refine in (True, False):
        got = {r["key"]: r["cluster"] for r in cluster_intersecting(
            ds, cell_size=3.0, refine=refine).take_all()}
        assert got == want, f"refine={refine}"


def test_cluster_intersecting_refine_prunes_bbox_false_positives(ray_session):
    """Two disjoint triangles whose bboxes overlap: refine=True keeps
    them separate, refine=False merges them."""
    from geoflow.geom import Geometry, to_wkb
    from geoflow.ops.clustering import cluster_intersecting
    t1 = to_wkb(Geometry(3, rings=[np.array(
        [[0.0, 0.0], [4.0, 0.0], [0.0, 4.0], [0.0, 0.0]])]))
    t2 = to_wkb(Geometry(3, rings=[np.array(
        [[4.0, 4.0], [3.9, 4.0], [4.0, 3.9], [4.0, 4.0]])]))
    ds = ray_session.data.from_arrow(pa.table(
        {"key": pa.array([1, 2], type=pa.int64()),
         "geom_wkb": pa.array([t1, t2], type=pa.binary())}))
    exact = {r["key"]: r["cluster"] for r in cluster_intersecting(
        ds, cell_size=2.0, refine=True).take_all()}
    assert exact == {1: 1, 2: 2}
    bbox = {r["key"]: r["cluster"] for r in cluster_intersecting(
        ds, cell_size=2.0, refine=False).take_all()}
    assert bbox == {1: 1, 2: 1}


def test_cluster_intersecting_distributed_mode(ray_session):
    """Chain of overlapping rects through the distributed-CC path."""
    from geoflow.ops.clustering import cluster_intersecting
    n = 12
    key = np.arange(n, dtype=np.int64)[::-1].copy() + 100
    wkbs = [_rect_wkb(i * 1.5, 0.0, 1.0, 1.0) for i in range(n)]
    ds = ray_session.data.from_arrow(pa.table(
        {"key": pa.array(key),
         "geom_wkb": pa.array(wkbs, type=pa.binary())}))
    got = {r["key"]: r["cluster"] for r in cluster_intersecting(
        ds, cell_size=2.0, cc_mode="distributed").take_all()}
    assert got == {int(k): 100 for k in key}


def _brute_kmeans_nd(key, mat, k, iters, spherical):
    x = mat.astype(np.float64)
    if spherical:
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        x = np.where(nrm > 0, x / np.maximum(nrm, 1e-300), x)
        x = x.astype(np.float32).astype(np.float64)
    order = np.argsort(key, kind="stable")[:k]
    cent = x[order].copy()

    def assign(C):
        c2 = (C * C).sum(1)
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ C.T) + c2[None, :]
        return np.argmin(d2, axis=1)

    for _ in range(iters):
        a = assign(cent)
        for c in range(k):
            m = a == c
            if m.any():
                new = x[m].sum(0) / m.sum()
                if spherical:
                    nr = np.linalg.norm(new)
                    if nr > 0:
                        new = new / nr
                cent[c] = new
    return assign(cent)


@pytest.mark.parametrize("spherical", [False, True])
@pytest.mark.parametrize("reduce_mode", ["driver", "groupby"])
def test_kmeans_nd_matches_brute(ray_session, spherical, reduce_mode):
    """Integer-valued embeddings make every float sum exact, so the
    distributed result must equal the brute reference bit-for-bit
    (euclidean mode; spherical mode adds normalization divisions that
    are identical op-for-op)."""
    from geoflow.ops.clustering import kmeans_nd
    rng = np.random.RandomState(31)
    n, d = 240, 16
    key = rng.permutation(np.arange(n)).astype(np.int64)
    mat = rng.randint(0, 8, (n, d)).astype(np.float32)
    ds = ray_session.data.from_arrow(pa.table(
        {"key": pa.array(key),
         "embedding": pa.array(list(mat))})).repartition(4)
    res = kmeans_nd(ds, k=5, iters=3, spherical=spherical,
                    reduce_mode=reduce_mode)
    got = {r["key"]: r["cluster"] for r in res.take_all()}
    want = _brute_kmeans_nd(key, mat, 5, 3, spherical)
    assert got == {int(k_): int(c) for k_, c in zip(key, want)}
    assert len(set(got.values())) >= 2


def test_kmeans_nd_separated_blobs(ray_session):
    """3 well-separated integer blobs must come out as exactly the 3
    blob memberships regardless of float details."""
    from geoflow.ops.clustering import kmeans_nd
    rng = np.random.RandomState(2)
    d = 8
    n = 150
    truth = [i % 3 for i in range(n)]   # interleaved: the 3 lowest keys
    bases = np.array([0, 100, 200])     # land one per blob (min-key seed)
    mat = (bases[np.array(truth)][:, None]
           + rng.randint(0, 3, (n, d))).astype(np.float32)
    key = np.arange(n, dtype=np.int64)
    ds = ray_session.data.from_arrow(pa.table(
        {"key": pa.array(key), "embedding": pa.array(list(mat))}))
    got = {r["key"]: r["cluster"] for r in
           kmeans_nd(ds, k=3, iters=4).take_all()}
    # cluster ids are arbitrary; partition must match the blobs
    by_truth = {}
    for i, t in enumerate(truth):
        by_truth.setdefault(t, set()).add(got[i])
    assert all(len(v) == 1 for v in by_truth.values())
    assert len({v.pop() for v in by_truth.values()}) == 3


def test_semdedup_greedy_semantics(ray_session):
    import ray

    from geoflow.ops.clustering import semdedup
    # 2 well-separated clusters; within cluster 0: family A (keys 0,2
    # exact copies + key 10 a near copy with an extra component →
    # lower centroid-sim → processed first and kept), family B (key 4,
    # orthogonal-ish, kept). Cluster 1: two exact copies (keys 1, 3)
    # → min key kept.
    vecs = {
        0: [10, 0, 8, 0, 0],  1: [0, 10, 0, 8, 0],
        2: [10, 0, 8, 0, 0],  3: [0, 10, 0, 8, 0],
        4: [10, 0, 0, 8, 0],
        10: [10, 0, 8, 0, 4],
    }
    keys = sorted(vecs)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(np.array([vecs[k] for k in keys],
                          dtype=np.float32).ravel()), 5)
    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(keys, type=pa.int64()), "embedding": emb}))
    out = {r["key"]: (r["cluster"], r["kept"])
           for r in semdedup(ds, k=2, iters=2, tau=0.9).take_all()}
    assert set(out) == set(keys)
    kept = {k for k, (_, kp) in out.items() if kp}
    assert kept == {10, 4, 1}
    # cluster labels: seeds are the 2 lowest keys (0 → cid 0, 1 → cid 1)
    assert out[0][0] == out[2][0] == out[4][0] == out[10][0] == 0
    assert out[1][0] == out[3][0] == 1


def test_st_grid_clusters_hand_case():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geoflow.ops.clustering import st_grid_clusters

    # two ST clusters: cells A=(1,1,10),(2,2,11) diag+time adjacent;
    # B=(8,8,10) isolated; (5,5,10) has only 1 point -> not core
    rows = []
    for cell, k in (((1, 1, 10), 2), ((2, 2, 11), 3),
                    ((8, 8, 10), 2), ((5, 5, 10), 1)):
        rows += [cell] * k
    t = pa.table({"cx": pa.array([r[0] for r in rows], pa.int64()),
                  "cy": pa.array([r[1] for r in rows], pa.int64()),
                  "ct": pa.array([r[2] for r in rows], pa.int64())})
    out = {(r["cx"], r["cy"], r["ct"]): (r["label"], r["n"])
           for r in st_grid_clusters(ray.data.from_arrow(t),
                                     rounds=4,
                                     min_pts=2).take_all()}
    assert set(out) == {(1, 1, 10), (2, 2, 11), (8, 8, 10)}
    la = (1 << 40) | (1 << 20) | 10
    assert out[(1, 1, 10)][0] == la
    assert out[(2, 2, 11)][0] == la          # same component
    assert out[(8, 8, 10)][0] == (8 << 40) | (8 << 20) | 10
    assert out[(2, 2, 11)][1] == 3
    # time gap breaks adjacency: (2,2,13) would NOT join A
    t2 = pa.concat_tables([t, pa.table({
        "cx": pa.array([2, 2], pa.int64()),
        "cy": pa.array([2, 2], pa.int64()),
        "ct": pa.array([13, 13], pa.int64())})])
    out2 = {(r["cx"], r["cy"], r["ct"]): r["label"]
            for r in st_grid_clusters(ray.data.from_arrow(t2),
                                      rounds=4,
                                      min_pts=2).take_all()}
    assert out2[(2, 2, 13)] == (2 << 40) | (2 << 20) | 13
