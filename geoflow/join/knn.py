"""k-nearest-neighbor joins (reference `spatial:nearby` / kNN property
functions, supplied by the upstream geosparql jar — SURVEY.md §2.4).

Distance semantics: great-circle (vincenty-sphere, R matching the
reference's fixtures — geom/greatcircle.py).

Two paths:
- `KnnBroadcast` (default): the neighbor corpus (coords + ids) is
  `ray.put` once; each actor computes a vectorized chunked distance matrix
  per batch and takes per-row top-k with np.argpartition. Right for
  neighbor sets up to ~10M points (easily fits a worker heap).
- cell path (future round): grid-bucket neighbors + ring expansion for
  corpora too large to broadcast; partitioning assumption documented in
  SURVEY §2.4.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.greatcircle import EARTH_RADIUS_M


class NeighborSet:
    def __init__(self, ids: np.ndarray, lon: np.ndarray, lat: np.ndarray):
        self.ids = np.asarray(ids)
        self.lon = np.asarray(lon, dtype=np.float64)
        self.lat = np.asarray(lat, dtype=np.float64)
        # precompute unit vectors once: great-circle via dot product
        lam = np.radians(self.lon)
        phi = np.radians(self.lat)
        self.xyz = np.stack([np.cos(phi) * np.cos(lam),
                             np.cos(phi) * np.sin(lam),
                             np.sin(phi)], axis=1)


class KnnBroadcast:
    """Actor-pool callable: per probe row, k nearest neighbors by
    great-circle distance.

    Output: probe keep_cols + neighbor_id + rank:int32 + dist_m:float64.
    """

    def __init__(self, neighbors_ref, k=5, x_col="x", y_col="y",
                 keep_cols=("url", "geom_idx"), chunk=65536):
        import ray
        ns = ray.get(neighbors_ref) if not isinstance(neighbors_ref, NeighborSet) \
            else neighbors_ref
        self.ns = ns
        self.k = k
        self.x_col = x_col
        self.y_col = y_col
        self.keep_cols = tuple(keep_cols)
        self.chunk = chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column(self.x_col).to_numpy(zero_copy_only=False)
        py = batch.column(self.y_col).to_numpy(zero_copy_only=False)
        n = len(px)
        k = min(self.k, len(self.ns.ids))
        out_rows = np.empty(n * k, dtype=np.int64)
        out_nbr = np.empty(n * k, dtype=self.ns.ids.dtype)
        out_rank = np.empty(n * k, dtype=np.int32)
        out_dist = np.empty(n * k, dtype=np.float64)
        lam = np.radians(px)
        phi = np.radians(py)
        pxyz = np.stack([np.cos(phi) * np.cos(lam),
                         np.cos(phi) * np.sin(lam), np.sin(phi)], axis=1)
        nb = self.ns.xyz
        from ..geom.greatcircle import vincenty_sphere_m
        for s in range(0, n, self.chunk):
            e = min(n, s + self.chunk)
            # chord dot product → monotone in great-circle distance; used
            # for candidate RANKING only
            dots = pxyz[s:e] @ nb.T  # (m, nbr)
            idx = np.argpartition(-dots, k - 1, axis=1)[:, :k]
            m = e - s
            # exact distance (same formula as the SQL/test oracle) for the
            # reported value and the final deterministic ordering
            nbr_lon = self.ns.lon[idx]
            nbr_lat = self.ns.lat[idx]
            dist = vincenty_sphere_m(px[s:e, None], py[s:e, None],
                                     nbr_lon, nbr_lat)
            # order by (dist, neighbor_id) — deterministic under ties
            nbr_ids = self.ns.ids[idx]
            order = np.lexsort((nbr_ids, dist), axis=1)
            idx = np.take_along_axis(idx, order, axis=1)
            dist = np.take_along_axis(dist, order, axis=1)
            rows = np.repeat(np.arange(s, e, dtype=np.int64), k)
            sl = slice(s * k, e * k)
            out_rows[sl] = rows
            out_nbr[sl] = self.ns.ids[idx.ravel()]
            out_rank[sl] = np.tile(np.arange(1, k + 1, dtype=np.int32), m)
            out_dist[sl] = dist.ravel()
        take = pa.array(out_rows, type=pa.int64())
        cols = {c: batch.column(c).take(take) for c in self.keep_cols
                if c in batch.column_names}
        cols["neighbor_id"] = pa.array(out_nbr)
        cols["rank"] = pa.array(out_rank)
        cols["dist_m"] = pa.array(out_dist)
        return pa.table(cols)
