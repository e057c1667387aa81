"""Similarity search over embedding columns (list<float>).

- `BruteForceTopK`: exact cosine top-k per batch against a broadcast query
  matrix (ray.put once; numpy matmul per batch). The correctness baseline.
- `LshTopK`: random-hyperplane LSH bucketing — probes only rows whose
  bucket matches one of the query's multi-probe buckets; the scale path
  when the corpus is too large for full scans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
        return np.asarray(arr.flatten(), dtype=np.float32).reshape(-1, dim)
    flat = np.asarray(arr.flatten(), dtype=np.float32)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(-1, dim)


class QuerySet:
    def __init__(self, query_ids: np.ndarray, matrix: np.ndarray):
        self.ids = np.asarray(query_ids)
        m = np.asarray(matrix, dtype=np.float32)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.mat = m / norms


class BruteForceTopK:
    """Actor-pool stage: per batch, cosine of every row embedding vs the
    broadcast query matrix; emits (query_id, row key, cosine) for the
    batch-local candidates. A final small `sort + limit` (or
    groupby(query_id).map_groups top-k) reduces to global top-k."""

    def __init__(self, queries_ref, emb_col="embedding", key_col="vec_id",
                 k_local=64):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, QuerySet) else queries_ref
        self.q = q
        self.emb_col = emb_col
        self.key_col = key_col
        self.k_local = k_local

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, self.emb_col)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        sims = self.q.mat @ m.T  # (nq, rows)
        k = min(self.k_local, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        nq = len(self.q.ids)
        out_q = np.repeat(self.q.ids, k)
        out_key = keys[idx.ravel()]
        out_sim = np.take_along_axis(sims, idx, axis=1).ravel()
        return pa.table({
            "query_id": pa.array(out_q),
            self.key_col: pa.array(out_key),
            "cosine": pa.array(out_sim.astype(np.float64)),
        })


def global_topk(candidates_ds, k: int, key_col="vec_id"):
    """Reduce batch-local candidates to exact global top-k per query —
    groupby(query_id) over the (tiny) candidate set."""

    def topk(group: pa.Table) -> pa.Table:
        sims = group.column("cosine").to_numpy(zero_copy_only=False)
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -sims))[:k]
        t = group.take(pa.array(order, type=pa.int64()))
        return t.append_column("rank", pa.array(
            np.arange(1, len(order) + 1, dtype=np.int32)))

    return candidates_ds.groupby("query_id").map_groups(
        topk, batch_format="pyarrow")


class LshTopK:
    """Random-hyperplane LSH filter: only rows sharing a bucket (exact or
    1-bit multiprobe) with some query are scored. Recall/probe tradeoff via
    n_bits; deterministic hyperplanes from `seed`."""

    def __init__(self, queries_ref, emb_col="embedding", key_col="vec_id",
                 n_bits=12, seed=5, k_local=64, dim=None):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, QuerySet) else queries_ref
        self.q = q
        self.emb_col = emb_col
        self.key_col = key_col
        self.k_local = k_local
        d = dim or q.mat.shape[1]
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((d, n_bits)).astype(np.float32)
        qb = (q.mat @ self.planes > 0)
        pow2 = (1 << np.arange(n_bits, dtype=np.int64))
        qcodes = qb @ pow2
        # multiprobe: exact bucket + all 1-bit flips
        probes = {int(c) for c in qcodes}
        for c in qcodes:
            for b in range(n_bits):
                probes.add(int(c) ^ (1 << b))
        self.probe_set = np.fromiter(probes, dtype=np.int64)
        self.pow2 = pow2
        self.qcodes = qcodes

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, self.emb_col)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        codes = ((mn @ self.planes) > 0) @ self.pow2
        hit = np.isin(codes, self.probe_set)
        rows = np.nonzero(hit)[0]
        if len(rows) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             self.key_col: pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        sub = mn[rows]
        sims = self.q.mat @ sub.T
        k = min(self.k_local, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)[rows]
        out_q = np.repeat(self.q.ids, k)
        return pa.table({
            "query_id": pa.array(out_q),
            self.key_col: pa.array(keys[idx.ravel()]),
            "cosine": pa.array(
                np.take_along_axis(sims, idx, axis=1).ravel().astype(np.float64)),
        })


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (dedup family)
# ---------------------------------------------------------------------------

class HyperplaneBucketer:
    """Map stage: per vector, one (key, bucket) row per LSH table —
    16 bytes/row/table through the shuffle; the embedding itself never
    enters the shuffle. Hyperplanes are seeded in __init__ (identical
    on every worker — deterministic retries)."""

    def __init__(self, dim: int, n_tables=6, n_bits=16, seed=17,
                 emb_col="embedding", key_col="vec_id"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal(
            (n_tables, dim, n_bits)).astype(np.float32)
        self.pow2 = (1 << np.arange(n_bits, dtype=np.int64))
        self.n_tables = n_tables
        self.emb_col = emb_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, self.emb_col)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        out_k = np.tile(keys, self.n_tables)
        out_b = np.empty(n * self.n_tables, dtype=np.int64)
        for t in range(self.n_tables):
            codes = ((mn @ self.planes[t]) > 0) @ self.pow2
            # mix the table id into the bucket so one groupby key suffices
            out_b[t * n:(t + 1) * n] = codes * np.int64(131) + t
        return pa.table({self.key_col: pa.array(out_k),
                         "bucket": pa.array(out_b)})


def cosine_near_dup_pairs(ds, threshold=0.8, n_tables=6, n_bits=16,
                          seed=17, emb_col="embedding", key_col="vec_id",
                          bucket_cap=4096, dim=None):
    """Embedding-cosine near-dup pairs, scale-safe three-stage shape:
      1. hyperplane-LSH buckets (map; embeddings stay in the map stage),
      2. groupby(bucket) → candidate pairs (capped), groupby(pair) dedup,
      3. verify: fetch ONLY the candidate keys' embeddings via a
         broadcast key set (pairs ≪ corpus) and keep cosine ≥ threshold.
    Exact/near duplicates collide in every/most tables, so recall for
    true near-dups is ~1; random pairs need all n_bits to agree.
    Returns Dataset (key_a, key_b, cos_sim)."""
    import ray

    if dim is None:
        first = ds.take(1)[0][emb_col]
        dim = len(first)
    from ..text.hashing import filter_to_collision_buckets
    buckets = filter_to_collision_buckets(ds.map_batches(
        HyperplaneBucketer, batch_format="pyarrow",
        fn_constructor_kwargs=dict(dim=dim, n_tables=n_tables,
                                   n_bits=n_bits, seed=seed,
                                   emb_col=emb_col, key_col=key_col),
        concurrency=2))

    def emit_pairs(group: pa.Table) -> pa.Table:
        keys = np.unique(group.column(key_col).to_numpy(zero_copy_only=False))
        if len(keys) < 2:
            return pa.table({"key_a": pa.array([], type=pa.int64()),
                             "key_b": pa.array([], type=pa.int64())})
        if len(keys) > bucket_cap:
            ka = np.full(len(keys) - 1, keys[0])
            kb = keys[1:]
        else:
            ii, jj = np.triu_indices(len(keys), k=1)
            ka, kb = keys[ii], keys[jj]
        return pa.table({"key_a": pa.array(ka, type=pa.int64()),
                         "key_b": pa.array(kb, type=pa.int64())})

    pairs = buckets.groupby("bucket").map_groups(emit_pairs,
                                                 batch_format="pyarrow")
    uniq = pairs.groupby(["key_a", "key_b"]).count() \
        .select_columns(["key_a", "key_b"])

    prs = uniq.take_all()
    if not prs:
        return ray.data.from_arrow(pa.table({
            "key_a": pa.array([], type=pa.int64()),
            "key_b": pa.array([], type=pa.int64()),
            "cos_sim": pa.array([], type=pa.float64())}))
    need = np.array(sorted({r["key_a"] for r in prs}
                           | {r["key_b"] for r in prs}), dtype=np.int64)
    ref = ray.put(need)

    def filt(batch: pa.Table) -> pa.Table:
        wk = ray.get(ref)
        kv = batch.column(key_col).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(wk, kv), 0, len(wk) - 1)
        return batch.select([key_col, emb_col]).filter(
            pa.array(wk[pos] == kv))

    embs = {}
    for b in ds.map_batches(filt, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        ks = b.column(key_col).to_numpy(zero_copy_only=False)
        m = _embedding_matrix(b, emb_col)
        nm = np.linalg.norm(m, axis=1, keepdims=True)
        nm[nm == 0] = 1.0
        m = m / nm
        for i, kk in enumerate(ks):
            embs[int(kk)] = m[i]
    ka = np.array([r["key_a"] for r in prs], dtype=np.int64)
    kb = np.array([r["key_b"] for r in prs], dtype=np.int64)
    cs = np.array([float(embs[a] @ embs[b]) for a, b in zip(ka, kb)])
    keep = cs >= threshold
    return ray.data.from_arrow(pa.table({
        "key_a": pa.array(ka[keep]), "key_b": pa.array(kb[keep]),
        "cos_sim": pa.array(cs[keep])}))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-bucketed scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(sample: np.ndarray, n_lists: int = 64,
                        iters: int = 10, seed: int = 23) -> np.ndarray:
    """Lloyd k-means over a (normalized) sample — deterministic:
    seeded subsample init, fixed iteration count. Returns (n_lists, d)
    L2-normalized centroids."""
    m = np.asarray(sample, dtype=np.float64)
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    m = m / nrm
    rng = np.random.default_rng(seed)
    n_lists = min(n_lists, len(m))
    cent = m[rng.choice(len(m), size=n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(n_lists):
            rows = m[assign == c]
            if len(rows):
                v = rows.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IvfTopK:
    """IVF filter stage: rows whose coarse list is among the n_probe
    lists nearest to SOME query are scored; everything else is skipped
    without a dot product against the query matrix. Centroids + queries
    are broadcast refs; assignment happens batch-vectorized per actor.

    At cluster scale the same structure becomes a two-stage shuffle
    (partition by list id, co-locate queries' probe lists); here the
    filter-in-place form keeps it a single streaming pass."""

    def __init__(self, queries_ref, centroids_ref, emb_col="embedding",
                 key_col="vec_id", n_probe=4, k_local=64):
        import ray
        self.q = ray.get(queries_ref) \
            if not isinstance(queries_ref, QuerySet) else queries_ref
        cent = ray.get(centroids_ref) \
            if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.cent = cent
        self.emb_col = emb_col
        self.key_col = key_col
        self.k_local = k_local
        qsims = self.q.mat @ cent.T
        order = np.argsort(-qsims, axis=1)[:, :n_probe]
        self.probe_lists = np.unique(order.ravel())

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, self.emb_col)
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        mn = m / nrm
        assign = np.argmax(mn @ self.cent.T, axis=1)
        rows = np.nonzero(np.isin(assign, self.probe_lists))[0]
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          self.key_col: pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if len(rows) == 0:
            return empty
        sub = mn[rows]
        sims = self.q.mat @ sub.T
        keys = batch.column(self.key_col).to_numpy(
            zero_copy_only=False)[rows]
        out_q, out_k, out_s = [], [], []
        k = min(self.k_local, sims.shape[1])
        for qi in range(sims.shape[0]):
            top = np.argpartition(-sims[qi], k - 1)[:k]
            out_q.append(np.full(k, self.q.ids[qi], dtype=np.int64))
            out_k.append(keys[top])
            out_s.append(sims[qi][top])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            self.key_col: pa.array(np.concatenate(out_k).astype(np.int64)),
            "cosine": pa.array(np.concatenate(out_s))})
