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


def pack_rows(mat: np.ndarray, dtype) -> pa.Array:
    """(n, d) matrix → Arrow binary array, one row's raw bytes per
    element — the join-safe carrier for vector payloads (Acero hash
    joins reject list-typed non-key columns)."""
    mat = np.ascontiguousarray(mat, dtype=dtype)
    n, d = mat.shape
    row_bytes = mat.dtype.itemsize * d
    offs = np.arange(n + 1, dtype=np.int32) * row_bytes
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(mat.tobytes())])


def unpack_rows(col, dim: int, dtype) -> np.ndarray:
    """Inverse of pack_rows: binary column of uniform-length rows →
    (n, dim) matrix, zero-copy over the Arrow data buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, dim), dtype=dtype)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset:col.offset + len(col) + 1]
    raw = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    flat = np.ascontiguousarray(raw[offs[0]:offs[-1]])
    return flat.view(dtype).reshape(-1, dim)


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
                          bucket_cap=4096, dim=None,
                          max_broadcast_pairs=1_000_000,
                          num_partitions=None, prefilter=False):
    """Embedding-cosine near-dup pairs, scale-safe three-stage shape:
      1. hyperplane-LSH buckets (map; embeddings stay in the map stage),
      2. groupby(bucket) → candidate pairs (capped), groupby(pair) dedup,
      3. verify: score each candidate pair's cosine and keep ≥ threshold.
    Exact/near duplicates collide in every/most tables, so recall for
    true near-dups is ~1; random pairs need all n_bits to agree.

    The verify stage picks its shape by candidate-pair count: up to
    `max_broadcast_pairs` it broadcasts the candidate key set and fetches
    just those embeddings to the driver (one matmul, no shuffle); beyond
    that — a duplicate-heavy web corpus where the pair set is O(corpus)
    and must never be driver-materialized — it hash-joins the embedding
    column onto the pair set (on key_a, then key_b) and scores inside
    map_batches, fully distributed.
    Returns Dataset (key_a, key_b, cos_sim)."""
    import ray

    if dim is None:
        first = ds.take(1)[0][emb_col]
        dim = len(first)
    # task pool, not an actor pool: the hyperplane state is a ~25 KB
    # seeded array serialized with the task closure — actor spin-up
    # costs seconds per execution (CLAUDE.md)
    buckets = ds.map_batches(
        HyperplaneBucketer(dim=dim, n_tables=n_tables, n_bits=n_bits,
                           seed=seed, emb_col=emb_col, key_col=key_col),
        batch_format="pyarrow")
    if prefilter:
        # off by default — see the measurement note in
        # text/dedup.lsh_band_pairs (uniformly slower on Ray 2.49)
        from ..text.hashing import filter_to_collision_buckets
        buckets = filter_to_collision_buckets(buckets)

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
    # distinct pairs stay in the object store (never driver-collected
    # wholesale); materialize so counting + the verify pass don't
    # re-execute the whole LSH lineage
    from ..join.semijoin import drop_schemaless_blocks
    uniq, _keep = drop_schemaless_blocks(
        pairs.groupby(["key_a", "key_b"]).count()
        .select_columns(["key_a", "key_b"]))
    n_pairs = uniq.count() if uniq is not None else 0
    if n_pairs == 0:
        return ray.data.from_arrow(pa.table({
            "key_a": pa.array([], type=pa.int64()),
            "key_b": pa.array([], type=pa.int64()),
            "cos_sim": pa.array([], type=pa.float64())}))

    if n_pairs > max_broadcast_pairs:
        uniq._geoflow_keepalive = _keep
        return _score_pairs_joined(ds, uniq, threshold, emb_col, key_col,
                                   num_partitions)

    # small pair set: broadcast the key set, fetch only those embeddings
    ka_parts, kb_parts = [], []
    for b in uniq.iter_batches(batch_format="pyarrow"):
        ka_parts.append(b.column("key_a").to_numpy(zero_copy_only=False))
        kb_parts.append(b.column("key_b").to_numpy(zero_copy_only=False))
    ka = np.concatenate(ka_parts).astype(np.int64)
    kb = np.concatenate(kb_parts).astype(np.int64)
    need = np.unique(np.concatenate([ka, kb]))
    ref = ray.put(need)

    def filt(batch: pa.Table) -> pa.Table:
        wk = ray.get(ref)
        kv = batch.column(key_col).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(wk, kv), 0, len(wk) - 1)
        return batch.select([key_col, emb_col]).filter(
            pa.array(wk[pos] == kv))

    key_parts, mat_parts = [], []
    for b in ds.map_batches(filt, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        key_parts.append(b.column(key_col).to_numpy(zero_copy_only=False))
        mat_parts.append(_embedding_matrix(b, emb_col))
    allk = np.concatenate(key_parts).astype(np.int64)
    mat = np.vstack(mat_parts)
    nm = np.linalg.norm(mat, axis=1, keepdims=True)
    nm[nm == 0] = 1.0
    mat = mat / nm
    order = np.argsort(allk)
    allk, mat = allk[order], mat[order]
    ia = np.searchsorted(allk, ka)
    ib = np.searchsorted(allk, kb)
    cs = (mat[ia] * mat[ib]).sum(axis=1).astype(np.float64)
    keep = cs >= threshold
    return ray.data.from_arrow(pa.table({
        "key_a": pa.array(ka[keep]), "key_b": pa.array(kb[keep]),
        "cos_sim": pa.array(cs[keep])}))


def _score_pairs_joined(ds, uniq, threshold, emb_col, key_col,
                        num_partitions):
    """Fully-distributed verify: hash-join the embedding column onto the
    candidate pairs (key_a then key_b), score cosine in map_batches.
    Nothing is driver-materialized; the corpus is streamed twice (once
    per join side), embeddings ride the shuffle packed as binary (Acero
    joins reject list payloads). Partition count capped per the Ray
    2.49 aggregator-actor rule (see celljoin.py)."""
    import ray
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))

    def side(out_key, out_emb):
        def f(batch: pa.Table) -> pa.Table:
            m = _embedding_matrix(batch, emb_col)
            return pa.table({out_key: batch.column(key_col),
                             out_emb: pack_rows(m, np.float32)})
        return f

    j1 = uniq.join(ds.map_batches(side("key_a", "emb_a"),
                                  batch_format="pyarrow"),
                   join_type="inner", num_partitions=num_partitions,
                   on=("key_a",))
    j2 = j1.join(ds.map_batches(side("key_b", "emb_b"),
                                batch_format="pyarrow"),
                 join_type="inner", num_partitions=num_partitions,
                 on=("key_b",))

    def score(batch: pa.Table) -> pa.Table:
        col_a = batch.column("emb_a")
        if isinstance(col_a, pa.ChunkedArray):
            col_a = col_a.combine_chunks()
        dim = (len(col_a[0].as_py()) // 4) if len(col_a) else 1
        ma = unpack_rows(col_a, dim, np.float32)
        mb = unpack_rows(batch.column("emb_b"), dim, np.float32)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cs = ((ma * mb).sum(axis=1) / (na * nb)).astype(np.float64)
        keep = cs >= threshold
        return pa.table({"key_a": batch.column("key_a"),
                         "key_b": batch.column("key_b"),
                         "cos_sim": pa.array(cs)}).filter(pa.array(keep))

    out = j2.map_batches(score, batch_format="pyarrow")
    # pin the sanitized candidate blocks (see drop_schemaless_blocks)
    out._geoflow_keepalive = getattr(uniq, "_geoflow_keepalive", None)
    return out


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
