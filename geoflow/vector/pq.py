"""Product-quantization ANN (PQ + IVF-PQ) over embedding columns.

The 100-TB memory path for similarity search (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011, public):
vectors are compressed to ``m`` bytes (one uint8 codebook index per
subspace), so a 10^12-row float32 corpus (256 B/vector at d=64) becomes
a 8-16 B/vector code table that scans at memory bandwidth. Search uses
asymmetric distance computation (ADC): per query, one (m × 256)
lookup table of subspace inner products; a row's score is the sum of
m table entries — no float vector is ever touched at scan time.

Distributed shape (Ray-Data-first):
  - TRAIN on a bounded driver-side sample (documented: `train_sample`
    rows × d floats; the standard PQ protocol — codebooks are global
    model state, exactly like k-means centroids);
  - ENCODE as a stateful map_batches stage (codebooks broadcast via
    ray.put once; argmin over centroids fully vectorized) emitting
    16-byte (key, code) rows — the corpus embedding column is read
    once and never shuffled;
  - SCAN as a map_batches stage over the CODE dataset (LUT built per
    batch-call from the broadcast queries), local top-k per batch,
    exact global reduce via ann.global_topk. IVF-PQ additionally
    stores a coarse list id per row and scans only rows in each
    query's `nprobe` nearest lists (classic inverted-file pruning;
    with residual encoding per the paper).

Determinism: k-means init is evenly-spaced rows of the lexicographically
sorted sample (no RNG), fixed Lloyd iterations, numpy argmin
tie-breaking — identical codebooks/codes on every run and retry.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import QuerySet, _embedding_matrix, pack_rows, unpack_rows

__all__ = ["train_pq_codebooks", "PqEncoder", "PqTopK", "pq_topk",
           "build_pq_index", "scan_pq_index", "append_pq_index"]


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _train_sample(ds, emb_col: str, key_col: str, n: int) -> np.ndarray:
    """Deterministic corpus-wide training sample: keep rows whose
    splitmix key hash falls under a rate sized from the dataset's row
    count (parquet-metadata cheap), then truncate to ``n`` in key-hash
    order. Unlike ``ds.limit(n)`` — which takes the FIRST rows, i.e.
    one shard's distribution at corpus scale — this draws uniformly
    from every block, and identically on every run/retry."""
    from ..text.hashing import mix64

    total = ds.count()
    if total <= n:
        t = pa.concat_tables(b.select([emb_col])
                             for b in ds.iter_batches(
                                 batch_format="pyarrow"))
        return _embedding_matrix(t, emb_col)
    rate = min(1.0, (n * 1.3) / total)
    cut = np.uint64(int(rate * 2**32))

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = mix64(k.astype(np.uint64))
        return batch.select([emb_col]).filter(
            pa.array((h >> np.uint64(32)) < cut))

    t = pa.concat_tables(
        b for b in ds.map_batches(keep, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    mat = _embedding_matrix(t, emb_col)
    return mat[:n]


def _kmeans_1sub(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd's on one subspace sample (n, dsub) → (k, dsub).
    Init: evenly-spaced rows of the lexsorted sample (duplicates fine —
    identical centroids never win an argmin over a lower index, and
    empty clusters simply keep their previous position)."""
    n = len(x)
    order = np.lexsort(x.T[::-1])
    xs = x[order]
    idx = np.linspace(0, n - 1, k).astype(np.int64)
    cent = xs[idx].astype(np.float32).copy()
    for _ in range(iters):
        d2 = (np.square(x).sum(1)[:, None]
              - 2.0 * (x @ cent.T)
              + np.square(cent).sum(1)[None, :])
        assign = np.argmin(d2, axis=1)
        sums = np.zeros_like(cent, dtype=np.float64)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        nz = counts > 0
        cent[nz] = (sums[nz] / counts[nz, None]).astype(np.float32)
    return cent


def train_pq_codebooks(sample: np.ndarray, m: int = 8, n_bits: int = 8,
                       iters: int = 10, normalize: bool = True) -> np.ndarray:
    """(n, d) sample → (m, 2**n_bits, d//m) float32 codebooks.
    d must be divisible by m."""
    x = np.asarray(sample, dtype=np.float32)
    if normalize:
        x = _normalize(x)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    k = 1 << n_bits
    return np.stack([
        _kmeans_1sub(np.ascontiguousarray(x[:, j * dsub:(j + 1) * dsub]),
                     k, iters)
        for j in range(m)])


def _encode(x: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, d) → (n, m) uint8 nearest-centroid codes per subspace."""
    m, k, dsub = codebooks.shape
    codes = np.empty((len(x), m), dtype=np.uint8)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        cb = codebooks[j]
        d2 = (np.square(sub).sum(1)[:, None]
              - 2.0 * (sub @ cb.T)
              + np.square(cb).sum(1)[None, :])
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


class PqEncoder:
    """map_batches stage: embedding rows → (key, [list_id,] code) rows,
    ``m`` bytes of code per vector. With ``coarse`` centroids (IVF-PQ)
    the code quantizes the RESIDUAL x - coarse[list_id]."""

    def __init__(self, codebooks_ref, emb_col="embedding",
                 key_col="vec_id", normalize=True, coarse_ref=None):
        import ray
        self.cb = ray.get(codebooks_ref) \
            if not isinstance(codebooks_ref, np.ndarray) else codebooks_ref
        self.coarse = None
        if coarse_ref is not None:
            self.coarse = ray.get(coarse_ref) \
                if not isinstance(coarse_ref, np.ndarray) else coarse_ref
        self.emb_col = emb_col
        self.key_col = key_col
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch, self.emb_col)
        if self.normalize:
            x = _normalize(x)
        cols = {self.key_col: batch.column(self.key_col)}
        if self.coarse is not None:
            d2 = (np.square(x).sum(1)[:, None]
                  - 2.0 * (x @ self.coarse.T)
                  + np.square(self.coarse).sum(1)[None, :])
            lists = np.argmin(d2, axis=1)
            x = x - self.coarse[lists]
            cols["list_id"] = pa.array(lists.astype(np.int32))
        cols["pq_code"] = pack_rows(_encode(x, self.cb), np.uint8)
        return pa.table(cols)


class PqTopK:
    """map_batches ADC scan over a PQ-code dataset: per call, one
    (nq, m, 256) inner-product LUT from the broadcast queries; a row's
    score is m table lookups summed — the query never meets a float
    vector. Emits batch-local (query_id, key, score) candidates for
    ann.global_topk. With coarse centroids + nprobe, rows outside each
    query's nprobe nearest lists are skipped (and the coarse term
    q·c_list is added back, completing q·recon(x))."""

    def __init__(self, queries_ref, codebooks_ref, key_col="vec_id",
                 k_local=64, coarse_ref=None, nprobe=4):
        import ray
        q = ray.get(queries_ref) \
            if not isinstance(queries_ref, QuerySet) else queries_ref
        self.q = q
        cb = ray.get(codebooks_ref) \
            if not isinstance(codebooks_ref, np.ndarray) else codebooks_ref
        self.cb = cb
        m, k, dsub = cb.shape
        # LUT[i, j, c] = q_i[sub j] · cb[j, c]
        qs = q.mat.reshape(len(q.mat), m, dsub)
        self.lut = np.einsum("imd,mcd->imc", qs, cb).astype(np.float32)
        self.m = m
        self.key_col = key_col
        self.k_local = k_local
        self.coarse = None
        if coarse_ref is not None:
            coarse = ray.get(coarse_ref) \
                if not isinstance(coarse_ref, np.ndarray) else coarse_ref
            self.coarse = coarse
            qc = q.mat @ coarse.T                      # (nq, n_lists)
            self.q_coarse = qc.astype(np.float32)
            npb = min(nprobe, coarse.shape[0])
            self.probe = np.argsort(-qc, axis=1)[:, :npb]  # (nq, nprobe)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             self.key_col: pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        codes = unpack_rows(batch.column("pq_code"), self.m, np.uint8)
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        nq = len(self.q.ids)
        scores = np.zeros((nq, len(codes)), dtype=np.float32)
        for j in range(self.m):
            scores += self.lut[:, j, codes[:, j]]
        if self.coarse is not None:
            lists = batch.column("list_id").to_numpy(zero_copy_only=False)
            scores += self.q_coarse[:, lists]
            # mask rows outside each query's probed lists
            allowed = np.zeros((nq, len(codes)), dtype=bool)
            for qi in range(nq):
                allowed[qi] = np.isin(lists, self.probe[qi])
            scores[~allowed] = -np.inf
        k = min(self.k_local, scores.shape[1])
        idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        out_s = np.take_along_axis(scores, idx, axis=1).ravel()
        out_q = np.repeat(self.q.ids, k)
        out_k = keys[idx.ravel()]
        ok = np.isfinite(out_s)
        return pa.table({
            "query_id": pa.array(out_q[ok]),
            self.key_col: pa.array(out_k[ok]),
            "cosine": pa.array(out_s[ok].astype(np.float64)),
        })


# per-worker-process stage cache (task-pool pattern — workers persist
# across tasks; one ray.get + LUT build per worker, not per batch)
_PQ_CACHE: dict = {}


def _cached_stage(cls, cache_key, **kwargs):
    inst = _PQ_CACHE.get(cache_key)
    if inst is None:
        inst = cls(**kwargs)
        _PQ_CACHE.clear()
        _PQ_CACHE[cache_key] = inst
    return inst


def pq_topk(ds, queries: QuerySet, k: int, m: int = 8, n_bits: int = 8,
            emb_col="embedding", key_col="vec_id",
            train_sample: int = 16384, iters: int = 10,
            n_lists: int | None = None, nprobe: int = 4,
            k_local: int = 64):
    """End-to-end PQ (n_lists=None) or IVF-PQ top-k: train on a bounded
    sample → encode the corpus to m-byte codes (one read, no shuffle) →
    ADC-scan the code dataset → exact global top-k reduce. At real
    scale, split the steps: encode once, persist the code dataset (the
    compressed index), scan many times. Stages run as task pools with
    the per-worker-process state cache (broadcast codebooks/LUTs built
    once per worker — actor-pool spin-up isn't worth paying for
    read-only state; see CLAUDE.md)."""
    import ray

    sample = _train_sample(ds, emb_col, key_col, train_sample)
    coarse_ref = None
    if n_lists:
        from .ann import train_ivf_centroids
        ns = _normalize(sample)
        coarse = train_ivf_centroids(ns, n_lists=n_lists)
        coarse_ref = ray.put(coarse)
        lists = np.argmin(
            (np.square(ns).sum(1)[:, None] - 2.0 * (ns @ coarse.T)
             + np.square(coarse).sum(1)[None, :]), axis=1)
        cb = train_pq_codebooks(ns - coarse[lists], m=m, n_bits=n_bits,
                                iters=iters, normalize=False)
    else:
        cb = train_pq_codebooks(sample, m=m, n_bits=n_bits, iters=iters)
    cb_ref = ray.put(cb)
    q_ref = ray.put(queries)
    tag = (cb_ref.hex(), coarse_ref.hex() if coarse_ref else "", nprobe)

    def encode(batch: pa.Table) -> pa.Table:
        return _cached_stage(
            PqEncoder, ("enc",) + tag, codebooks_ref=cb_ref,
            emb_col=emb_col, key_col=key_col, coarse_ref=coarse_ref
        )(batch)

    def scan(batch: pa.Table) -> pa.Table:
        return _cached_stage(
            PqTopK, ("scan", q_ref.hex()) + tag, queries_ref=q_ref,
            codebooks_ref=cb_ref, key_col=key_col, k_local=k_local,
            coarse_ref=coarse_ref, nprobe=nprobe
        )(batch)

    cands = ds.map_batches(encode, batch_format="pyarrow") \
        .map_batches(scan, batch_format="pyarrow")
    from .ann import global_topk
    return global_topk(cands, k, key_col=key_col)


def build_pq_index(ds, path: str, m: int = 8, n_bits: int = 8,
                   emb_col="embedding", key_col="vec_id",
                   train_sample: int = 16384, iters: int = 10,
                   n_lists: int | None = None) -> dict:
    """Train + encode ONCE and persist the compressed index: codes as
    partitioned parquet under ``path`` (m bytes/vector + 8-byte key
    [+ 4-byte IVF list id]) and the model (codebooks / coarse
    centroids) as .npy beside them. A 10^12-row corpus is encoded in
    one streaming pass; scans then never touch the float column.
    Returns {"rows": encoded_row_count, "path": path}."""
    import os

    import ray

    sample = _train_sample(ds, emb_col, key_col, train_sample)
    coarse = None
    if n_lists:
        from .ann import train_ivf_centroids
        ns = _normalize(sample)
        coarse = train_ivf_centroids(ns, n_lists=n_lists)
        lists = np.argmin(
            (np.square(ns).sum(1)[:, None] - 2.0 * (ns @ coarse.T)
             + np.square(coarse).sum(1)[None, :]), axis=1)
        cb = train_pq_codebooks(ns - coarse[lists], m=m, n_bits=n_bits,
                                iters=iters, normalize=False)
    else:
        cb = train_pq_codebooks(sample, m=m, n_bits=n_bits, iters=iters)

    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "_codebooks.npy"), cb)
    if coarse is not None:
        np.save(os.path.join(path, "_coarse.npy"), coarse)

    cb_ref = ray.put(cb)
    coarse_ref = ray.put(coarse) if coarse is not None else None
    tag = (cb_ref.hex(),)

    def encode(batch: pa.Table) -> pa.Table:
        return _cached_stage(
            PqEncoder, ("enc-idx",) + tag, codebooks_ref=cb_ref,
            emb_col=emb_col, key_col=key_col, coarse_ref=coarse_ref
        )(batch)

    codes = ds.map_batches(encode, batch_format="pyarrow")
    codes.write_parquet(os.path.join(path, "codes"))
    import pyarrow.parquet as pq_
    n = sum(pq_.read_metadata(os.path.join(path, "codes", f)).num_rows
            for f in os.listdir(os.path.join(path, "codes"))
            if f.endswith(".parquet"))
    return {"rows": n, "path": path}


def scan_pq_index(path: str, queries: QuerySet, k: int,
                  key_col="vec_id", k_local: int = 64, nprobe: int = 4):
    """ADC top-k over a persisted index — reads only the m-byte codes;
    the model loads from the .npy files written by build_pq_index."""
    import os

    import ray
    import ray.data

    cb = np.load(os.path.join(path, "_codebooks.npy"))
    coarse_p = os.path.join(path, "_coarse.npy")
    coarse = np.load(coarse_p) if os.path.exists(coarse_p) else None
    cb_ref = ray.put(cb)
    coarse_ref = ray.put(coarse) if coarse is not None else None
    q_ref = ray.put(queries)
    tag = (q_ref.hex(), cb_ref.hex(), nprobe)

    def scan(batch: pa.Table) -> pa.Table:
        return _cached_stage(
            PqTopK, ("scan-idx",) + tag, queries_ref=q_ref,
            codebooks_ref=cb_ref, key_col=key_col, k_local=k_local,
            coarse_ref=coarse_ref, nprobe=nprobe
        )(batch)

    cands = ray.data.read_parquet(os.path.join(path, "codes")) \
        .map_batches(scan, batch_format="pyarrow")
    from .ann import global_topk
    return global_topk(cands, k, key_col=key_col)


def append_pq_index(ds, path: str, emb_col="embedding",
                    key_col="vec_id") -> dict:
    """Incremental index growth: encode ONLY the new rows with the
    SAVED model (codebooks/coarse from build_pq_index — retraining
    would silently re-code nothing else and skew ADC scores) and append
    their code files beside the existing ones. The ingestion-side
    complement of scan_pq_index; key uniqueness is the caller's
    contract (pair with state.ShardedKeyIndex for streaming arrivals)."""
    import os

    import ray

    cb = np.load(os.path.join(path, "_codebooks.npy"))
    coarse_p = os.path.join(path, "_coarse.npy")
    coarse = np.load(coarse_p) if os.path.exists(coarse_p) else None
    cb_ref = ray.put(cb)
    coarse_ref = ray.put(coarse) if coarse is not None else None
    tag = (cb_ref.hex(),)

    def encode(batch: pa.Table) -> pa.Table:
        return _cached_stage(
            PqEncoder, ("enc-app",) + tag, codebooks_ref=cb_ref,
            emb_col=emb_col, key_col=key_col, coarse_ref=coarse_ref
        )(batch)

    codes_dir = os.path.join(path, "codes")
    before = set(os.listdir(codes_dir))
    ds.map_batches(encode, batch_format="pyarrow") \
        .write_parquet(codes_dir)
    import pyarrow.parquet as pq_
    added = [f for f in os.listdir(codes_dir)
             if f not in before and f.endswith(".parquet")]
    n = sum(pq_.read_metadata(os.path.join(codes_dir, f)).num_rows
            for f in added)
    return {"rows_appended": n, "files_appended": len(added),
            "path": path}
